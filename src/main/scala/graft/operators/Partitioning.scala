package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.broadcast

/** The DataStream physical-partitioning verbs (DataStream.java:377-460:
  * keyBy, broadcast, shuffle/rebalance, rescale, global, forward,
  * partitionCustom) mapped onto Spark's exchange operators. Flink exposes
  * these as explicit API because its planner never re-partitions on its
  * own; in Spark most arise implicitly from Catalyst's distribution
  * requirements, so these mappings exist for API parity and for the cases
  * where explicit control genuinely matters at scale (pre-partitioning a
  * loop-invariant table, defeating skew, bounding output files).
  *
  *  - keyBy         → hash repartition on the key columns
  *  - rebalance     → round-robin repartition (skew-flattening)
  *  - rescale       → coalesce (local merge, NO shuffle — same as Flink's
  *                    pipelined local rescale)
  *  - global        → everything into one partition (Flink: operator with
  *                    parallelism 1)
  *  - broadcastDim  → broadcast-hash join of a bounded dimension
  *  - partitionCustom → hash repartition on an arbitrary expression (the
  *                    Partitioner is the expression; same contract:
  *                    equal values co-locate)
  *  - forward       → identity (Spark chains narrow ops in one stage
  *                    automatically)
  */
object Partitioning {

  def keyBy(df: DataFrame, keys: Column*): DataFrame = df.repartition(keys: _*)

  def rebalance(df: DataFrame, parallelism: Int): DataFrame = df.repartition(parallelism)

  /** Flink's rescale redistributes both down AND up; coalesce only merges.
    * Downscale keeps the shuffle-free local merge; upscale must exchange
    * (Spark has no shuffle-free partition split), so it falls back to a
    * round-robin repartition rather than silently doing nothing.
    *
    * Streaming DataFrames (Flink's rescale is primarily a streaming edge)
    * have no inspectable partition count pre-execution, so they always take
    * the exchange. Batch width is read from the pre-AQE physical plan's
    * outputPartitioning (`sparkPlan`, planning only — NOT `.rdd`, which
    * would materialize the RDD lineage and finalize the plan early under
    * AQE, and the AQE root itself reports UnknownPartitioning(0) until it
    * runs); when the plan doesn't declare a width (e.g. an unbucketed scan)
    * the safe fallback is the exchange. */
  def rescale(df: DataFrame, parallelism: Int): DataFrame =
    if (df.isStreaming) df.repartition(parallelism)
    else {
      val current = df.queryExecution.sparkPlan.outputPartitioning.numPartitions
      if (current > 0 && parallelism <= current) df.coalesce(parallelism)
      else df.repartition(parallelism)
    }

  def global(df: DataFrame): DataFrame = df.coalesce(1)

  def broadcastDim(fact: DataFrame, dim: DataFrame, keys: Seq[String]): DataFrame =
    fact.join(broadcast(dim), keys)

  def partitionCustom(df: DataFrame, parallelism: Int, expr: Column): DataFrame =
    df.repartition(parallelism, expr)

  def forward(df: DataFrame): DataFrame = df
}
