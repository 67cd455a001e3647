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
    * round-robin repartition rather than silently doing nothing. */
  def rescale(df: DataFrame, parallelism: Int): DataFrame =
    if (parallelism <= df.rdd.getNumPartitions) df.coalesce(parallelism)
    else df.repartition(parallelism)

  def global(df: DataFrame): DataFrame = df.coalesce(1)

  def broadcastDim(fact: DataFrame, dim: DataFrame, keys: Seq[String]): DataFrame =
    fact.join(broadcast(dim), keys)

  def partitionCustom(df: DataFrame, parallelism: Int, expr: Column): DataFrame =
    df.repartition(parallelism, expr)

  def forward(df: DataFrame): DataFrame = df
}
