package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

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

  /** Flink's `global()` verb: route EVERYTHING to one task. Faithful
    * mapping, and exactly as much of a scale-killer as the original —
    * diagnostic / tiny-result use only, never in a production plan at
    * scale (one partition = one core and one spill domain for the whole
    * dataset). */
  def global(df: DataFrame): DataFrame = df.coalesce(1)

  def broadcastDim(fact: DataFrame, dim: DataFrame, keys: Seq[String]): DataFrame =
    fact.join(broadcast(dim), keys)

  def partitionCustom(df: DataFrame, parallelism: Int, expr: Column): DataFrame =
    df.repartition(parallelism, expr)

  def forward(df: DataFrame): DataFrame = df

  // ---- manual skew mitigation (salting) -----------------------------------
  //
  // AQE's skew-join handles the shuffle-join case at runtime; salting is
  // the manual scale path for what AQE can't reach — a skewed AGGREGATION
  // key, or a join where neither side broadcasts. The salt is a
  // DETERMINISTIC function of a unique column (pmod(xxhash64(id), S)), so
  // runs are reproducible and the oracle is simply the unsalted query.

  /** Two-stage salted aggregation: partial aggregate on (key, salt) — the
    * hot key fans out over S reducers — then the tiny (key, salt) partials
    * re-aggregate on key alone. Decimal sums keep the result independent
    * of how the partials split. */
  def saltedAggregate(df: DataFrame, keyCol: String, uniqueCol: String,
                      valueCol: String, salts: Int): DataFrame =
    df.withColumn("__salt", pmod(xxhash64(col(uniqueCol)), lit(salts)))
      .groupBy(col(keyCol), col("__salt"))
      .agg(count(lit(1)).as("__n"),
        sum(col(valueCol).cast("decimal(18,2)")).as("__s"))
      .groupBy(col(keyCol))
      .agg(sum(col("__n")).as("n_rows"),
        sum(col("__s")).cast("decimal(18,2)").as("total"))

  /** Salted shuffle join: the fact side salts on a unique column; the
    * (small, but not broadcastable-by-assumption) dim side replicates S
    * ways via one explode. Equal join keys meet because the dim carries
    * every salt; the hot key's rows spread over S partitions. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, factKey: String,
                 dimKey: String, factUnique: String, salts: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(col(factUnique)), lit(salts)))
    val repDim = dim.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts - 1L))))
    saltedFact.join(repDim,
      saltedFact(factKey) === repDim(dimKey) && saltedFact("__salt") === repDim("__salt"))
  }

  type QFn = (SparkSession, String) => DataFrame

  def queries: Map[String, QFn] = Map(
    "skew_salted_agg" -> ((s, dir) => {
      saltedAggregate(Tables.load(s, dir, "events"), "user_id", "event_id",
        "value", salts = 8)
        .select(col("user_id"), col("n_rows"),
          col("total").cast("double").as("total"))
        .orderBy(col("user_id"))
    }),
    "skew_salted_join" -> ((s, dir) => {
      saltedJoin(Tables.load(s, dir, "orders"), Tables.load(s, dir, "customer"),
        "o_custkey", "c_custkey", "o_orderkey", salts = 8)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_orderkey")).cast("long").as("s"))
        .orderBy(col("c_mktsegment"))
    }))

  /** Oracles are the UNSALTED queries — salting must be invisible in the
    * result. */
  def oracles: Map[String, String] = Map(
    "skew_salted_agg" ->
      """SELECT user_id, count(*) AS n_rows,
                CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
         FROM events GROUP BY user_id ORDER BY user_id""",
    "skew_salted_join" ->
      """SELECT c_mktsegment, count(*) AS n,
                CAST(sum(o_orderkey) AS BIGINT) AS s
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY c_mktsegment ORDER BY c_mktsegment""")
}
