package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** OVER-window / rank / dedup operator family.
  *
  * Covers the reference's batch over-windows (BatchExecOverAggregate.scala:59
  * with frames in operators/over/frame/: Row/Range × Sliding/Unbounded,
  * OffsetOverFrame for LEAD/LAG), Rank/Top-N (BatchExecRank.scala:55,
  * FlinkLogicalRankRule.scala:141-151 rewriting ROW_NUMBER-filter → Rank),
  * and deduplication (StreamExecDeduplicateRule.scala:114: ROW_NUMBER()=1).
  *
  * Spark has all of these natively in `Window` + window functions; the
  * ROW_NUMBER-filter → per-partition group-limit pushdown the reference
  * implements as a planner rule exists in Catalyst as WindowGroupLimit
  * (Spark ≥3.5) — verified in the spec via the physical plan. Every window
  * is ordered by a unique key suffix so results are total-order
  * deterministic under any parallel schedule.
  */
object Windows {
  type QFn = (SparkSession, String) => DataFrame

  /** ROW_NUMBER per key (RowNumberFunction). */
  private def winRowNumber(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.load(s, dir, "events")
      .select(col("user_id"), col("event_id"), row_number().over(w).as("rn"))
      .orderBy(col("user_id"), col("rn"))
  }

  /** RANK + DENSE_RANK (RankFunction/DenseRankFunction). */
  private def winRank(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment")).orderBy(col("c_acctbal").desc)
    Tables.load(s, dir, "customer")
      .select(col("c_mktsegment"), col("c_custkey"),
        rank().over(w).as("rnk"), dense_rank().over(w).as("drnk"))
      .orderBy(col("c_mktsegment"), col("rnk"), col("c_custkey"))
  }

  /** Top-N per group: the AppendOnlyTopNFunction / BatchExecRank pattern
    * (ROW_NUMBER ≤ n filter). Catalyst pushes a per-partition group limit
    * (WindowGroupLimit) so only n rows per key survive the shuffle —
    * exactly the property that keeps this viable at 100 TB. */
  private def winTopN(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.load(s, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("rn"), col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  /** Dedup keep-first per key (ProcTimeDeduplicateKeepFirstRowFunction →
    * ROW_NUMBER()=1 over event order). */
  private def winDedupFirst(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.load(s, dir, "events")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .orderBy(col("user_id"))
  }

  /** LEAD/LAG (OffsetOverFrame). */
  private def winLeadLag(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.load(s, dir, "events")
      .select(col("user_id"), col("event_id"),
        lag(col("event_type"), 1).over(w).as("prev_type"),
        lead(col("event_type"), 1).over(w).as("next_type"),
        lag(col("event_id"), 2, -1L).over(w).as("prev2_id"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** Running aggregates, ROWS UNBOUNDED PRECEDING frame. */
  private def winRunning(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.load(s, dir, "lineitem")
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        sum(col("l_quantity")).over(w).as("running_qty"),
        count(lit(1)).over(w).as("running_n"))
      .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))
  }

  /** RANGE frame over a numeric ordering (RangeSlidingOverFrame). */
  private def winRange(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment")).orderBy(col("c_acctbal"))
      .rangeBetween(-1000L, 0L)
    Tables.load(s, dir, "customer")
      .select(col("c_mktsegment"), col("c_custkey"),
        count(lit(1)).over(w).as("n_within_1000"))
      .orderBy(col("c_mktsegment"), col("c_custkey"))
  }

  /** NTILE / PERCENT_RANK / CUME_DIST — distributed two-pass form.
    *
    * The semantics are inherently GLOBAL (one total order over the whole
    * table), and the naive `Window.orderBy(...)` plans a single-partition
    * WindowExec — a full-table sort on one task, the one plan shape that
    * cannot survive a 100× scale-up (the reference's unpartitioned OVER is
    * likewise parallelism-1, BatchExecOverAggregate.scala:59). The
    * distributed form never materializes the total order on one executor:
    *
    *  1. derive ~P order-preserving range buckets from approxQuantile on
    *     the order key (31 doubles of driver metadata — deterministic,
    *     unlike relying on a range-exchange's sampled bounds being reused
    *     identically across plan branches);
    *  2. count rows per bucket (map-side-combined agg, ≤P rows) and prefix-
    *     sum the counts into bucket offsets — the only single-partition
    *     step, over metadata rows, broadcast back;
    *  3. per-bucket local row_number (hash-partitioned WindowExec) + the
    *     bucket's offset = the row's GLOBAL position r;
    *  4. ntile/percent_rank/cume_dist are then pure arithmetic over (r, N):
    *     the (c_acctbal, c_custkey) order key is unique, so rank ==
    *     row_number and cume_dist == r/N exactly.
    */
  private def winDistribution(s: SparkSession, dir: String): DataFrame = {
    val src = Tables.load(s, dir, "customer").select(col("c_custkey"), col("c_acctbal"))
    val p = s.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val bounds = src.stat
      .approxQuantile("c_acctbal", (1 until p).map(_.toDouble / p).toArray, 0.001)
    // order-preserving bucket id: #bounds strictly below the key — rows
    // tied on the key land in one bucket, so the within-bucket sort owns
    // the (c_acctbal, c_custkey) tiebreak
    val bucket = bounds.foldLeft(lit(0))((acc, b) =>
      acc + when(col("c_acctbal") > lit(b), 1).otherwise(0))
    val bucketed = src.withColumn("__b", bucket)
    val cnts = bucketed.groupBy(col("__b")).agg(count(lit(1)).as("__cnt"))
    val offW = Window.orderBy(col("__b")).rowsBetween(Window.unboundedPreceding, -1)
    val offs = cnts
      .withColumn("__off", coalesce(sum(col("__cnt")).over(offW), lit(0L)))
      .withColumn("__n", sum(col("__cnt")).over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .select(col("__b"), col("__off"), col("__n"))
    val localW = Window.partitionBy(col("__b")).orderBy(col("c_acctbal"), col("c_custkey"))
    val withPos = bucketed
      .join(broadcast(offs), "__b")
      .withColumn("__r", row_number().over(localW).cast("long") + col("__off"))
    val n = col("__n"); val r = col("__r")
    // NTILE(4): first (N mod 4) buckets carry floor(N/4)+1 rows (the
    // standard larger-buckets-first split Spark and DuckDB both implement)
    val rem = n % lit(4)
    val bsize = floor((n - rem) / lit(4))
    val cutoff = rem * (bsize + lit(1))
    withPos.select(col("c_custkey"),
        when(r <= cutoff, floor((r - lit(1)) / (bsize + lit(1))) + lit(1))
          .otherwise(rem + floor((r - cutoff - lit(1)) / greatest(bsize, lit(1))) + lit(1))
          .cast("int").as("quartile"),
        when(n === 1, lit(0.0))
          .otherwise((r - lit(1)).cast("double") / (n - lit(1))).as("pct_rank"),
        (r.cast("double") / n).as("cume"))
      .orderBy(col("c_custkey"))
  }

  /** FIRST_VALUE / LAST_VALUE / NTH_VALUE over full-partition frame. */
  private def winFirstLast(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.load(s, dir, "events")
      .select(col("user_id"), col("event_id"),
        first(col("event_type")).over(w).as("first_type"),
        last(col("event_type")).over(w).as("last_type"),
        nth_value(col("event_type"), 2).over(w).as("second_type"))
      .orderBy(col("user_id"), col("event_id"))
  }

  def queries: Map[String, QFn] = Map(
    "win_row_number" -> (winRowNumber _),
    "win_rank" -> (winRank _),
    "win_topn" -> (winTopN _),
    "win_dedup_first" -> (winDedupFirst _),
    "win_lead_lag" -> (winLeadLag _),
    "win_running" -> (winRunning _),
    "win_range" -> (winRange _),
    "win_distribution" -> (winDistribution _),
    "win_first_last" -> (winFirstLast _)
  )

  def oracles: Map[String, String] = Map(
    "win_row_number" ->
      """SELECT user_id, event_id,
         row_number() OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
         FROM events ORDER BY user_id, rn""",
    "win_rank" ->
      """SELECT c_mktsegment, c_custkey,
         rank() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC) AS rnk,
         dense_rank() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC) AS drnk
         FROM customer ORDER BY c_mktsegment, rnk, c_custkey""",
    "win_topn" ->
      """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
           FROM orders) WHERE rn <= 3 ORDER BY o_custkey, rn""",
    "win_dedup_first" ->
      """SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type FROM (
           SELECT *, row_number() OVER (PARTITION BY user_id
                                        ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
           FROM events) WHERE rn = 1 ORDER BY user_id""",
    "win_lead_lag" ->
      """SELECT user_id, event_id,
         lag(event_type, 1) OVER w AS prev_type,
         lead(event_type, 1) OVER w AS next_type,
         lag(event_id, 2, -1) OVER w AS prev2_id
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
         ORDER BY user_id, event_id""",
    "win_running" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
         sum(l_quantity) OVER w AS running_qty,
         count(*) OVER w AS running_n
         FROM lineitem
         WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         ORDER BY l_suppkey, l_orderkey, l_linenumber""",
    "win_range" ->
      """SELECT c_mktsegment, c_custkey, count(*) OVER w AS n_within_1000
         FROM customer
         WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal
                      RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW)
         ORDER BY c_mktsegment, c_custkey""",
    "win_distribution" ->
      """SELECT c_custkey,
         ntile(4) OVER w AS quartile,
         percent_rank() OVER w AS pct_rank,
         cume_dist() OVER w AS cume
         FROM customer
         WINDOW w AS (ORDER BY c_acctbal, c_custkey)
         ORDER BY c_custkey""",
    "win_first_last" ->
      """SELECT user_id, event_id,
         first_value(event_type) OVER w AS first_type,
         last_value(event_type) OVER w AS last_type,
         nth_value(event_type, 2) OVER w AS second_type
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         ORDER BY user_id, event_id"""
  )
}
