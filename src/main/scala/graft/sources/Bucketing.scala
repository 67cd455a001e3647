package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Bucketed (hash-clustered) tables — the Spark counterpart of the
  * reference's pre-partitioned exchange elimination.
  *
  * Flink 1.12's batch planner removes an Exchange when the input is already
  * hash-distributed on the join/agg key (BatchExecExchange with
  * DistributionTrait satisfied — flink-table-planner-blink
  * plan/nodes/physical/batch/BatchExecExchange.scala:48, and the
  * FlinkExpandConversionRule satisfies required traits from existing ones).
  * Spark's durable form of that contract is bucketing: `bucketBy(n, key)`
  * writes each file hash-clustered on the key, and the scan then reports
  * `HashPartitioning(key, n)`, so a join or aggregation keyed on the bucket
  * column needs NO shuffle at all — the single biggest lever for a 100 TB
  * fact⋈fact join, where the shuffle IS the cost.
  *
  * The oracle query joins two co-bucketed fact slices; correctness is the
  * plain-join result (DuckDB), while BucketingSpec asserts the scale
  * property: zero ShuffleExchange in the bucketed⋈bucketed plan, exactly one
  * when only one side is bucketed, and bucket pruning for key-equality scans
  * (`SelectedBucketsCount 1 out of N`).
  *
  * At 100 TB the bucket count would be sized so each bucket-file group is a
  * few hundred MB (e.g. 4096 buckets for a 1 TB-per-day fact table); here 8
  * buckets at test scale keeps files non-trivial. Writes land under
  * `target/` as external tables so repeated sessions just overwrite.
  */
object Bucketing {
  type QFn = (SparkSession, String) => DataFrame

  val BucketCount = 8

  private def token(dir: String): String = dir.replaceAll("[^a-zA-Z0-9]", "_")

  /** Session+dir registry so each bench/verify run writes the bucketed
    * tables once, not once per query invocation. Keyed on the session's
    * stable UUID — an identity hash can be reused after GC, which would
    * let a fresh session skip `saveAsTable` and find no catalog entry —
    * and backed by a `tableExists` probe so even a same-UUID restart with
    * a wiped catalog rebuilds. */
  private val built = scala.collection.concurrent.TrieMap.empty[(String, String), Boolean]

  def ordersTable(dir: String): String = s"graft_bkt_orders_${token(dir)}"
  def lineitemTable(dir: String): String = s"graft_bkt_lineitem_${token(dir)}"

  /** Write orders + lineitem slices bucketed by order key. `sortBy` on the
    * bucket key additionally makes each bucket file sort-merge-ready, so the
    * co-located join needs neither exchange nor (per-file) sort work. */
  def ensureBucketed(s: SparkSession, dir: String): Unit = {
    // sessionUUID is private[sql] at the Scala level but public in
    // bytecode; reflection reads the stable per-session identifier the
    // API hides (an identity hash could be reused after GC).
    val uuid =
      try s.getClass.getMethod("sessionUUID").invoke(s).toString
      catch { case _: ReflectiveOperationException =>
        String.valueOf(System.identityHashCode(s)) }
    val key = (uuid, dir)
    if (!s.catalog.tableExists(ordersTable(dir))) built.remove(key)
    built.getOrElseUpdate(key, {
      val orders = Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
      val lineitem = Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"),
          col("l_quantity"))
      orders.write.mode("overwrite")
        .bucketBy(BucketCount, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"target/bucketed/${token(dir)}/orders")
        .format("parquet").saveAsTable(ordersTable(dir))
      lineitem.write.mode("overwrite")
        .bucketBy(BucketCount, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"target/bucketed/${token(dir)}/lineitem")
        .format("parquet").saveAsTable(lineitemTable(dir))
      true
    })
  }

  private val one = lit(1).cast(DecimalType(18, 2))
  private def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 2))

  /** Co-located fact⋈fact join: both sides pre-bucketed on the join key, so
    * the only shuffle in the whole query is the final tiny aggregation. */
  def colocatedJoin(s: SparkSession, dir: String): DataFrame = {
    ensureBucketed(s, dir)
    val o = s.table(ordersTable(dir))
    val l = s.table(lineitemTable(dir))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
          .cast("double").as("revenue"),
        sum(col("l_quantity")).as("sum_qty"))
      .orderBy(col("o_orderpriority"))
  }

  def queries: Map[String, QFn] = Map(
    "bucket_colocated_join" -> (colocatedJoin _)
  )

  def oracles: Map[String, String] = Map(
    "bucket_colocated_join" ->
      """SELECT o_orderpriority, count(*) AS n,
                CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                         (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
                sum(l_quantity) AS sum_qty
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY o_orderpriority ORDER BY o_orderpriority"""
  )
}
