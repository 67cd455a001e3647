package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Aggregation operator family.
  *
  * Mirrors the reference's batch/stream aggregate surface: hash aggregate
  * with partial/final split (BatchExecHashAggregate.scala:44, runtime
  * BytesHashMap.java), grouping sets decomposition
  * (DecomposeGroupingSetsRule.scala:100-164), distinct-agg split
  * (SplitAggregateRule.scala), and the built-in agg function set
  * (planner/functions/aggfunctions/: Avg,Count,Sum,Min,Max,First/LastValue,
  * ListAgg,Collect,Stddev/Var — BuiltInFunctionDefinitions.java:242-308).
  *
  * All of the physical machinery (map-side partial aggregation, spillable
  * hash maps, Expand for grouping sets / distinct aggs, AQE skew handling)
  * is Catalyst/Tungsten built-in; these queries declare semantics only.
  * Money sums run over DECIMAL(18,2) for order-independent exactness —
  * at 1000 executors the reduction tree order is nondeterministic, so
  * double-sum results would not even be stable run-to-run.
  */
object Aggregations {
  type QFn = (SparkSession, String) => DataFrame

  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Global (no-key) aggregate — single final reduce after partials. */
  private def aggGlobal(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "lineitem").agg(
      count(lit(1)).as("n_rows"),
      sum(col("l_quantity")).as("sum_qty"),
      min(col("l_shipdate")).as("min_ship"),
      max(col("l_shipdate")).as("max_ship"),
      sum(dec(col("l_extendedprice"))).cast("double").as("sum_price"))

  /** Distinct aggregates — Catalyst plans these via Expand (same shape as
    * the reference's SplitAggregateRule distinct split). */
  private def aggDistinct(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        sum_distinct(col("l_quantity")).as("sum_distinct_qty"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"))

  /** GROUPING SETS with grouping_id (DecomposeGroupingSetsRule → Expand). */
  private def aggGroupingSets(s: SparkSession, dir: String): DataFrame = {
    Tables.load(s, dir, "orders").createOrReplaceTempView("graft_orders_gs")
    s.sql("""
      SELECT o_orderstatus, o_orderpriority,
             count(*) AS n, sum(o_custkey) AS sum_cust
      FROM graft_orders_gs
      GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                              (o_orderstatus, o_orderpriority))
      ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""")
  }

  /** CUBE + grouping_id(). */
  private def aggCube(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), grouping_id().as("gid"))
      .orderBy(col("o_orderstatus").asc_nulls_first,
               col("o_orderpriority").asc_nulls_first, col("gid"))

  /** ROLLUP. */
  private def aggRollup(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
      .orderBy(col("l_returnflag").asc_nulls_first,
               col("l_linestatus").asc_nulls_first)

  /** STDDEV/VAR family (Stddev/Var aggfunctions in the reference).
    * Double moments are order-dependent in the last ulps, so results are
    * rounded to 6 decimals on both sides — the reference's own TPC
    * comparators use the same tolerance idea (TpchResultComparator.java:28).
    * Inputs are integer-valued l_quantity, keeping moments tiny and tame. */
  private def aggStats(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        round(stddev_pop(col("l_quantity")), 6).as("sd_pop"),
        round(stddev_samp(col("l_quantity")), 6).as("sd_samp"),
        round(var_pop(col("l_quantity")), 6).as("v_pop"),
        round(var_samp(col("l_quantity")), 6).as("v_samp"),
        avg(col("l_quantity")).as("avg_qty"))
      .orderBy(col("l_returnflag"))

  /** FIRST_VALUE/LAST_VALUE by explicit order — expressed as min_by/max_by
    * (deterministic; Flink's FirstValue agg is order-of-arrival, which is
    * not reproducible on any parallel engine, so we pin an order key). */
  private def aggMinMaxBy(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")
      .groupBy(col("user_id"))
      .agg(
        min_by(col("event_type"), col("event_id")).as("first_type"),
        max_by(col("event_type"), col("event_id")).as("last_type"),
        min(col("ts")).as("first_ts"),
        max(col("ts")).as("last_ts"))
      .orderBy(col("user_id"))

  /** LISTAGG (ListAggFunction) — ordered, delimiter-joined strings. */
  private def aggListAgg(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "nation")
      .groupBy(col("n_regionkey"))
      .agg(concat_ws(",", array_sort(collect_list(col("n_name")))).as("nations"))
      .orderBy(col("n_regionkey"))

  /** COLLECT (multiset, CollectAggFunction): value→count map, surfaced as
    * deterministic sorted rows for comparison. */
  private def aggCollect(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "orders")
      .groupBy(col("o_orderstatus"))
      .agg(sort_array(collect_list(col("o_orderpriority"))).as("prios_multiset"))
      .select(col("o_orderstatus"),
        explode(col("prios_multiset")).as("prio"))
      .groupBy(col("o_orderstatus"), col("prio"))
      .agg(count(lit(1)).as("multiplicity"))
      .orderBy(col("o_orderstatus"), col("prio"))

  def queries: Map[String, QFn] = Map(
    "agg_global" -> (aggGlobal _),
    "agg_distinct" -> (aggDistinct _),
    "agg_grouping_sets" -> (aggGroupingSets _),
    "agg_cube" -> (aggCube _),
    "agg_rollup" -> (aggRollup _),
    "agg_stats" -> (aggStats _),
    "agg_minmax_by" -> (aggMinMaxBy _),
    "agg_listagg" -> (aggListAgg _),
    "agg_collect" -> (aggCollect _)
  )

  def oracles: Map[String, String] = Map(
    "agg_global" ->
      """SELECT count(*) AS n_rows, sum(l_quantity) AS sum_qty,
         min(l_shipdate) AS min_ship, max(l_shipdate) AS max_ship,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
         FROM lineitem""",
    "agg_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
         count(DISTINCT l_suppkey) AS n_supps,
         sum(DISTINCT l_quantity) AS sum_distinct_qty, count(*) AS n_rows
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "agg_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
         CAST(sum(o_custkey) AS BIGINT) AS sum_cust
         FROM orders
         GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                                 (o_orderstatus, o_orderpriority))
         ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""",
    "agg_cube" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
         GROUPING(o_orderstatus, o_orderpriority) AS gid
         FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
         ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST, gid""",
    "agg_rollup" ->
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty, count(*) AS n
         FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
         ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",
    "agg_stats" ->
      """SELECT l_returnflag,
         round(stddev_pop(l_quantity), 6) AS sd_pop,
         round(stddev_samp(l_quantity), 6) AS sd_samp,
         round(var_pop(l_quantity), 6) AS v_pop,
         round(var_samp(l_quantity), 6) AS v_samp,
         sum(l_quantity) / count(*) AS avg_qty
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "agg_minmax_by" ->
      """SELECT user_id,
         arg_min(event_type, event_id) AS first_type,
         arg_max(event_type, event_id) AS last_type,
         CAST(min(ts) AS TIMESTAMP) AS first_ts,
         CAST(max(ts) AS TIMESTAMP) AS last_ts
         FROM events GROUP BY user_id ORDER BY user_id""",
    "agg_listagg" ->
      """SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS nations
         FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""",
    "agg_collect" ->
      """SELECT o_orderstatus, o_orderpriority AS prio, count(*) AS multiplicity
         FROM orders GROUP BY o_orderstatus, o_orderpriority
         ORDER BY o_orderstatus, prio"""
  )
}
