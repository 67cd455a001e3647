package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** TPC-H-style relational queries: scan → filter → aggregate → sort pipelines.
  *
  * Mirrors the reference's batch SQL surface (Blink planner BatchExecCalc /
  * BatchExecHashAggregate / BatchExecHashJoin / BatchExecSortLimit — see
  * flink-table-planner-blink nodes/physical/batch/) exercised by its TPC-H
  * e2e suite (flink-end-to-end-tests/flink-tpch-test, test_tpch.sh:22).
  *
  * Spark-first: every query is a declarative DataFrame plan, so Catalyst does
  * predicate pushdown into the parquet scan, column pruning, partial (map-side)
  * aggregation, and broadcast-join selection automatically — verified via
  * .explain in the specs. Money arithmetic goes through DECIMAL(18,2) so
  * results are bit-exact and order-independent (safe under any shuffle
  * schedule at any scale), then surfaces as DOUBLE for a stable schema.
  */
object Relational {
  type QFn = (SparkSession, String) => DataFrame

  /** Exact money type: sums of DECIMAL are order-independent, unlike DOUBLE. */
  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))
  private def d(c: Column): Column = c.cast("double")

  /** TPC-H Q1: pricing summary report.
    * Plan shape: parquet scan (filter pushed) → partial hash agg → shuffle on
    * (returnflag, linestatus) → final hash agg → sort. 6 groups at any SF, so
    * the shuffle moves only partial aggregates — scales linearly in input. */
  def q1(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(s, dir, "lineitem")
    li.filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp_ntz"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        d(sum(dec(col("l_extendedprice")))).as("sum_base_price"),
        d(sum(dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 2)) - dec(col("l_discount"))))).as("sum_disc_price"),
        d(sum(dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 2)) - dec(col("l_discount"))) * (lit(1).cast(DecimalType(18, 2)) + dec(col("l_tax"))))).as("sum_charge"),
        (sum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
        (d(sum(dec(col("l_extendedprice")))) / count(lit(1))).as("avg_price"),
        (d(sum(dec(col("l_discount")))) / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val q1Oracle: String =
    """SELECT l_returnflag, l_linestatus,
       sum(l_quantity) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
       sum(l_quantity) / count(*) AS avg_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
       CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_disc,
       count(*) AS count_order
       FROM lineitem
       WHERE l_shipdate <= TIMESTAMP '1998-09-01'
       GROUP BY l_returnflag, l_linestatus
       ORDER BY l_returnflag, l_linestatus"""

  /** TPC-H Q3: shipping priority — join + agg + top-10 sort-limit
    * (BatchExecSortLimit.scala:52: per-partition top-K then global merge,
    * which Spark's TakeOrderedAndProject does identically). */
  def q3(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.load(s, dir, "orders")
      .filter(col("o_orderdate") < lit("1998-03-15").cast("timestamp_ntz"))
    val li = Tables.load(s, dir, "lineitem")
      .filter(col("l_shipdate") > lit("1997-03-15").cast("timestamp_ntz"))
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(d(sum(dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 2)) - dec(col("l_discount"))))).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q6: single-pass filtered global agg — pure scan efficiency;
    * all three predicates push into the parquet reader. */
  def q6(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp_ntz") &&
              col("l_shipdate") < lit("1998-01-01").cast("timestamp_ntz") &&
              col("l_discount").between(0.03, 0.07) &&
              col("l_quantity") < 24)
      .agg(d(sum(dec(col("l_extendedprice")) * dec(col("l_discount")))).as("revenue"),
           count(lit(1)).as("n"))

  /** Scalar correlated subquery (TPC-H Q17 shape): parts priced above 1.2×
    * their brand's average. Spark: decorrelated into an aggregate + join —
    * the same rewrite as the reference's FlinkSubQueryRemoveRule. */
  def relScalarSubquery(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.load(s, dir, "part")
    val brandAvg = p.groupBy(col("p_brand").as("b_brand"))
      .agg((d(sum(dec(col("p_retailprice")))) / count(lit(1))).as("avg_price"))
    p.join(brandAvg, col("p_brand") === col("b_brand"))
      .filter(col("p_retailprice") > col("avg_price") * 1.05)
      .select(col("p_partkey"), col("p_brand"), col("p_retailprice"))
      .orderBy(col("p_partkey"))
  }

  /** IN-subquery (rewritten to semi join by Catalyst, same as the
    * reference's subquery_rewrite phase). */
  def relInSubquery(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql("""SELECT o_orderkey, o_totalprice FROM orders
             WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
             ORDER BY o_orderkey""")
  }

  /** ORDER BY + LIMIT (BatchExecLimit.scala:47 / SortLimitOperator). */
  def relSortLimit(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(25)
      .select(col("o_orderkey"), col("o_totalprice"))

  /** Table.orderBy(...).offset(n).fetch(m) (Table.java:1028-1076) — the
    * paginated top-k. Spark's OFFSET ... LIMIT plans a single
    * TakeOrderedAndProject(limit = offset+fetch) — the driver-bounded
    * global top-k, no full sort. */
  def relOffsetFetch(s: SparkSession, dir: String): DataFrame = {
    Tables.load(s, dir, "orders").createOrReplaceTempView("rel_orders_of")
    s.sql("""SELECT o_orderkey, o_totalprice FROM rel_orders_of
             ORDER BY o_totalprice DESC, o_orderkey
             LIMIT 25 OFFSET 10""")
  }

  /** SELECT DISTINCT (DataSet.distinct, DataSet.java:596). */
  def relDistinct(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "orders")
      .select(col("o_orderstatus"), col("o_orderpriority"))
      .distinct()
      .orderBy(col("o_orderstatus"), col("o_orderpriority"))

  /** Inline VALUES (StreamExecValues.scala / ValuesInputFormat.java →
    * Spark LocalRelation) joined against a real table. */
  def relValues(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val tiers = Seq((0, "AMERICAS"), (1, "EMEA"), (2, "APAC"), (3, "EMEA"), (4, "APAC"))
      .toDF("rk", "tier")
    Tables.load(s, dir, "region")
      .join(broadcast(tiers), col("r_regionkey") === col("rk"))
      .select(col("r_regionkey"), col("r_name"), col("tier"))
      .orderBy(col("r_regionkey"))
  }

  /** PIVOT (reference: manual CASE aggregation; Spark has first-class
    * RelationalGroupedDataset.pivot, planned as the same CASE+agg). */
  def relPivot(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy(col("o_orderpriority"))

  def queries: Map[String, QFn] = Map(
    "q1_agg" -> (q1 _),
    "q3_shipping_priority" -> (q3 _),
    "q6_forecast" -> (q6 _),
    "rel_scalar_subquery" -> (relScalarSubquery _),
    "rel_in_subquery" -> (relInSubquery _),
    "rel_sort_limit" -> (relSortLimit _),
    "rel_offset_fetch" -> (relOffsetFetch _),
    "rel_distinct" -> (relDistinct _),
    "rel_values" -> (relValues _),
    "rel_pivot" -> (relPivot _)
  )

  def oracles: Map[String, String] = Map(
    "q1_agg" -> q1Oracle,
    "q3_shipping_priority" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                  (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         WHERE c_mktsegment = 'BUILDING'
           AND o_orderdate < TIMESTAMP '1998-03-15'
           AND l_shipdate > TIMESTAMP '1997-03-15'
         GROUP BY l_orderkey, o_orderdate, o_orderpriority
         ORDER BY revenue DESC, l_orderkey LIMIT 10""",
    "q6_forecast" ->
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                          CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
                count(*) AS n
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
           AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24""",
    "rel_scalar_subquery" ->
      """SELECT p_partkey, p_brand, p_retailprice
         FROM part p
         WHERE p_retailprice > 1.05 * (
           SELECT CAST(sum(CAST(p2.p_retailprice AS DECIMAL(18,2))) AS DOUBLE) / count(*)
           FROM part p2 WHERE p2.p_brand = p.p_brand)
         ORDER BY p_partkey""",
    "rel_in_subquery" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
         ORDER BY o_orderkey""",
    "rel_sort_limit" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 25""",
    "rel_offset_fetch" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 25 OFFSET 10""",
    "rel_distinct" ->
      """SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
         ORDER BY o_orderstatus, o_orderpriority""",
    "rel_values" ->
      """SELECT r_regionkey, r_name, tier
         FROM region
         JOIN (VALUES (0,'AMERICAS'),(1,'EMEA'),(2,'APAC'),(3,'EMEA'),(4,'APAC')) AS t(rk, tier)
           ON r_regionkey = rk
         ORDER BY r_regionkey""",
    "rel_pivot" ->
      """SELECT o_orderpriority,
         count(*) FILTER (o_orderstatus = 'F') AS "F",
         count(*) FILTER (o_orderstatus = 'O') AS "O",
         count(*) FILTER (o_orderstatus = 'P') AS "P"
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""
  )
}
