package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Join operator family.
  *
  * Covers the reference's batch join surface — hash join
  * (BatchExecHashJoin.scala:53 / HashJoinOperator.java), sort-merge join
  * (BatchExecSortMergeJoin.scala:52), nested-loop for theta joins
  * (BatchExecNestedLoopJoin.scala:45), semi/anti joins
  * (StreamingSemiAntiJoinOperator.java), and the DataSet outer/cross joins
  * (DataSet.java:751-1056) — via Spark's declarative `Dataset.join`.
  *
  * Spark-first scale notes: Catalyst's JoinSelection + AQE pick
  * broadcast-hash vs shuffled-hash vs sort-merge from runtime stats, which
  * strictly dominates Flink 1.12's static planning. Small dimension tables
  * (region/nation/supplier here; any <10MB side at 100 TB) get
  * `broadcast()` hints so no shuffle of the fact table is wasted on them.
  */
object Joins {
  type QFn = (SparkSession, String) => DataFrame

  /** Inner equi-join: orders ⨝ customer, broadcast dim side.
    * At 100 TB customer is large too, but nation/region stay broadcastable;
    * orders⨝customer shuffles on the key — the minimal possible movement. */
  private def joinInner(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(s, dir, "orders")
    val c = Tables.load(s, dir, "customer")
    o.join(c, o("o_custkey") === c("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
           sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total"))
      .orderBy(col("c_mktsegment"))
  }

  /** Left outer join keeping customers with no orders. */
  private def joinLeft(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(s, dir, "customer")
    val o = Tables.load(s, dir, "orders")
    c.join(o, c("c_custkey") === o("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"))
      .orderBy(col("c_custkey"))
  }

  /** Right outer join (mirror of left). */
  private def joinRight(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(s, dir, "orders")
    val c = Tables.load(s, dir, "customer")
    o.join(c, o("o_custkey") === c("c_custkey"), "right")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"))
      .orderBy(col("c_custkey"))
  }

  /** Full outer join over two aggregated sides (null-preserving both ways). */
  private def joinFull(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_events"))
    val c = Tables.load(s, dir, "customer")
      .filter(col("c_custkey") < 100)
      .select(col("c_custkey"), col("c_name"))
    ev.join(c, ev("user_id") === c("c_custkey"), "full")
      .select(col("user_id"), col("n_events"), col("c_custkey"), col("c_name"))
      .orderBy(col("user_id").asc_nulls_first, col("c_custkey").asc_nulls_first)
  }

  /** Left semi join — SQL EXISTS / IN (StreamingSemiAntiJoinOperator.java). */
  private def joinSemi(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(s, dir, "customer")
    val o = Tables.load(s, dir, "orders").filter(col("o_totalprice") > 200000)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  /** Left anti join — SQL NOT EXISTS. */
  private def joinAnti(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(s, dir, "customer")
    // anti against the big-order subset (every customer has SOME order, so
    // the unrestricted anti join would be vacuously empty at every sf)
    val o = Tables.load(s, dir, "orders").filter(col("o_totalprice") > 300000)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  /** Cross join (DataSet.cross, BatchExecNestedLoopJoin) — tiny×tiny only;
    * at scale a cross join is only ever sane with one broadcast side. */
  private def joinCross(s: SparkSession, dir: String): DataFrame = {
    val r = Tables.load(s, dir, "region")
    val n = Tables.load(s, dir, "nation").select(col("n_name"), col("n_regionkey"))
    r.crossJoin(broadcast(n))
      .select(col("r_name"), col("n_name"),
        (col("r_regionkey") === col("n_regionkey")).as("same_region"))
      .orderBy(col("r_name"), col("n_name"))
  }

  /** Theta (non-equi) join — nested-loop semantics
    * (BatchExecNestedLoopJoin.scala:45): suppliers richer than customers of
    * the same nation. Broadcast NLJ: supplier side is tiny. */
  private def joinTheta(s: SparkSession, dir: String): DataFrame = {
    val sup = Tables.load(s, dir, "supplier")
    val c = Tables.load(s, dir, "customer")
    c.join(broadcast(sup),
        c("c_nationkey") === sup("s_nationkey") && c("c_acctbal") > sup("s_acctbal"))
      .groupBy(col("s_suppkey"))
      .agg(count(lit(1)).as("n_richer_customers"))
      .orderBy(col("s_suppkey"))
  }

  /** Multi-way star join with broadcast dims — TPC-H Q5 shape
    * (scan lineitem once; all dims broadcast or pre-shuffled). */
  private def joinStar(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(s, dir, "lineitem")
    val o = Tables.load(s, dir, "orders")
    val c = Tables.load(s, dir, "customer")
    val n = Tables.load(s, dir, "nation")
    val r = Tables.load(s, dir, "region")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(sum((col("l_extendedprice").cast("decimal(18,2)") *
                (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)"))))
             .cast("double").as("revenue"),
           count(lit(1)).as("n_items"))
      .orderBy(col("r_name"), col("n_name"))
  }

  def queries: Map[String, QFn] = Map(
    "join_inner" -> (joinInner _),
    "join_left" -> (joinLeft _),
    "join_right" -> (joinRight _),
    "join_full" -> (joinFull _),
    "join_semi" -> (joinSemi _),
    "join_anti" -> (joinAnti _),
    "join_cross" -> (joinCross _),
    "join_theta" -> (joinTheta _),
    "join_star" -> (joinStar _)
  )

  def oracles: Map[String, String] = Map(
    "join_inner" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "join_left" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders
         FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         GROUP BY c_custkey ORDER BY c_custkey""",
    "join_right" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders
         FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
         GROUP BY c_custkey ORDER BY c_custkey""",
    "join_full" ->
      """WITH ev AS (SELECT user_id, count(*) AS n_events FROM events GROUP BY user_id),
            c AS (SELECT c_custkey, c_name FROM customer WHERE c_custkey < 100)
         SELECT user_id, n_events, c_custkey, c_name
         FROM ev FULL OUTER JOIN c ON user_id = c_custkey
         ORDER BY user_id NULLS FIRST, c_custkey NULLS FIRST""",
    "join_semi" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE EXISTS (SELECT 1 FROM orders
                       WHERE o_custkey = c_custkey AND o_totalprice > 200000)
         ORDER BY c_custkey""",
    "join_anti" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey AND o_totalprice > 300000)
         ORDER BY c_custkey""",
    "join_cross" ->
      """SELECT r_name, n_name, r_regionkey = n_regionkey AS same_region
         FROM region CROSS JOIN nation ORDER BY r_name, n_name""",
    "join_theta" ->
      """SELECT s_suppkey, count(*) AS n_richer_customers
         FROM customer JOIN supplier
           ON c_nationkey = s_nationkey AND c_acctbal > s_acctbal
         GROUP BY s_suppkey ORDER BY s_suppkey""",
    "join_star" ->
      """SELECT r_name, n_name,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                  (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
         count(*) AS n_items
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name, n_name ORDER BY r_name, n_name"""
  )
}
