package graft.sql

import graft.{SparkSpec, Tables}

/** The EXISTS-over-OR pre-rewrite (SubqueryOrRewrite): shapes with the
  * correlation under a disjunction inside the subquery filter — which
  * stock Spark 4.1 aborts on with an internal error during subquery
  * rewrite — must run through the graft session and agree with the
  * manually-distributed equivalent Spark executes natively. */
class SubqueryOrRewriteSpec extends SparkSpec {

  private def rows(sql: String): Set[Long] = {
    Tables.registerAll(spark, sf)
    spark.sql(sql).collect().map(_.getLong(0)).toSet
  }

  test("correlated EXISTS with correlation under OR runs and matches the split form") {
    // un-parenthesized AND/OR: parses as (corr AND a) OR b — the
    // correlation itself sits under the disjunction
    val fused = rows(
      """SELECT o_orderkey FROM orders o WHERE EXISTS
        |  (SELECT 1 FROM lineitem
        |   WHERE l_orderkey = o.o_orderkey AND l_quantity > 30.0
        |      OR l_extendedprice > 90000.0)""".stripMargin)
    val split = rows(
      """SELECT o_orderkey FROM orders o WHERE
        |  EXISTS (SELECT 1 FROM lineitem
        |          WHERE l_orderkey = o.o_orderkey AND l_quantity > 30.0)
        |  OR EXISTS (SELECT 1 FROM lineitem WHERE l_extendedprice > 90000.0)""".stripMargin)
    assert(fused.nonEmpty && fused == split)
  }

  test("NOT EXISTS with correlation under OR runs and matches De Morgan of the split") {
    val fused = rows(
      """SELECT o_orderkey FROM orders o WHERE NOT EXISTS
        |  (SELECT 1 FROM lineitem
        |   WHERE l_orderkey = o.o_orderkey AND l_returnflag = 'R'
        |      OR l_orderkey = o.o_orderkey AND l_quantity > 45.0)""".stripMargin)
    val split = rows(
      """SELECT o_orderkey FROM orders o WHERE
        |  NOT EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o.o_orderkey AND l_returnflag = 'R')
        |  AND NOT EXISTS (SELECT 1 FROM lineitem
        |                  WHERE l_orderkey = o.o_orderkey AND l_quantity > 45.0)""".stripMargin)
    assert(fused.nonEmpty && fused == split)
  }

  test("three-way nested disjunction splits to fixed point") {
    val fused = rows(
      """SELECT c_custkey FROM customer c WHERE EXISTS
        |  (SELECT 1 FROM orders
        |   WHERE o_custkey = c.c_custkey AND o_orderstatus = 'F'
        |      OR o_custkey = c.c_custkey AND o_totalprice > 200000.0
        |      OR o_orderpriority = '1-URGENT')""".stripMargin)
    val split = rows(
      """SELECT c_custkey FROM customer c WHERE
        |  EXISTS (SELECT 1 FROM orders
        |          WHERE o_custkey = c.c_custkey AND o_orderstatus = 'F')
        |  OR EXISTS (SELECT 1 FROM orders
        |             WHERE o_custkey = c.c_custkey AND o_totalprice > 200000.0)
        |  OR EXISTS (SELECT 1 FROM orders WHERE o_orderpriority = '1-URGENT')""".stripMargin)
    assert(fused.nonEmpty && fused == split)
  }

  test("correlation NOT under OR is left to Catalyst (no behavior change)") {
    val q = rows(
      """SELECT o_orderkey FROM orders o WHERE EXISTS
        |  (SELECT 1 FROM lineitem
        |   WHERE l_orderkey = o.o_orderkey
        |     AND (l_quantity > 30.0 OR l_extendedprice > 90000.0))""".stripMargin)
    assert(q.nonEmpty)
  }
}
