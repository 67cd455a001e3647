package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Set-operation family: UNION [ALL], INTERSECT [ALL], EXCEPT [ALL].
  *
  * The reference rewrites these to joins/aggregates
  * (ReplaceIntersectWithSemiJoinRule.scala, RewriteIntersectAllRule.scala,
  * ReplaceMinusWithAntiJoinRule.scala, RewriteMinusAllRule.scala;
  * StreamExecUnion.scala:39). Catalyst ships the identical rewrites
  * (ReplaceIntersectWithSemiJoin, RewriteExceptAll, ...), so the DataFrame
  * calls below produce the same physical shapes — semi/anti hash joins,
  * which broadcast or shuffle exactly like any other join at scale.
  */
object SetOps {
  type QFn = (SparkSession, String) => DataFrame

  // Two overlapping projections with duplicates: nation keys of customers
  // vs nation keys of suppliers.
  private def custNations(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "customer").filter(col("c_custkey") % 2 === 0)
      .select(col("c_nationkey").as("nk"))
  private def suppNations(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "supplier").select(col("s_nationkey").as("nk"))

  private def unionAll(s: SparkSession, dir: String): DataFrame =
    custNations(s, dir).unionAll(suppNations(s, dir))
      .groupBy(col("nk")).agg(count(lit(1)).as("n")).orderBy(col("nk"))

  private def unionDistinct(s: SparkSession, dir: String): DataFrame =
    custNations(s, dir).union(suppNations(s, dir)).distinct().orderBy(col("nk"))

  private def intersect(s: SparkSession, dir: String): DataFrame =
    custNations(s, dir).intersect(suppNations(s, dir)).orderBy(col("nk"))

  private def intersectAll(s: SparkSession, dir: String): DataFrame =
    custNations(s, dir).intersectAll(suppNations(s, dir))
      .groupBy(col("nk")).agg(count(lit(1)).as("n")).orderBy(col("nk"))

  /** Rich suppliers only — the full supplier set covers every nation, which
    * would make the difference vacuously empty at every sf. */
  private def richSuppNations(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "supplier").filter(col("s_acctbal") > 7000)
      .select(col("s_nationkey").as("nk"))

  private def except(s: SparkSession, dir: String): DataFrame =
    custNations(s, dir).except(richSuppNations(s, dir)).orderBy(col("nk"))

  private def exceptAll(s: SparkSession, dir: String): DataFrame =
    custNations(s, dir).exceptAll(suppNations(s, dir))
      .groupBy(col("nk")).agg(count(lit(1)).as("n")).orderBy(col("nk"))

  def queries: Map[String, QFn] = Map(
    "setop_union_all" -> (unionAll _),
    "setop_union_distinct" -> (unionDistinct _),
    "setop_intersect" -> (intersect _),
    "setop_intersect_all" -> (intersectAll _),
    "setop_except" -> (except _),
    "setop_except_all" -> (exceptAll _)
  )

  private val cust = "SELECT c_nationkey AS nk FROM customer WHERE c_custkey % 2 = 0"
  private val supp = "SELECT s_nationkey AS nk FROM supplier"

  def oracles: Map[String, String] = Map(
    "setop_union_all" ->
      s"SELECT nk, count(*) AS n FROM (($cust) UNION ALL ($supp)) GROUP BY nk ORDER BY nk",
    "setop_union_distinct" ->
      s"SELECT nk FROM (($cust) UNION ($supp)) ORDER BY nk",
    "setop_intersect" ->
      s"SELECT nk FROM (($cust) INTERSECT ($supp)) ORDER BY nk",
    "setop_intersect_all" ->
      s"SELECT nk, count(*) AS n FROM (($cust) INTERSECT ALL ($supp)) GROUP BY nk ORDER BY nk",
    "setop_except" ->
      s"""SELECT nk FROM (($cust) EXCEPT
           (SELECT s_nationkey AS nk FROM supplier WHERE s_acctbal > 7000)) ORDER BY nk""",
    "setop_except_all" ->
      s"SELECT nk, count(*) AS n FROM (($cust) EXCEPT ALL ($supp)) GROUP BY nk ORDER BY nk"
  )
}
