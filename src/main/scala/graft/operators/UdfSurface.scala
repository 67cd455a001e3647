package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.Tables

/** User-function surface (SURVEY.md §2.9): ScalarFunction → udf(),
  * TableFunction/joinLateral → LATERAL VIEW explode, AggregateFunction →
  * typed Aggregator. Includes the two built-ins Spark lacks natively:
  *
  *  - SINGLE_VALUE (planner/functions/aggfunctions SingleValueAggFunction):
  *    returns the group's unique value, FAILING if the group has more than
  *    one distinct value — semantics the reference enforces at runtime.
  *  - COLLECT (CollectAggFunction): SQL-standard MULTISET agg, value→count.
  *    Surfaced here as a canonical sorted "value:count" string so results
  *    are engine-comparable (Flink's MULTISET also compares unordered).
  */
object UdfSurface {
  type QFn = (SparkSession, String) => DataFrame

  /** SINGLE_VALUE: unique value per group or error. */
  class SingleValue extends Aggregator[String, (String, Boolean), String] {
    def zero: (String, Boolean) = (null, false)
    def reduce(b: (String, Boolean), a: String): (String, Boolean) =
      if (!b._2) (a, true)
      else if (b._1 == a) b
      else throw new IllegalStateException(
        s"SINGLE_VALUE: group has more than one value: '${b._1}' vs '$a'")
    def merge(x: (String, Boolean), y: (String, Boolean)): (String, Boolean) =
      if (!x._2) y else if (!y._2) x
      else if (x._1 == y._1) x
      else throw new IllegalStateException(
        s"SINGLE_VALUE: group has more than one value: '${x._1}' vs '${y._1}'")
    def finish(r: (String, Boolean)): String = r._1
    def bufferEncoder: Encoder[(String, Boolean)] = Encoders.tuple(Encoders.STRING, Encoders.scalaBoolean)
    def outputEncoder: Encoder[String] = Encoders.STRING
  }

  /** COLLECT (multiset): value → occurrence count, canonical rendering. */
  class CollectMultiset extends Aggregator[String, Map[String, Int], String] {
    def zero: Map[String, Int] = Map.empty
    def reduce(b: Map[String, Int], a: String): Map[String, Int] =
      b.updated(a, b.getOrElse(a, 0) + 1)
    def merge(x: Map[String, Int], y: Map[String, Int]): Map[String, Int] =
      y.foldLeft(x) { case (m, (k, v)) => m.updated(k, m.getOrElse(k, 0) + v) }
    def finish(r: Map[String, Int]): String =
      r.toSeq.sortBy(_._1).map { case (k, v) => s"$k:$v" }.mkString(",")
    def bufferEncoder: Encoder[Map[String, Int]] = Encoders.kryo[Map[String, Int]]
    def outputEncoder: Encoder[String] = Encoders.STRING
  }

  /** Scalar UDF (ScalarFunction.java → spark.udf.register): order-value tier. */
  private def udfScalar(s: SparkSession, dir: String): DataFrame = {
    s.udf.register("price_tier", (p: Double) =>
      if (p >= 300000) "HIGH" else if (p >= 100000) "MID" else "LOW")
    Tables.registerAll(s, dir)
    s.sql("""SELECT price_tier(o_totalprice) AS tier, count(*) AS n
             FROM orders GROUP BY tier ORDER BY tier""")
  }

  /** UDTF / joinLateral (TableFunction.java, Table.joinLateral) →
    * LATERAL VIEW explode. */
  private def udtfLateral(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql("""SELECT word, count(*) AS n
             FROM documents LATERAL VIEW explode(split(trim(text), ' +')) t AS word
             WHERE lang = 'en'
             GROUP BY word HAVING count(*) >= 100
             ORDER BY n DESC, word""")
  }

  /** SINGLE_VALUE over a genuinely single-valued group (orderstatus per
    * order) — the failure path is covered by UdfSurfaceSpec. */
  private def aggSingleValue(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sv = udaf(new SingleValue)
    Tables.load(s, dir, "orders")
      .join(Tables.load(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderkey"))
      .agg(sv(col("o_orderstatus")).as("status"))
      .groupBy(col("status")).agg(count(lit(1)).as("n_orders"))
      .orderBy(col("status"))
  }

  /** COLLECT multiset of linestatus per returnflag. */
  private def aggCollectMultiset(s: SparkSession, dir: String): DataFrame = {
    val cm = udaf(new CollectMultiset)
    Tables.load(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(cm(col("l_linestatus")).as("multiset"))
      .orderBy(col("l_returnflag"))
  }

  def queries: Map[String, QFn] = Map(
    "udf_scalar" -> (udfScalar _),
    "udtf_lateral" -> (udtfLateral _),
    "udaf_single_value" -> (aggSingleValue _),
    "udaf_collect_multiset" -> (aggCollectMultiset _)
  )

  def oracles: Map[String, String] = Map(
    "udf_scalar" ->
      """SELECT CASE WHEN o_totalprice >= 300000 THEN 'HIGH'
                     WHEN o_totalprice >= 100000 THEN 'MID' ELSE 'LOW' END AS tier,
                count(*) AS n
         FROM orders GROUP BY tier ORDER BY tier""",
    "udtf_lateral" ->
      """SELECT word, count(*) AS n
         FROM (SELECT unnest(string_split(trim(text), ' ')) AS word
               FROM documents WHERE lang = 'en')
         GROUP BY word HAVING count(*) >= 100
         ORDER BY n DESC, word""",
    "udaf_single_value" ->
      """SELECT status, count(*) AS n_orders FROM (
           SELECT o_orderkey, min(o_orderstatus) AS status
           FROM orders JOIN lineitem ON o_orderkey = l_orderkey
           GROUP BY o_orderkey)
         GROUP BY status ORDER BY status""",
    "udaf_collect_multiset" ->
      """SELECT l_returnflag,
                array_to_string(list_sort(list_transform(map_entries(histogram(l_linestatus)),
                  e -> e.key || ':' || e.value)), ',') AS multiset
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""
  )
}
