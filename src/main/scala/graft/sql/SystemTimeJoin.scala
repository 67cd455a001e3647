package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.plans.AsOf

/** `FOR SYSTEM_TIME AS OF` SQL syntax (SURVEY.md §7.2 M4) — the reference's
  * temporal-join SQL surface (parserImpls.ftl snapshot clause +
  * LogicalCorrelateToJoinFromTemporalTableRule.scala), routed through the
  * injected parser onto the custom AsOfJoin operator (plans/AsOfJoinPlan).
  *
  * Flink learns the versioned table's event-time attribute from its DDL
  * (`WATERMARK FOR col AS ...`); the analogue here is
  * [[declareWatermark]](table, col) — the same information, declared
  * programmatically instead of via DDL.
  *
  * Restricted statement shape:
  *
  *   SELECT <cols> FROM <left> JOIN <right> FOR SYSTEM_TIME AS OF <timeExpr>
  *   ON <leftKey> = <rightKey> [WHERE ... | ORDER BY ...]
  *
  * where <timeExpr>/<leftKey>/<rightKey> are bare or dotted column names.
  * Output = left columns + right columns (null when no version ≤ time).
  */
object SystemTimeJoin {

  /** table → (event-time column, bounded-out-of-orderness delay); the DDL
    * watermark registry. Fed by `WATERMARK FOR` DDL (sql/WatermarkDdl) or
    * programmatically. */
  private val timeAttributes =
    scala.collection.concurrent.TrieMap.empty[String, (String, String)]

  /** Mirror of `WATERMARK FOR <col> AS <col> - INTERVAL ...` DDL on a (temp)
    * table. `delay` is a Spark duration literal ("5 seconds"). */
  def declareWatermark(table: String, timeCol: String, delay: String = "0 seconds"): Unit =
    timeAttributes(table.toLowerCase) = (timeCol, delay)

  /** The declared (event-time col, delay) for a table, if any. */
  def watermarkOf(table: String): Option[(String, String)] =
    timeAttributes.get(table.toLowerCase)

  def matches(sql: String): Boolean =
    """(?i)FOR\s+SYSTEM_TIME\s+AS\s+OF""".r.findFirstIn(sql).isDefined

  private val stRe =
    """(?is)SELECT\s+(.*?)\s+FROM\s+(\w+)\s+JOIN\s+(\w+)\s+FOR\s+SYSTEM_TIME\s+AS\s+OF\s+([\w.]+(?:\(\s*\))?)\s+ON\s+([\w.]+)\s*=\s*([\w.]+)\s*(.*)""".r

  private def bare(c: String): String = c.split("\\.").last

  def run(spark: SparkSession, sql: String): DataFrame = sql.trim match {
    case stRe(select, lt, rt, timeExpr, k1, k2, tail) =>
      val left = spark.table(lt)
      val right = spark.table(rt)
      val rTimeCol = timeAttributes.get(rt.toLowerCase).map(_._1).getOrElse(
        throw new IllegalArgumentException(
          s"no watermark declared for versioned table $rt — declare it in DDL " +
            s"(WATERMARK FOR <col> AS ...) or call SystemTimeJoin.declareWatermark"))
      // resolve which side each ON operand belongs to
      val (lk, rk) =
        if (left.columns.contains(bare(k1))) (bare(k1), bare(k2))
        else (bare(k2), bare(k1))
      val joined =
        if (timeExpr.toUpperCase.replaceAll("\\s", "") == "PROCTIME()") {
          // Processing-time temporal join (TemporalProcessTimeJoinOperator
          // .java:48 — probe against the build side's LATEST version, no
          // event-time correlation). The bounded shape degenerates to
          // keep-last-per-key + equi-join: by query time every version has
          // "arrived", so the latest is the max over the declared version
          // order. Tiebreak on the remaining columns keeps keep-last
          // deterministic when version times collide — the batch analogue
          // of "last writer wins" needs a total order to be reproducible.
          import org.apache.spark.sql.expressions.Window
          import org.apache.spark.sql.functions.{col, row_number}
          val ord = (rTimeCol +: right.columns.filterNot(_ == rTimeCol).toSeq)
            .map(c => col(c).desc)
          val latest = right
            .withColumn("__v", row_number().over(
              Window.partitionBy(col(rk)).orderBy(ord: _*)))
            .filter(col("__v") === 1).drop("__v")
          left.join(latest, left(lk) === latest(rk))
        } else
          AsOf.join(left, right,
            left(lk), right(rk), left(bare(timeExpr)), right(rTimeCol))
      joined.createOrReplaceTempView("__st_out")
      spark.sql(s"SELECT $select FROM __st_out ${Option(tail).getOrElse("")}")
    case _ =>
      throw new IllegalArgumentException("unsupported FOR SYSTEM_TIME AS OF shape")
  }
}
