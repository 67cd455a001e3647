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
  * Statement shape (round 8 widened — aliases + multi-key conjunctions):
  *
  *   SELECT <cols> FROM <left> [[AS] la] JOIN <right> [[AS] ra]
  *     FOR SYSTEM_TIME AS OF <timeExpr>
  *   ON <k> = <k> [AND <k> = <k> ...] [WHERE ... | ORDER BY ...]
  *
  * where <timeExpr> and every <k> are bare or alias/table-dotted column
  * names; several equality conjuncts compose into one STRUCT as-of key
  * (the custom operator clusters and orders on the key expression
  * generically, so a struct key needs no operator change). Alias prefixes
  * are resolved during parsing and stripped from the outer SELECT/tail.
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
    ("""(?is)SELECT\s+(.*?)\s+FROM\s+(\w+)(?:\s+(?:AS\s+)?(?!JOIN\b)(\w+))?""" +
     """\s+JOIN\s+(\w+)(?:\s+(?:AS\s+)?(?!FOR\b)(\w+))?""" +
     """\s+FOR\s+SYSTEM_TIME\s+AS\s+OF\s+([\w.]+(?:\(\s*\))?)""" +
     """\s+ON\s+(.*?)\s*((?:WHERE|ORDER|GROUP|LIMIT)\b.*)?""").r
  private val eqRe = """([\w.]+)\s*=\s*([\w.]+)""".r

  private def bare(c: String): String = c.split("\\.").last

  def run(spark: SparkSession, sql: String): DataFrame = sql.trim match {
    case stRe(select, lt, la, rt, ra, timeExpr, onCond, tail) =>
      val left = spark.table(lt)
      val right = spark.table(rt)
      val rTimeCol = timeAttributes.get(rt.toLowerCase).map(_._1).getOrElse(
        throw new IllegalArgumentException(
          s"no watermark declared for versioned table $rt — declare it in DDL " +
            s"(WATERMARK FOR <col> AS ...) or call SystemTimeJoin.declareWatermark"))
      // alias → side; fall back to column membership for bare names
      val lNames = Set(Option(la), Some(lt)).flatten.map(_.toLowerCase)
      val rNames = Set(Option(ra), Some(rt)).flatten.map(_.toLowerCase)
      def sideOf(c: String): Option[Boolean] = c.split("\\.") match {
        case Array(p, _) if lNames(p.toLowerCase) => Some(true)
        case Array(p, _) if rNames(p.toLowerCase) => Some(false)
        case Array(b) if left.columns.contains(b) && !right.columns.contains(b) => Some(true)
        case Array(b) if right.columns.contains(b) && !left.columns.contains(b) => Some(false)
        case _ => None
      }
      // the ON conjunction: every conjunct an equality, each with one
      // operand per side
      val pairs = onCond.split("""(?i)\s+AND\s+""").toSeq.map {
        case eqRe(a, b) => (sideOf(a), sideOf(b)) match {
          case (Some(true), _) | (_, Some(false)) => (bare(a), bare(b))
          case (Some(false), _) | (_, Some(true)) => (bare(b), bare(a))
          case _ => throw new IllegalArgumentException(
            s"cannot resolve join-key sides in '$a = $b'")
        }
        case other => throw new IllegalArgumentException(
          s"temporal-join ON must be a conjunction of equalities, got '$other'")
      }
      import org.apache.spark.sql.functions.{col, row_number}
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
          val ord = (rTimeCol +: right.columns.filterNot(_ == rTimeCol).toSeq)
            .map(c => col(c).desc)
          val latest = right
            .withColumn("__v", row_number().over(
              Window.partitionBy(pairs.map(p => col(p._2)): _*).orderBy(ord: _*)))
            .filter(col("__v") === 1).drop("__v")
          left.join(latest,
            pairs.map(p => left(p._1) === latest(p._2)).reduce(_ && _))
        } else
          AsOf.joinMulti(left, right,
            pairs.map(p => left(p._1)), pairs.map(p => right(p._2)),
            left(bare(timeExpr)), right(rTimeCol))
      joined.createOrReplaceTempView("__st_out")
      // the view flattens both sides, so strip alias qualifiers from the
      // outer projection and tail
      def strip(s0: String): String =
        (lNames ++ rNames).foldLeft(s0)((acc, a) =>
          acc.replaceAll(s"(?i)\\b$a\\.", ""))
      spark.sql(s"SELECT ${strip(select)} FROM __st_out ${strip(Option(tail).getOrElse(""))}")
    case _ =>
      throw new IllegalArgumentException("unsupported FOR SYSTEM_TIME AS OF shape")
  }
}
