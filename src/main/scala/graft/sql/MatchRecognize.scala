package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.streaming.{Cep, KeyedRow}

/** Restricted SQL MATCH_RECOGNIZE front-end over the CEP NFA
  * (SURVEY.md §2.10 — StreamExecMatch.scala:68 / MatchCodeGenerator.scala;
  * grammar subset of flink-sql-parser's Calcite MATCH_RECOGNIZE).
  *
  * Supported clause shape (what MatchRecognizeITCase's core cases use):
  *
  *   SELECT <cols of: partition col, start_ts, end_ts, n_rows>
  *   FROM <table> MATCH_RECOGNIZE (
  *     PARTITION BY <col>
  *     ORDER BY <col>                  -- an event-time column
  *     ONE ROW PER MATCH
  *     [AFTER MATCH SKIP PAST LAST ROW | AFTER MATCH SKIP TO NEXT ROW]
  *     PATTERN ( V1 V2 ... )           -- plain variables, strict contiguity
  *     [WITHIN INTERVAL '<n>' <UNIT>]
  *     DEFINE V1 AS <sql predicate>, V2 AS <sql predicate>, ...
  *   )
  *   [ORDER BY ...]
  *
  * Not supported (documented gaps, API-level Cep covers the semantics):
  * quantifiers (+ * ? {n}), MEASURES expressions, ALL ROWS PER MATCH,
  * PREV/NEXT/FIRST/LAST navigation in DEFINE.
  *
  * Implementation: each DEFINE predicate is compiled by Spark itself into a
  * boolean column (so the full scalar expression surface works), the row is
  * reduced to (partition, time, seq, defines-bitmask), and the bitmask
  * drives the NFA steps. Output schema: partition col (as `part_key`),
  * start_ts / end_ts (epoch µs of the first/last matched row), n_rows.
  */
object MatchRecognize {

  case class Spec(table: String, partitionBy: String, orderBy: String,
                  afterMatch: Cep.AfterMatch, pattern: Seq[String],
                  withinMs: Long, defines: Map[String, String],
                  selectList: String, tailClause: String)

  private val mrRe =
    """(?is)SELECT\s+(.*?)\s+FROM\s+(\w+)\s+MATCH_RECOGNIZE\s*\((.*)\)\s*(ORDER\s+BY.*)?""".r
  private val partRe = """(?is)PARTITION\s+BY\s+(\w+)""".r
  private val ordRe = """(?is)ORDER\s+BY\s+(\w+)""".r
  private val skipRe = """(?is)AFTER\s+MATCH\s+SKIP\s+(PAST\s+LAST\s+ROW|TO\s+NEXT\s+ROW)""".r
  private val patRe = """(?is)PATTERN\s*\(\s*([\w\s+*?{},]+?)\s*\)""".r
  private val withinRe = """(?is)WITHIN\s+INTERVAL\s+'(\d+)'\s+(\w+)""".r
  private val defineRe = """(?is)DEFINE\s+(.*)$""".r

  private def unitMicros(u: String): Long = u.toUpperCase match {
    case "SECOND" => 1000000L
    case "MINUTE" => 60L * 1000000L
    case "HOUR" => 3600L * 1000000L
    case "DAY" => 86400L * 1000000L
    case other => throw new IllegalArgumentException(s"WITHIN unit $other")
  }

  /** Is this statement a (restricted) MATCH_RECOGNIZE query? Requires the
    * keyword followed by its clause paren so table/view names containing the
    * word don't re-trigger the front-end. */
  def matches(sql: String): Boolean =
    """(?i)\bMATCH_RECOGNIZE\s*\(""".r.findFirstIn(sql).isDefined

  def parse(sql: String): Spec = sql.trim match {
    case mrRe(select, table, body, tail) =>
      val part = partRe.findFirstMatchIn(body).map(_.group(1))
        .getOrElse(throw new IllegalArgumentException("PARTITION BY required"))
      val ord = ordRe.findFirstMatchIn(body).map(_.group(1))
        .getOrElse(throw new IllegalArgumentException("ORDER BY required"))
      val skip = skipRe.findFirstMatchIn(body).map(_.group(1).toUpperCase) match {
        case Some(s) if s.startsWith("TO") => Cep.SkipToNextRow
        case _ => Cep.SkipPastLastRow
      }
      val pattern = patRe.findFirstMatchIn(body)
        .map(_.group(1).trim.split("""\s+""").toSeq)
        .getOrElse(throw new IllegalArgumentException("PATTERN required"))
      pattern.foreach { v =>
        require(v.matches("""\w+"""), s"quantifiers not supported: $v")
      }
      val within = withinRe.findFirstMatchIn(body)
        .map(m => m.group(1).toLong * unitMicros(m.group(2)))
        .getOrElse(Long.MaxValue)
      val defBody = defineRe.findFirstMatchIn(body).map(_.group(1))
        .getOrElse(throw new IllegalArgumentException("DEFINE required"))
      // split "A AS pred, B AS pred" on top-level commas preceding "<var> AS"
      val defines = defBody.split("""(?i),(?=\s*\w+\s+AS\s)""").map { d =>
        val Array(name, pred) = d.trim.split("""(?i)\s+AS\s+""", 2)
        // strip the variable's own prefix: "A.col" → "col"
        name.trim -> pred.trim.replaceAll(s"""(?i)\\b${name.trim}\\.""", "")
      }.toMap
      Spec(table, part, ord, skip, pattern, within, defines,
        select.trim, Option(tail).getOrElse("").trim)
    case _ => throw new IllegalArgumentException("unsupported MATCH_RECOGNIZE shape")
  }

  /** Execute against the registered table; returns the outer SELECT. */
  def run(spark: SparkSession, sql: String): DataFrame = {
    val spec = parse(sql)
    val src = spark.table(spec.table)
    // compile DEFINE predicates with Spark, pack into a bitmask string
    val flags = spec.pattern.map(v => expr(spec.defines.getOrElse(v,
      throw new IllegalArgumentException(s"no DEFINE for pattern variable $v"))))
    val mask = concat(flags.map(f => when(f, lit("1")).otherwise(lit("0"))): _*)
    val seqW = Window.partitionBy(col(spec.partitionBy)).orderBy(col(spec.orderBy))
    import spark.implicits._
    val rows = src
      .withColumn("__mask", mask)
      .withColumn("__seq", row_number().over(seqW).cast("long"))
      .select(col(spec.partitionBy).cast("long").as("key"),
        expr(s"unix_micros(cast(${spec.orderBy} as timestamp))").as("ts"),
        col("__seq").as("id"), col("__mask").as("kind"), lit(0.0).as("value"))
      .as[KeyedRow]
    val steps = spec.pattern.zipWithIndex.map { case (v, i) =>
      Cep.Step(v, r => r.kind.charAt(i) == '1', strict = i > 0) // MR = strict contiguity
    }
    val matchesDs = Cep.matchBatch(rows,
      Cep.Pattern(steps, spec.withinMs, spec.afterMatch))
    val out = matchesDs.select(col("key").as(spec.partitionBy),
      col("start_ts"), col("end_ts"), size(col("ids")).cast("long").as("n_rows"))
    out.createOrReplaceTempView("__mr_out")
    spark.sql(s"SELECT ${spec.selectList} FROM __mr_out ${spec.tailClause}")
  }
}
