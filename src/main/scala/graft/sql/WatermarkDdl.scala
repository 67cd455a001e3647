package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}

/** `WATERMARK FOR <col> AS <col> - INTERVAL '<n>' <UNIT>` DDL — the
  * reference's event-time declaration in CREATE TABLE
  * (flink-sql-parser parserImpls.ftl:512, SqlWatermark.java), routed through
  * the injected parser. The clause feeds the [[SystemTimeJoin]] watermark
  * registry, which the temporal-join front-end and the streaming helpers
  * read — the same flow as Flink's catalog watermark spec.
  *
  * Two accepted spellings:
  *
  * 1. The Flink connector-table form (filesystem connector; schema comes
  *    from the files themselves, as with Spark's schema inference):
  *
  *      CREATE TABLE t (
  *        ...column defs (informational)...,
  *        WATERMARK FOR ts AS ts - INTERVAL '5' SECOND
  *      ) WITH ('connector' = 'filesystem', 'path' = '/data/t', 'format' = 'parquet')
  *
  * 2. A view form for deriving a watermarked relation from a query:
  *
  *      CREATE [OR REPLACE] [TEMPORARY] VIEW v
  *        WATERMARK FOR ts AS ts - INTERVAL '5' SECOND
  *      AS SELECT ...
  *
  * Both register the (table → time column, delay) mapping and materialize a
  * temp view; downstream `FOR SYSTEM_TIME AS OF` joins and watermark-driven
  * streaming ops resolve the time attribute from the registry instead of
  * requiring a programmatic declareWatermark call.
  */
object WatermarkDdl {

  /** Dispatch test — caller passes literal/comment-blanked text. LIKE
    * statements route to [[ConnectorTables]] even with a WATERMARK clause
    * (the merge needs both sides' specs). */
  def matches(probe: String): Boolean =
    """(?i)^\s*CREATE\b""".r.findFirstIn(probe).isDefined &&
      """(?i)\bWATERMARK\s+FOR\b""".r.findFirstIn(probe).isDefined &&
      !ConnectorTables.matchesLike(probe)

  private val viewRe =
    """(?is)CREATE\s+(?:OR\s+REPLACE\s+)?(?:TEMPORARY\s+)?VIEW\s+(\w+)\s+WATERMARK\s+FOR\s+(\w+)\s+AS\s+\w+(?:\s*-\s*INTERVAL\s+'(\d+)'\s+(\w+))?\s+AS\s+(.*)""".r
  private val tableRe =
    """(?is)CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?(\w+)\s*\((.*)\)\s*WITH\s*\((.*)\)\s*""".r
  private[sql] val wmRe =
    """(?is)WATERMARK\s+FOR\s+(\w+)\s+AS\s+\w+(?:\s*-\s*INTERVAL\s+'(\d+)'\s+(\w+))?""".r
  private val propRe = """'([^']+)'\s*=\s*'([^']*)'""".r

  private[sql] def delayLiteral(n: String, unit: String): String =
    if (n == null) "0 seconds"
    else {
      val u = unit.toLowerCase // Flink units are singular; Spark durations plural
      s"$n ${if (u.endsWith("s")) u else u + "s"}"
    }

  /** The watermark expression in the reference's catalog serialization
    * (identifiers backquoted) — DESCRIBE's `watermark` column text. */
  private[sql] def exprText(col: String, n: String, unit: String): String =
    if (n == null) s"`$col`"
    else s"`$col` - INTERVAL '$n' ${unit.toUpperCase}"

  def run(spark: SparkSession, sql: String): DataFrame = sql.trim match {
    case viewRe(name, wmCol, n, unit, query) =>
      // the view body parses through the stock path (no WATERMARK clause)
      spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW $name AS $query")
      SystemTimeJoin.declareWatermark(name, wmCol, delayLiteral(n, unit))
      SystemTimeJoin.declareWatermarkExpr(name, exprText(wmCol, n, unit))
      spark.emptyDataFrame
    case tableRe(name, schemaBody, propsBody) =>
      val wm = wmRe.findFirstMatchIn(schemaBody).getOrElse(
        throw new IllegalArgumentException(s"CREATE TABLE $name: WATERMARK FOR clause not found"))
      val props = propRe.findAllMatchIn(propsBody)
        .map(m => m.group(1).toLowerCase -> m.group(2)).toMap
      val path = props.getOrElse("path",
        throw new IllegalArgumentException(s"CREATE TABLE $name: 'path' property required"))
      val fmt = props.getOrElse("format", "parquet")
      // plain column defs are informational — the schema is read from the
      // files, exactly like Spark's own schema inference on the same
      // connector. COMPUTED columns (`col AS expr`, parserImpls.ftl:551)
      // are applied on top in declaration order, so later ones may
      // reference earlier ones — the reference's generated-column flow.
      val computedRe = """(?is)^(\w+)\s+AS\s+(.+)$""".r
      val computedCols = FlinkSqlSupport.splitTop(schemaBody).collect {
        case i if wmRe.findFirstIn(i).isEmpty && computedRe.findFirstMatchIn(i.trim).isDefined =>
          val m = computedRe.findFirstMatchIn(i.trim).get
          (m.group(1), m.group(2).trim)
      }
      val base = computedCols.foldLeft(spark.read.format(fmt).load(path)) {
        case (df, (colName, colExpr)) =>
          df.withColumn(colName, org.apache.spark.sql.functions.expr(colExpr))
      }
      base.createOrReplaceTempView(name)
      // the Tbl metadata (path/format/props/computed columns + the full
      // declared list, PK and metadata columns) lands in the connector
      // registry so CREATE TABLE ... LIKE <this table> can merge its
      // options and inherit its watermark + generated columns, and so
      // DESCRIBE can render the declared schema
      ConnectorTables.registerMeta(spark, name,
        ConnectorTables.Tbl(path, fmt, props, None, Nil, computedCols,
          ConnectorTables.parsePk(schemaBody),
          ConnectorTables.parseMetaCols(schemaBody),
          ConnectorTables.parseDecl(schemaBody)))
      SystemTimeJoin.declareWatermark(name, wm.group(1),
        delayLiteral(wm.group(2), wm.group(3)))
      SystemTimeJoin.declareWatermarkExpr(name,
        exprText(wm.group(1), wm.group(2), wm.group(3)))
      spark.emptyDataFrame
    case _ =>
      throw new IllegalArgumentException(
        "unsupported WATERMARK DDL shape — see WatermarkDdl scaladoc for the two accepted forms")
  }
}
