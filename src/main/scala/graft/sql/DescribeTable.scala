package graft.sql

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** `DESCRIBE <table>` with the reference's six-column result
  * (TableEnvironmentImpl.buildDescribeResult,
  * flink-table-api-java/.../TableEnvironmentImpl.java:1098-1130):
  *
  *   (name STRING, type STRING, null BOOLEAN, key STRING, extras STRING,
  *    watermark STRING)
  *
  * one row per declared column in declaration order, where `key` renders
  * `PRI(a, b)` on every primary-key column, `extras` renders a computed
  * column's `AS <expr>` or a metadata column's `METADATA [FROM 'key']
  * [VIRTUAL]` (TableColumn.explainExtras, TableColumn.java:185-305), and
  * `watermark` carries the watermark expression on its rowtime column
  * (WatermarkSpec.getWatermarkExpr).
  *
  * Scope: REGISTERED CONNECTOR TABLES only — they are the tables whose DDL
  * declared Flink-dialect schema metadata worth rendering. DESCRIBE on any
  * other relation falls through to Spark's native statement (its 3-column
  * result), exactly like the other connector front-ends.
  *
  * Types render as the DECLARED type text normalized to the reference's
  * summary form. A computed column's type (derived, not declared) resolves
  * from the table's readable view when one exists, else by folding the
  * generated-column expressions over an empty frame of the physical schema
  * — driver-only schema analysis, no job runs.
  */
object DescribeTable {

  // DESCRIBE [EXTENDED] [[cat.]db.]t — SqlRichDescribeTable's grammar
  // (parserImpls.ftl:93-108); 1.12's buildDescribeResult ignores the
  // EXTENDED flag, so both spellings yield the same six-column result
  private val re = """(?is)^\s*DESC(?:RIBE)?\s+(?:EXTENDED\s+)?((?:\w+\.)?\w+)\s*;?\s*$""".r

  /** Dispatch test — only DESCRIBE over a registered connector table. */
  def matches(spark: SparkSession, probe: String): Boolean = probe match {
    case re(name) => ConnectorTables.lookup(spark, name).isDefined
    case _ => false
  }

  /** Spark type → the reference's LogicalType summary rendering
    * (asSummaryString of the nullable copy — NOT NULL never shows in the
    * type text; nullability is the dedicated `null` column). */
  private[sql] def flinkTypeText(dt: DataType): String = dt match {
    case StringType => "STRING"
    case LongType => "BIGINT"
    case IntegerType => "INT"
    case ShortType => "SMALLINT"
    case ByteType => "TINYINT"
    case DoubleType => "DOUBLE"
    case FloatType => "FLOAT"
    case BooleanType => "BOOLEAN"
    case DateType => "DATE"
    // Spark timestamps are microsecond-precision → TIMESTAMP(6)
    case TimestampType | TimestampNTZType => "TIMESTAMP(6)"
    case BinaryType => "BYTES"
    case d: DecimalType => s"DECIMAL(${d.precision}, ${d.scale})"
    case a: ArrayType => s"ARRAY<${flinkTypeText(a.elementType)}>"
    case m: MapType => s"MAP<${flinkTypeText(m.keyType)}, ${flinkTypeText(m.valueType)}>"
    case s: StructType =>
      s"ROW<${s.fields.map(f => s"`${f.name}` ${flinkTypeText(f.dataType)}").mkString(", ")}>"
    case other => other.sql
  }

  def run(spark: SparkSession, sql: String): DataFrame = {
    val name = sql match { case re(n) => n }
    val tbl = ConnectorTables.lookup(spark, name).getOrElse(
      throw new IllegalArgumentException(
        s"Tables or views with the identifier '$name' doesn't exist"))

    // declaration-order column list; reconstructed from the readable view
    // for tables registered without one (schema inferred from files)
    val decl: Seq[ConnectorTables.DeclCol] =
      if (tbl.decl.nonEmpty) tbl.decl
      else {
        val view = ConnectorTables.viewName(name)
        val resolved =
          if (spark.catalog.tableExists(view)) spark.table(view).schema
          else ConnectorTables.read(spark, tbl).schema
        val compNames = tbl.computed.map(_._1.toLowerCase).toSet
        val metaNames = tbl.metaCols.map(_.name.toLowerCase).toSet
        resolved.fields.toSeq
          .filterNot(f => compNames(f.name.toLowerCase) || metaNames(f.name.toLowerCase))
          .map(f => ConnectorTables.PhysCol(f.name, flinkTypeText(f.dataType), f.nullable)) ++
          tbl.computed.map { case (n, e) => ConnectorTables.CompCol(n, e) } ++
          tbl.metaCols
      }

    // computed-column types: from the readable view when it exists, else
    // from an empty-frame resolution over the physical schema
    lazy val resolvedTypes: Map[String, DataType] = {
      val view = ConnectorTables.viewName(name)
      val schema =
        if (spark.catalog.tableExists(view)) Some(spark.table(view).schema)
        else tbl.schema.map { phys =>
          val empty = spark.createDataFrame(
            spark.sparkContext.emptyRDD[Row], phys)
          tbl.computed.foldLeft(empty) { case (d, (n, e)) =>
            d.withColumn(n, org.apache.spark.sql.functions.expr(e)) }.schema
        }
      schema.map(_.fields.map(f => f.name.toLowerCase -> f.dataType).toMap)
        .getOrElse(Map.empty)
    }
    def computedType(n: String): String =
      resolvedTypes.get(n.toLowerCase).map(flinkTypeText).getOrElse("STRING")

    val pkCols = tbl.pk.map(_._2).getOrElse(Nil)
    val pkText = s"PRI(${pkCols.mkString(", ")})"
    def keyFor(n: String): String =
      if (pkCols.exists(_.equalsIgnoreCase(n))) pkText else null
    val wmCol = SystemTimeJoin.watermarkOf(name).map(_._1)
    val wmText = SystemTimeJoin.watermarkExprOf(name)
    def wmFor(n: String): String =
      if (wmCol.exists(_.equalsIgnoreCase(n)))
        wmText.getOrElse(s"`${wmCol.get}`")
      else null

    val rows = decl.map {
      case ConnectorTables.PhysCol(n, t, nullable) =>
        Row(n, t, nullable, keyFor(n), null, wmFor(n))
      case ConnectorTables.CompCol(n, e) =>
        Row(n, computedType(n), true, keyFor(n), s"AS $e", wmFor(n))
      case m: ConnectorTables.MetaCol =>
        val extras = "METADATA" +
          (if (m.explicitFrom) s" FROM '${m.key}'" else "") +
          (if (m.virtual) " VIRTUAL" else "")
        Row(m.name, m.typeText, true, keyFor(m.name), extras, wmFor(m.name))
    }
    val schema = StructType(Seq(
      StructField("name", StringType, nullable = false),
      StructField("type", StringType, nullable = false),
      StructField("null", BooleanType, nullable = false),
      StructField("key", StringType),
      StructField("extras", StringType),
      StructField("watermark", StringType)))
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      schema)
  }
}
