package graft.sql

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, DataFrameReader, SparkSession}
import org.apache.spark.sql.types.StructType

/** Filesystem connector tables + INSERT INTO — the reference's connector DDL
  * (FileSystemTableSink via `CREATE TABLE ... WITH ('connector'='filesystem',
  * ...)` and StreamExecSink / BatchExecSink planning of `INSERT INTO`).
  *
  * `CREATE TABLE s (...) WITH ('connector'='filesystem','path'=p,
  * 'format'=f)` with NO watermark clause registers a sink; `INSERT INTO s
  * SELECT ...` plans the query with the stock parser and writes it to the
  * table's path in the declared format (append — the filesystem sink's
  * default). After the first insert the table also resolves as a SOURCE
  * (temp view over the written files), mirroring the reference where the
  * same connector table is readable and writable.
  *
  * Round 12 widens the DDL surface to the reference's:
  *   - the declared column list is parsed into a Spark schema and applied to
  *     formats that are not self-describing (csv/json), so a connector table
  *     over csv reads with the DDL types rather than inference;
  *   - format-scoped options (`'csv.field-delimiter' = '|'` etc., the
  *     reference's CsvFormatFactory option surface) map onto the Spark
  *     reader/writer options of the same meaning;
  *   - `CREATE TABLE d WITH (...) LIKE base (INCLUDING ALL | EXCLUDING
  *     OPTIONS | OVERWRITING OPTIONS)` merges the base table's options and
  *     schema per the reference's MergingStrategy semantics
  *     (SqlTableLike.java:104, MergeTableLikeUtil.java:185-206: INCLUDING
  *     duplicates error and point at EXCLUDING/OVERWRITING OPTIONS;
  *     OVERWRITING lets the derived WITH win; EXCLUDING starts empty);
  *   - query-time option overrides for the OPTIONS hint
  *     (see [[OptionsHint]]) read through [[ConnectorTables.read]] with the
  *     hinted map merged over the registered one
  *     (CatalogSourceTable.java:258 `FlinkHints.mergeTableOptions`).
  *
  * Statements whose target is NOT a registered connector sink fall through
  * untouched, so Spark-native INSERT INTO on catalog tables keeps working.
  */
object ConnectorTables {

  private[sql] case class Tbl(
      path: String,
      format: String,
      props: Map[String, String],
      schema: Option[StructType],
      partitions: Seq[String] = Nil)

  /** (session identity, table name) → table; session-keyed so tests with
    * multiple sessions cannot see each other's registrations. */
  private val tables = new ConcurrentHashMap[String, Tbl]()

  private def key(s: SparkSession, name: String) =
    s"${System.identityHashCode(s)}:${name.toLowerCase}"

  // cols are non-greedy so the optional PARTITIONED BY group can match —
  // a greedy (.*) would swallow it and backtrack straight to WITH
  private val createRe =
    """(?is)\s*CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?(\w+)\s*\((.*?)\)\s*(?:PARTITIONED\s+BY\s*\(([^)]*)\)\s*)?WITH\s*\((.*?)\)\s*""".r
  private val likeRe =
    """(?is)\s*CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?(\w+)\s*(?:\((.*)\)\s*)?WITH\s*\((.*?)\)\s*LIKE\s+(\w+)\s*(?:\(\s*(.*?)\s*\))?\s*""".r
  // INSERT INTO|OVERWRITE t [PARTITION (p='v'[, ...])] SELECT ...
  private val insertRe =
    """(?is)\s*INSERT\s+(INTO|OVERWRITE)\s+(?:TABLE\s+)?(\w+)\s*(?:PARTITION\s*\(([^)]*)\)\s*)?(SELECT\s+.*|VALUES\s*\(.*)""".r
  private val propRe = """'([^']+)'\s*=\s*'([^']*)'""".r

  def matchesCreate(probe: String): Boolean =
    """(?i)^\s*CREATE\s+TABLE\b""".r.findFirstIn(probe).isDefined &&
      """(?i)\bWITH\s*\(""".r.findFirstIn(probe).isDefined &&
      """(?i)\bWATERMARK\s+FOR\b""".r.findFirstIn(probe).isEmpty

  def matchesInsert(probe: String): Boolean =
    """(?i)^\s*INSERT\s+(INTO|OVERWRITE)\b""".r.findFirstIn(probe).isDefined

  def matchesAlterOrDrop(probe: String): Boolean =
    """(?i)^\s*(ALTER|DROP)\s+TABLE\b""".r.findFirstIn(probe).isDefined

  private val alterSetRe =
    """(?is)\s*ALTER\s+TABLE\s+(\w+)\s+SET\s*\((.*)\)\s*""".r
  private val alterRenameRe =
    """(?is)\s*ALTER\s+TABLE\s+(\w+)\s+RENAME\s+TO\s+(\w+)\s*""".r
  private val dropRe =
    """(?is)\s*DROP\s+TABLE\s+(?:IF\s+EXISTS\s+)?(\w+)\s*""".r

  /** ALTER TABLE ... SET (props) / RENAME TO / DROP TABLE on registered
    * connector tables (SqlAlterTableProperties.java:33,
    * SqlAlterTableRename.java, SqlDropTable.java). SET merges the new
    * props over the registration (the reference replaces matching keys);
    * statements naming a non-connector table return None and fall through
    * to Spark's own DDL. */
  def tryAlterOrDrop(spark: SparkSession, sql: String): Option[DataFrame] = sql match {
    case alterSetRe(name, propsBody) =>
      lookup(spark, name).map { tbl =>
        val newProps = propRe.findAllMatchIn(propsBody)
          .map(m => m.group(1).toLowerCase -> m.group(2)).toMap
        val merged = tbl.props ++ newProps
        register(spark, name, Tbl(merged.getOrElse("path", tbl.path),
          merged.getOrElse("format", tbl.format), merged, tbl.schema, tbl.partitions))
      }
    case alterRenameRe(name, newName) =>
      lookup(spark, name).map { tbl =>
        tables.remove(key(spark, name))
        spark.catalog.dropTempView(name)
        register(spark, newName, tbl)
      }
    case dropRe(name) =>
      lookup(spark, name).map { _ =>
        tables.remove(key(spark, name))
        spark.catalog.dropTempView(name)
        spark.emptyDataFrame
      }
    case _ => None
  }

  /** The registered table, if `name` is a connector table of this session. */
  private[sql] def lookup(spark: SparkSession, name: String): Option[Tbl] =
    Option(tables.get(key(spark, name)))

  /** Flink DDL column list → Spark schema. Computed columns, PRIMARY KEY
    * constraints and metadata columns are not part of the physical read
    * schema; types map per FlinkTypeFactory (VARCHAR/CHAR → STRING,
    * TIMESTAMP(p) → TIMESTAMP, BYTES → BINARY). Returns None when the list
    * does not parse — self-describing formats never need it. */
  private[sql] def parseSchema(colsDdl: String): Option[StructType] = {
    val cols = splitTop(colsDdl).filterNot { c =>
      val u = c.trim.toUpperCase
      u.startsWith("PRIMARY KEY") || u.startsWith("CONSTRAINT") || u.contains(" AS ")
    }
    if (cols.isEmpty) return None
    val cleaned = cols.map { c =>
      c.trim
        .replaceAll("(?i)\\s+NOT\\s+NULL", "")
        .replaceAll("(?i)\\bTIMESTAMP\\s*\\(\\d+\\)", "TIMESTAMP")
        .replaceAll("(?i)\\bVARCHAR\\s*\\(\\d+\\)", "STRING")
        .replaceAll("(?i)\\bCHAR\\s*\\(\\d+\\)", "STRING")
        .replaceAll("(?i)\\bBYTES\\b", "BINARY")
    }
    try Some(StructType.fromDDL(cleaned.mkString(", ")))
    catch { case _: Exception => None }
  }

  /** Split a column list on top-level commas (ignores commas inside
    * parens like DECIMAL(10,2) and inside quoted strings). */
  private def splitTop(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0; var start = 0; var inStr = false
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '\'' => inStr = !inStr
        case '(' | '<' if !inStr => depth += 1
        case ')' | '>' if !inStr => depth -= 1
        case ',' if depth == 0 && !inStr =>
          out += s.substring(start, i); start = i + 1
        case _ =>
      }
      i += 1
    }
    out += s.substring(start)
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  /** `'csv.field-delimiter'` → Spark csv reader/writer option `sep`, etc. —
    * the reference's CsvFormatFactory option names mapped to Spark's. Keys
    * of other formats (or unknown csv keys) pass through verbatim minus the
    * `<format>.` prefix, which matches Spark's parquet/orc/json options. */
  private val csvOptionMap = Map(
    "field-delimiter" -> "sep",
    "quote-character" -> "quote",
    "escape-character" -> "escape",
    "null-literal" -> "nullValue",
    "ignore-parse-errors" -> "mode")

  private[sql] def readerOptions(format: String, props: Map[String, String]): Map[String, String] = {
    val prefix = format.toLowerCase + "."
    props.collect { case (k, v) if k.startsWith(prefix) =>
      val bare = k.stripPrefix(prefix)
      if (format.equalsIgnoreCase("csv")) {
        val mapped = csvOptionMap.getOrElse(bare, bare)
        if (bare == "ignore-parse-errors")
          mapped -> (if (v.equalsIgnoreCase("true")) "DROPMALFORMED" else "FAILFAST")
        else mapped -> v
      } else bare -> v
    }
  }

  /** CDC changelog formats (flink-formats/flink-json): reading decodes the
    * line-JSON change messages into the repo's changelog shape — a `kind`
    * column ('+I'/'-U'/'+U'/'-D') followed by the declared columns. The
    * reference hides RowKind inside RowData; Spark rows have no kind slot,
    * so the explicit column is the documented mapping (the convention
    * streaming/Changelog.scala uses throughout). */
  private val cdcFmts = Set("debezium-json", "canal-json", "maxwell-json")

  private def cdcRead(spark: SparkSession, fmt: String, path: String,
      schema: StructType, props: Map[String, String]): DataFrame = {
    val raw = spark.read.text(path).toDF("value")
    val ignore = props.get(s"$fmt.ignore-parse-errors").exists(_.equalsIgnoreCase("true"))
    fmt match {
      case "debezium-json" => graft.sources.CdcFormats.debeziumJson(raw, "value", schema,
        ignoreParseErrors = ignore,
        schemaInclude = props.get("debezium-json.schema-include").exists(_.equalsIgnoreCase("true")))
      case "canal-json" => graft.sources.CdcFormats.canalJson(raw, "value", schema,
        ignoreParseErrors = ignore, database = props.get("canal-json.database.include"))
      case "maxwell-json" => graft.sources.CdcFormats.maxwellJson(raw, "value", schema,
        ignoreParseErrors = ignore)
    }
  }

  /** Build the reader for a registered table, `overrides` merged OVER the
    * registered options (the OPTIONS-hint merge, CatalogSourceTable.java:258).
    * The declared schema applies to non-self-describing formats. */
  private[sql] def read(spark: SparkSession, tbl: Tbl,
      overrides: Map[String, String] = Map.empty): DataFrame = {
    val props = tbl.props ++ overrides
    val fmt = props.getOrElse("format", tbl.format)
    val path = props.getOrElse("path", tbl.path)
    if (cdcFmts(fmt.toLowerCase)) {
      val schema = tbl.schema.getOrElse(throw new IllegalArgumentException(
        s"format '$fmt' requires a declared column list"))
      return cdcRead(spark, fmt.toLowerCase, path, schema, props)
    }
    var r: DataFrameReader = spark.read.format(fmt).options(readerOptions(fmt, props))
    if (fmt.equalsIgnoreCase("csv") || fmt.equalsIgnoreCase("json"))
      // partition columns live in the directory layout, not the files —
      // they come back via Spark's partition discovery
      tbl.schema.map(sc => StructType(sc.filterNot(f => tbl.partitions.contains(f.name))))
        .foreach(sc => r = r.schema(sc))
    val df = r.load(path)
    // partition discovery infers partition-col types; cast back to the DDL
    // types and restore the declared column order
    tbl.schema.filter(_ => tbl.partitions.nonEmpty).fold(df) { sc =>
      df.select(sc.fieldNames.toSeq.map(n =>
        org.apache.spark.sql.functions.col(n)
          .cast(sc(n).dataType).as(n)): _*)
    }
  }

  private def register(spark: SparkSession, name: String, tbl: Tbl): DataFrame = {
    tables.put(key(spark, name), tbl)
    // pre-existing data → the table is immediately readable too (an empty
    // directory is NOT data — self-describing formats can't infer from it)
    val f = new java.io.File(tbl.path)
    val hasData = f.isFile ||
      (f.isDirectory && Option(f.listFiles).exists(_.exists(c => !c.getName.startsWith("_"))))
    if (hasData) read(spark, tbl).createOrReplaceTempView(name)
    spark.emptyDataFrame
  }

  def runCreate(spark: SparkSession, sql: String): DataFrame = sql match {
    case likeRe(name, colsOpt, propsBody, baseName, likeOptsOpt) =>
      val base = lookup(spark, baseName).getOrElse(throw new IllegalArgumentException(
        s"CREATE TABLE $name LIKE $baseName: base table is not a registered connector table"))
      val derived = propRe.findAllMatchIn(propsBody)
        .map(m => m.group(1).toLowerCase -> m.group(2)).toMap
      // MergingStrategy for OPTIONS (SqlTableLike.java:104): default INCLUDING
      val strategy = Option(likeOptsOpt).map(_.toUpperCase.trim).getOrElse("") match {
        case s if s.contains("EXCLUDING OPTIONS") || s.contains("EXCLUDING ALL") => "EXCLUDING"
        case s if s.contains("OVERWRITING OPTIONS") => "OVERWRITING"
        case _ => "INCLUDING"
      }
      val merged = scala.collection.mutable.LinkedHashMap[String, String]()
      if (strategy != "EXCLUDING") merged ++= base.props
      derived.foreach { case (k, v) =>
        if (strategy != "OVERWRITING" && merged.contains(k))
          // MergeTableLikeUtil.java:196 — same guidance as the reference
          throw new IllegalArgumentException(
            s"There already exists an option ['$k' -> '${merged(k)}'] in the base table. " +
              "You might want to specify EXCLUDING OPTIONS or OVERWRITING OPTIONS.")
        merged(k) = v
      }
      val props = merged.toMap
      val schema = Option(colsOpt).flatMap(parseSchema).orElse(base.schema)
      val path = props.getOrElse("path", throw new IllegalArgumentException(
        s"CREATE TABLE $name LIKE $baseName: no 'path' after option merge"))
      // partitions inherit (the reference's FeatureOption.PARTITIONS
      // defaults to INCLUDING, SqlTableLike.java:190)
      register(spark, name,
        Tbl(path, props.getOrElse("format", "parquet"), props, schema, base.partitions))
    case createRe(name, cols, partCols, propsBody) =>
      val props = propRe.findAllMatchIn(propsBody)
        .map(m => m.group(1).toLowerCase -> m.group(2)).toMap
      require(props.get("connector").forall(_ == "filesystem"),
        s"CREATE TABLE $name: only the filesystem connector is supported, " +
          s"got ${props.get("connector")}")
      val path = props.getOrElse("path",
        throw new IllegalArgumentException(s"CREATE TABLE $name: 'path' property required"))
      val fmt = props.getOrElse("format", "parquet")
      // PARTITIONED BY columns must be part of the declared schema (the
      // reference's SqlCreateTable validates the same); they become the
      // col=value directory layout on write
      val parts = Option(partCols).map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
        .getOrElse(Nil)
      register(spark, name, Tbl(path, fmt, props, parseSchema(cols), parts))
    case _ => throw new IllegalArgumentException("unsupported connector CREATE TABLE shape")
  }

  /** Some(empty DF) if the target is a registered connector sink; None →
    * not ours, let the stock parser plan the INSERT. */
  def tryInsert(spark: SparkSession, sql: String): Option[DataFrame] = sql match {
    case insertRe(mode, name, staticPart, query) =>
      lookup(spark, name).map { tbl =>
        var df = spark.sql(query)
        // static PARTITION (p='v') clause: the literals append as columns
        // (the reference converts them to a constant partition writer)
        Option(staticPart).foreach { sp =>
          """(\w+)\s*=\s*'([^']*)'""".r.findAllMatchIn(sp).foreach { m =>
            val declared = tbl.schema.map(_.apply(m.group(1)).dataType)
            val c = org.apache.spark.sql.functions.lit(m.group(2))
            df = df.withColumn(m.group(1),
              declared.fold(c)(t => c.cast(t)))
          }
        }
        val overwrite = mode.equalsIgnoreCase("OVERWRITE")
        if (cdcFmts(tbl.format.toLowerCase)) {
          // changelog sink: the query yields (kind, <cols>) rows, encoded
          // with the reference's (lossy) serialization schema of the format
          val encoded = tbl.format.toLowerCase match {
            case "debezium-json" => graft.sources.CdcFormats.toDebeziumJson(df)
            case "canal-json" => graft.sources.CdcFormats.toCanalJson(df)
            case "maxwell-json" => graft.sources.CdcFormats.toMaxwellJson(df)
          }
          encoded.write.mode(if (overwrite) "overwrite" else "append").text(tbl.path)
        } else {
          val writerOpts = readerOptions(tbl.format, tbl.props) - "mode"
          var w = df.write.format(tbl.format).options(writerOpts)
            .mode(if (overwrite) "overwrite" else "append")
          if (tbl.partitions.nonEmpty) {
            w = w.partitionBy(tbl.partitions: _*)
            // the reference's PartitionLoader overwrites ONLY the partitions
            // present in the written data (FileSystemCommitter.java:97) —
            // Spark's dynamic partitionOverwriteMode is the same contract
            if (overwrite) w = w.option("partitionOverwriteMode", "dynamic")
          }
          w.save(tbl.path)
        }
        // refresh the readable view over the now-written files
        read(spark, tbl).createOrReplaceTempView(name)
        spark.emptyDataFrame
      }
    case _ => None
  }
}
