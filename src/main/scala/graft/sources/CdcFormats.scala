package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CDC changelog formats — debezium-json / canal-json / maxwell-json
  * (reference: flink-formats/flink-json, the three format factories the
  * 1.12 connector DDL accepts for changelog sources/sinks).
  *
  * Decoders turn a column of raw JSON change messages into the repo's
  * changelog shape — a `kind` column ('+I'/'-U'/'+U'/'-D', the RowKind
  * analogue used by streaming/Changelog.scala) followed by the declared
  * physical columns — with the reference's exact op semantics:
  *
  *   - debezium (DebeziumJsonDeserializationSchema.java:60-160): envelope
  *     {before, after, op} (optionally under `payload` when
  *     'debezium-json.schema-include' = true); op c/r → +I(after),
  *     u → -U(before) +U(after), d → -D(before); UPDATE/DELETE with a null
  *     `before` raise the REPLICA_IDENTITY error; unknown op / corrupt
  *     message raise unless ignore-parse-errors.
  *   - canal (CanalJsonDeserializationSchema.java:176-236): envelope
  *     {data: [...], old: [...], type, database}; INSERT → +I per data
  *     element, UPDATE → per-element -U/+U where null fields of old[i]
  *     (unchanged columns) are BACKFILLED from data[i], DELETE → -D per
  *     element, CREATE (DDL) → skipped; optional database filter drops
  *     non-matching messages.
  *   - maxwell (MaxwellJsonDeserializationSchema.java:96-125): single-row
  *     {data, old, type}; insert → +I(data), update → -U(backfilled old)
  *     +U(data), delete → -D(data).
  *
  * Encoders mirror the reference's serialization schemas — the documented
  * LOSSY kind mapping (DebeziumJsonSerializationSchema.java:73-87:
  * +I/+U → op 'c' with after only, -U/-D → op 'd' with before only;
  * canal/maxwell rowKind2String likewise fold the four kinds onto
  * INSERT/DELETE // insert/delete).
  *
  * Everything is native column expressions (from_json/to_json, transform /
  * zip_with / flatten, explode) — per-partition streaming decode with no
  * shuffle; at 100 TB the decode cost is the JSON parse itself, inside
  * whole-stage codegen's pipeline.
  */
object CdcFormats {

  private val Kinds = Seq("+I", "-U", "+U", "-D")

  /** struct(kind, row) singleton array — the explode unit. */
  private def one(kind: String, row: Column): Column =
    array(struct(lit(kind).as("kind"), row.as("row")))

  /** null fields of `before` are unchanged columns → copy from `after`
    * (CanalJsonDeserializationSchema.java:206-213). */
  private def backfill(before: Column, after: Column, schema: StructType): Column =
    struct(schema.fields.toSeq.map(f =>
      coalesce(before.getField(f.name), after.getField(f.name)).as(f.name)): _*)

  private def err(msg: Column): Column = raise_error(msg).cast(StringType)

  private def finish(exploded: DataFrame, schema: StructType): DataFrame =
    exploded.select((col("e.kind").as("kind") +:
      schema.fields.toSeq.map(f => col(s"e.row.${f.name}").as(f.name))) ++
      exploded.columns.filter(_.startsWith("__meta_")).toSeq.map(col): _*)

  /** The format's readable metadata (FLIP-107;
    * DebeziumJsonDecodingFormat.ReadableMetadata:137-243): key → the column
    * expression over the parsed envelope `p` (payload fields) and the
    * top-level parse `m` (the `schema` string lives OUTSIDE payload —
    * isJsonPayload=false in the reference). */
  val DebeziumMetadataKeys: Seq[String] = Seq(
    "schema", "ingestion-timestamp", "source.timestamp",
    "source.database", "source.schema", "source.table", "source.properties")

  private def debeziumMetaExpr(key: String, p: Column, topSchema: Column): Column = key match {
    case "schema" => topSchema
    case "ingestion-timestamp" =>
      when(p.getField("ts_ms").isNotNull, timestamp_millis(p.getField("ts_ms")))
    case "source.timestamp" =>
      when(element_at(p.getField("source"), "ts_ms").isNotNull,
        timestamp_millis(element_at(p.getField("source"), "ts_ms").cast("long")))
    case "source.database" => element_at(p.getField("source"), "db")
    case "source.schema" => element_at(p.getField("source"), "schema")
    case "source.table" => element_at(p.getField("source"), "table")
    case "source.properties" => p.getField("source")
    case other => throw new IllegalArgumentException(
      s"Invalid metadata key '$other'. The debezium-json format supports: " +
        DebeziumMetadataKeys.mkString(", "))
  }

  /** Decode debezium-json messages in `jsonCol` into a changelog frame
    * `(kind, <schema>[, <metadata>])`. `schemaInclude` mirrors
    * 'debezium-json.schema-include' (envelope nested under `payload`);
    * `metadata` appends the requested readable-metadata keys as trailing
    * columns named by key, after the physical columns — the reference's
    * appendRowFields order (DebeziumJsonDecodingFormat.java:88-94).
    * `metadataNames` (when non-empty, same length as `metadata`) names the
    * appended columns POSITIONALLY — the DDL's declared column names. The
    * positional alias is what keeps a physical column that happens to share
    * a key's name (e.g. a column literally called `schema`), or two METADATA
    * columns reading the SAME key, unambiguous: nothing is renamed after the
    * fact, each requested key lands directly under its declared name. */
  def debeziumJson(df: DataFrame, jsonCol: String, schema: StructType,
      ignoreParseErrors: Boolean = false, schemaInclude: Boolean = false,
      metadata: Seq[String] = Nil, metadataNames: Seq[String] = Nil): DataFrame = {
    require(metadataNames.isEmpty || metadataNames.size == metadata.size,
      "metadataNames must be empty or align 1:1 with metadata keys")
    metadata.foreach { k =>
      if (!DebeziumMetadataKeys.contains(k))
        throw new IllegalArgumentException(
          s"Invalid metadata key '$k'. The debezium-json format supports: " +
            DebeziumMetadataKeys.mkString(", "))
    }
    val needMeta = metadata.nonEmpty
    val env = StructType(Seq(
      StructField("before", schema), StructField("after", schema),
      StructField("op", StringType)) ++ (if (needMeta) Seq(
      StructField("ts_ms", LongType),
      StructField("source", MapType(StringType, StringType))) else Nil))
    val full =
      if (schemaInclude) StructType(
        StructField("payload", env) +:
          (if (needMeta) Seq(StructField("schema", StringType)) else Nil))
      else if (needMeta && metadata.contains("schema"))
        StructType(env.fields :+ StructField("schema", StringType))
      else env
    // null/empty messages are Kafka tombstones — skipped BEFORE parsing,
    // unconditionally, even with ignore-parse-errors off
    // (DebeziumJsonDeserializationSchema.java:122-125; canal/maxwell have
    // no such skip — their empty message is a corrupt one)
    val nonTombstone = df.filter(col(jsonCol).isNotNull && length(col(jsonCol)) > 0)
    val parsed0 = nonTombstone.select(from_json(col(jsonCol), full).as("m"), col(jsonCol).as("_raw"))
    val p = if (schemaInclude) col("m.payload") else col("m")
    // metadata values bind here, where both the top-level parse (`schema`
    // lives OUTSIDE payload) and the envelope are in scope; they ride along
    // the pipeline as positional columns and surface named by key
    val metaVals = metadata.zipWithIndex.map { case (k, i) =>
      debeziumMetaExpr(k, p, col("m.schema")).as(s"__meta_$i") }
    val parsed = parsed0.select(p.as("p") +: col("_raw") +: metaVals: _*)
    val corrupt = col("p").isNull || col("p.op").isNull
    val unknownOp = !col("p.op").isin("c", "r", "u", "d")
    val nullBefore = col("p.op").isin("u", "d") && col("p.before").isNull
    val checked =
      if (ignoreParseErrors) parsed.filter(!corrupt && !unknownOp && !nullBefore)
      else parsed.withColumn("op",
        when(corrupt, err(concat(lit("Corrupt Debezium JSON message '"), col("_raw"), lit("'."))))
          .when(unknownOp, err(concat(lit("Unknown \"op\" value \""), col("p.op"),
            lit("\". The Debezium JSON message is '"), col("_raw"), lit("'"))))
          // DebeziumJsonDeserializationSchema.REPLICA_IDENTITY_EXCEPTION
          .when(nullBefore, err(concat(lit("The \"before\" field of "),
            when(col("p.op") === "u", lit("UPDATE")).otherwise(lit("DELETE")),
            lit(" message is null, if you are using Debezium Postgres Connector, " +
              "please check the Postgres table has been set REPLICA IDENTITY to FULL level."))))
          .otherwise(col("p.op")))
    val opCol = if (ignoreParseErrors) col("p.op") else col("op")
    val ops = when(opCol.isin("c", "r"), one("+I", col("p.after")))
      .when(opCol === "u", concat(one("-U", col("p.before")), one("+U", col("p.after"))))
      .when(opCol === "d", one("-D", col("p.before")))
    val exploded = checked.select(explode(ops).as("e") +:
      metadata.indices.map(i => col(s"__meta_$i")): _*)
    val out = finish(exploded, schema)
    val names = if (metadataNames.nonEmpty) metadataNames else metadata
    if (!needMeta) out
    else out.select(out.columns.filterNot(_.startsWith("__meta_")).map(col).toSeq ++
      names.zipWithIndex.map { case (n, i) => col(s"__meta_$i").as(n) }: _*)
  }

  /** Decode canal-json messages. `database` mirrors 'canal-json.database
    * .include' — messages from other databases are skipped. */
  def canalJson(df: DataFrame, jsonCol: String, schema: StructType,
      ignoreParseErrors: Boolean = false, database: Option[String] = None): DataFrame = {
    val env = StructType(Seq(
      StructField("data", ArrayType(schema)), StructField("old", ArrayType(schema)),
      StructField("type", StringType), StructField("database", StringType)))
    val parsed0 = df.select(from_json(col(jsonCol), env).as("p"), col(jsonCol).as("_raw"))
    // the database filter skips silently in the reference regardless of
    // ignore-parse-errors (CanalJsonDeserializationSchema.java:176-186)
    val parsed = database.fold(parsed0)(db => parsed0.filter(col("p.database") === db))
    // an UPDATE without its old values is a corrupt message in the
    // reference (old.getRow(i) NPEs into the corrupt-message path); so is
    // a DML message with a null data array (data.size() NPEs the same way,
    // CanalJsonDeserializationSchema.java:188-236) — without this the
    // explode-of-null would silently drop the message instead
    val corrupt = col("p").isNull || col("p.type").isNull ||
      (col("p.type") === "UPDATE" && col("p.old").isNull) ||
      (col("p.type").isin("INSERT", "UPDATE", "DELETE") && col("p.data").isNull)
    val unknownTy = !col("p.type").isin("INSERT", "UPDATE", "DELETE", "CREATE")
    val checked =
      if (ignoreParseErrors) parsed.filter(!corrupt && !unknownTy)
      else parsed.withColumn("ty",
        when(corrupt, err(concat(lit("Corrupt Canal JSON message '"), col("_raw"), lit("'."))))
          .when(unknownTy, err(concat(lit("Unknown \"type\" value \""), col("p.type"),
            lit("\". The Canal JSON message is '"), col("_raw"), lit("'"))))
          .otherwise(col("p.type")))
    val ty = if (ignoreParseErrors) col("p.type") else col("ty")
    val ops = when(ty === "INSERT",
        transform(col("p.data"), a => struct(lit("+I").as("kind"), a.as("row"))))
      .when(ty === "UPDATE",
        flatten(zip_with(col("p.data"), col("p.old"), (a, o) =>
          concat(one("-U", backfill(o, a, schema)), one("+U", a)))))
      .when(ty === "DELETE",
        transform(col("p.data"), a => struct(lit("-D").as("kind"), a.as("row"))))
      // CREATE is a DDL event — skipped (explode of an empty array)
      .otherwise(array().cast(ArrayType(StructType(Seq(
        StructField("kind", StringType), StructField("row", schema))))))
    finish(checked.select(explode(ops).as("e")), schema)
  }

  /** Decode maxwell-json messages (single-row data/old envelope). */
  def maxwellJson(df: DataFrame, jsonCol: String, schema: StructType,
      ignoreParseErrors: Boolean = false): DataFrame = {
    val env = StructType(Seq(
      StructField("data", schema), StructField("old", schema),
      StructField("type", StringType)))
    val parsed = df.select(from_json(col(jsonCol), env).as("p"), col(jsonCol).as("_raw"))
    // update without old values NPEs into the reference's corrupt path;
    // likewise a DML message with a null data row
    // (MaxwellJsonDeserializationSchema.java:96-125)
    val corrupt = col("p").isNull || col("p.type").isNull ||
      (col("p.type") === "update" && col("p.old").isNull) ||
      (col("p.type").isin("insert", "update", "delete") && col("p.data").isNull)
    val unknownTy = !col("p.type").isin("insert", "update", "delete")
    val checked =
      if (ignoreParseErrors) parsed.filter(!corrupt && !unknownTy)
      else parsed.withColumn("ty",
        when(corrupt, err(concat(lit("Corrupt Maxwell JSON message '"), col("_raw"), lit("'."))))
          .when(unknownTy, err(concat(lit("Unknown \"type\" value \""), col("p.type"),
            lit("\". The Maxwell JSON message is '"), col("_raw"), lit("'"))))
          .otherwise(col("p.type")))
    val ty = if (ignoreParseErrors) col("p.type") else col("ty")
    val ops = when(ty === "insert", one("+I", col("p.data")))
      .when(ty === "update",
        concat(one("-U", backfill(col("p.old"), col("p.data"), schema)),
          one("+U", col("p.data"))))
      .when(ty === "delete", one("-D", col("p.data")))
    finish(checked.select(explode(ops).as("e")), schema)
  }

  // ---- encoders (the reference's LOSSY kind folding) ----

  private def requireKind(kindCol: Column): Column =
    when(kindCol.isin(Kinds: _*), kindCol)
      .otherwise(err(concat(lit("Unsupported operation '"), kindCol, lit("' for row kind."))))

  private def physStruct(df: DataFrame, kindName: String): Column =
    struct(df.columns.filter(_ != kindName).toSeq.map(col): _*)

  /** Changelog frame `(kind, <cols>)` → debezium-json strings in `value`:
    * +I/+U → {before: null, after: row, op: 'c'}; -U/-D → {before: row,
    * after: null, op: 'd'} (DebeziumJsonSerializationSchema.java:73-87). */
  def toDebeziumJson(df: DataFrame, kindCol: String = "kind"): DataFrame = {
    val k = requireKind(col(kindCol))
    val row = physStruct(df, kindCol)
    val ins = k.isin("+I", "+U")
    df.select(to_json(struct(
      when(!ins, row).as("before"),
      when(ins, row).as("after"),
      when(ins, lit("c")).otherwise(lit("d")).as("op"))).as("value"))
  }

  /** `(kind, <cols>)` → canal-json `{data: [row], type: INSERT|DELETE}`. */
  def toCanalJson(df: DataFrame, kindCol: String = "kind"): DataFrame = {
    val k = requireKind(col(kindCol))
    df.select(to_json(struct(
      array(physStruct(df, kindCol)).as("data"),
      when(k.isin("+I", "+U"), lit("INSERT")).otherwise(lit("DELETE")).as("type")))
      .as("value"))
  }

  /** `(kind, <cols>)` → maxwell-json `{data: row, type: insert|delete}`. */
  def toMaxwellJson(df: DataFrame, kindCol: String = "kind"): DataFrame = {
    val k = requireKind(col(kindCol))
    df.select(to_json(struct(
      physStruct(df, kindCol).as("data"),
      when(k.isin("+I", "+U"), lit("insert")).otherwise(lit("delete")).as("type")))
      .as("value"))
  }
}
