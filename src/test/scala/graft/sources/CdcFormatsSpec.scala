package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.types._

/** CDC changelog formats — decode/encode semantics pinned against the
  * reference's SerDe behavior (DebeziumJsonDeserializationSchema.java:60-160,
  * CanalJsonDeserializationSchema.java:176-236,
  * MaxwellJsonDeserializationSchema.java:96-125, and the three
  * *SerializationSchema kind foldings). JSON fixtures here are hand-written
  * minimal messages, not the reference's test resources. */
class CdcFormatsSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType),
    StructField("weight", DoubleType)))

  private def df(msgs: String*) = {
    val s = spark
    import s.implicits._
    msgs.toDF("value")
  }

  private def collectKinds(out: org.apache.spark.sql.DataFrame) =
    out.collect().map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getDouble(3))).toSeq

  test("debezium: c/r/u/d ops map to +I / +I / -U+U / -D") {
    val out = CdcFormats.debeziumJson(df(
      """{"before":null,"after":{"id":1,"name":"scooter","weight":5.2},"op":"c"}""",
      """{"before":null,"after":{"id":2,"name":"lamp","weight":0.5},"op":"r"}""",
      """{"before":{"id":1,"name":"scooter","weight":5.2},"after":{"id":1,"name":"scooter","weight":5.5},"op":"u"}""",
      """{"before":{"id":2,"name":"lamp","weight":0.5},"after":null,"op":"d"}"""),
      "value", schema)
    assert(collectKinds(out) == Seq(
      ("+I", 1L, "scooter", 5.2), ("+I", 2L, "lamp", 0.5),
      ("-U", 1L, "scooter", 5.2), ("+U", 1L, "scooter", 5.5),
      ("-D", 2L, "lamp", 0.5)))
  }

  test("debezium: schema-include nests the envelope under payload") {
    val out = CdcFormats.debeziumJson(df(
      """{"schema":{},"payload":{"before":null,"after":{"id":7,"name":"x","weight":1.0},"op":"c"}}"""),
      "value", schema, schemaInclude = true)
    assert(collectKinds(out) == Seq(("+I", 7L, "x", 1.0)))
  }

  test("debezium: null before on UPDATE raises the REPLICA IDENTITY error; ignore-parse-errors drops") {
    val bad = """{"before":null,"after":{"id":1,"name":"a","weight":1.0},"op":"u"}"""
    val e = intercept[Exception] {
      CdcFormats.debeziumJson(df(bad), "value", schema).collect()
    }
    assert(e.getMessage.contains("REPLICA IDENTITY") ||
      Option(e.getCause).exists(_.getMessage.contains("REPLICA IDENTITY")))
    assert(CdcFormats.debeziumJson(df(bad), "value", schema,
      ignoreParseErrors = true).count() == 0)
  }

  test("debezium: unknown op raises; corrupt message raises; both drop under ignore") {
    val unknown = """{"before":null,"after":{"id":1,"name":"a","weight":1.0},"op":"x"}"""
    val corrupt = """not json at all"""
    intercept[Exception] { CdcFormats.debeziumJson(df(unknown), "value", schema).collect() }
    intercept[Exception] { CdcFormats.debeziumJson(df(corrupt), "value", schema).collect() }
    assert(CdcFormats.debeziumJson(df(unknown, corrupt), "value", schema,
      ignoreParseErrors = true).count() == 0)
  }

  test("canal: batched data arrays; UPDATE backfills unchanged (null) old fields from data") {
    val out = CdcFormats.canalJson(df(
      """{"data":[{"id":1,"name":"a","weight":1.0},{"id":2,"name":"b","weight":2.0}],"old":null,"type":"INSERT","database":"inv"}""",
      // old carries ONLY the changed column (weight); id/name must backfill
      """{"data":[{"id":1,"name":"a","weight":9.0}],"old":[{"id":null,"name":null,"weight":1.0}],"type":"UPDATE","database":"inv"}""",
      """{"data":[{"id":2,"name":"b","weight":2.0}],"old":null,"type":"DELETE","database":"inv"}""",
      """{"data":null,"old":null,"type":"CREATE","database":"inv"}"""),
      "value", schema)
    assert(collectKinds(out) == Seq(
      ("+I", 1L, "a", 1.0), ("+I", 2L, "b", 2.0),
      ("-U", 1L, "a", 1.0), ("+U", 1L, "a", 9.0),
      ("-D", 2L, "b", 2.0)))
  }

  test("canal: database filter skips other databases silently") {
    val out = CdcFormats.canalJson(df(
      """{"data":[{"id":1,"name":"a","weight":1.0}],"old":null,"type":"INSERT","database":"inv"}""",
      """{"data":[{"id":9,"name":"z","weight":9.0}],"old":null,"type":"INSERT","database":"other"}"""),
      "value", schema, database = Some("inv"))
    assert(collectKinds(out) == Seq(("+I", 1L, "a", 1.0)))
  }

  test("maxwell: insert/update/delete with old-field backfill") {
    val out = CdcFormats.maxwellJson(df(
      """{"data":{"id":1,"name":"a","weight":1.0},"old":null,"type":"insert"}""",
      """{"data":{"id":1,"name":"a","weight":5.0},"old":{"id":null,"name":null,"weight":1.0},"type":"update"}""",
      """{"data":{"id":1,"name":"a","weight":5.0},"old":null,"type":"delete"}"""),
      "value", schema)
    assert(collectKinds(out) == Seq(
      ("+I", 1L, "a", 1.0),
      ("-U", 1L, "a", 1.0), ("+U", 1L, "a", 5.0),
      ("-D", 1L, "a", 5.0)))
  }

  test("encoders: the reference's lossy kind folding, and decode(encode) re-reads them") {
    val s = spark
    import s.implicits._
    val changelog = Seq(
      ("+I", 1L, "a", 1.0), ("-U", 1L, "a", 1.0),
      ("+U", 1L, "a", 2.0), ("-D", 1L, "a", 2.0))
      .toDF("kind", "id", "name", "weight")
    val dbz = CdcFormats.toDebeziumJson(changelog).collect().map(_.getString(0))
    // +I/+U → op c with after only; -U/-D → op d with before only
    assert(dbz(0).contains(""""op":"c"""") && !dbz(0).contains(""""before":{"""))
    assert(dbz(1).contains(""""op":"d"""") && !dbz(1).contains(""""after":{"""))
    val roundTrip = CdcFormats.debeziumJson(
      CdcFormats.toDebeziumJson(changelog), "value", schema).collect()
    assert(roundTrip.map(_.getString(0)).toSeq == Seq("+I", "-D", "+I", "-D"))
    val canal = CdcFormats.toCanalJson(changelog).collect().map(_.getString(0))
    assert(canal(0).contains(""""type":"INSERT"""") && canal(0).contains(""""data":[{"""))
    assert(canal(3).contains(""""type":"DELETE""""))
    val maxw = CdcFormats.toMaxwellJson(changelog).collect().map(_.getString(0))
    assert(maxw(0).contains(""""type":"insert"""") && maxw(3).contains(""""type":"delete""""))
    // unsupported kind raises (rowKind2String default branch)
    intercept[Exception] {
      CdcFormats.toCanalJson(Seq(("??", 1L, "a", 1.0)).toDF("kind", "id", "name", "weight"))
        .collect()
    }
  }

  test("canal/maxwell: UPDATE without old values is corrupt (raises; drops under ignore)") {
    val canalBad = """{"data":[{"id":1,"name":"a","weight":2.0}],"old":null,"type":"UPDATE","database":"inv"}"""
    intercept[Exception] { CdcFormats.canalJson(df(canalBad), "value", schema).collect() }
    assert(CdcFormats.canalJson(df(canalBad), "value", schema,
      ignoreParseErrors = true).count() == 0)
    val maxwellBad = """{"data":{"id":1,"name":"a","weight":2.0},"old":null,"type":"update"}"""
    intercept[Exception] { CdcFormats.maxwellJson(df(maxwellBad), "value", schema).collect() }
    assert(CdcFormats.maxwellJson(df(maxwellBad), "value", schema,
      ignoreParseErrors = true).count() == 0)
  }

  test("debezium: null/empty tombstone messages are skipped before parsing, even strict") {
    // DebeziumJsonDeserializationSchema.java:122-125 — skip tombstones
    // unconditionally; a blank line must NOT raise the corrupt error
    val s = spark
    import s.implicits._
    val withBlanks = Seq(
      """{"before":null,"after":{"id":1,"name":"a","weight":1.0},"op":"c"}""",
      "", null.asInstanceOf[String]).toDF("value")
    assert(collectKinds(CdcFormats.debeziumJson(withBlanks, "value", schema)) ==
      Seq(("+I", 1L, "a", 1.0)))
    // canal/maxwell have no tombstone skip: an empty message parses to a
    // null envelope → the corrupt error
    intercept[Exception] { CdcFormats.canalJson(df(""), "value", schema).collect() }
    intercept[Exception] { CdcFormats.maxwellJson(df(""), "value", schema).collect() }
  }

  test("canal/maxwell: DML with null data array is corrupt, not silently dropped") {
    // reference NPEs on row.getArray(0)/row.getRow(0) into the corrupt path
    val canalIns = """{"data":null,"old":null,"type":"INSERT","database":"inv"}"""
    val canalDel = """{"data":null,"old":null,"type":"DELETE","database":"inv"}"""
    intercept[Exception] { CdcFormats.canalJson(df(canalIns), "value", schema).collect() }
    intercept[Exception] { CdcFormats.canalJson(df(canalDel), "value", schema).collect() }
    assert(CdcFormats.canalJson(df(canalIns, canalDel), "value", schema,
      ignoreParseErrors = true).count() == 0)
    val maxwellIns = """{"data":null,"old":null,"type":"insert"}"""
    intercept[Exception] { CdcFormats.maxwellJson(df(maxwellIns), "value", schema).collect() }
    assert(CdcFormats.maxwellJson(df(maxwellIns), "value", schema,
      ignoreParseErrors = true).count() == 0)
    // CREATE (DDL) with null data stays a silent skip — only DML types check
    assert(CdcFormats.canalJson(
      df("""{"data":null,"old":null,"type":"CREATE","database":"inv"}"""),
      "value", schema).count() == 0)
  }

  test("debezium readable metadata keys decode per the reference's converters") {
    val msg = """{"before":{"id":1,"name":"a","weight":1.0},"after":{"id":1,"name":"a","weight":2.0},"op":"u","ts_ms":1589355606100,"source":{"db":"inv","schema":"pg","table":"products","ts_ms":"1589355606000","version":"1.1"}}"""
    val out = CdcFormats.debeziumJson(df(msg), "value", schema,
      metadata = Seq("ingestion-timestamp", "source.timestamp", "source.database",
        "source.schema", "source.table", "source.properties"))
    // metadata appends AFTER the physical columns, named by key
    assert(out.schema.fieldNames.toSeq == Seq("kind", "id", "name", "weight",
      "ingestion-timestamp", "source.timestamp", "source.database",
      "source.schema", "source.table", "source.properties"))
    val rows = out.collect()
    // an UPDATE explodes to -U/+U — BOTH carry the message's metadata
    assert(rows.map(_.getString(0)).toSeq == Seq("-U", "+U"))
    rows.foreach { r =>
      assert(r.getTimestamp(4).getTime == 1589355606100L)  // ts_ms, epoch millis
      assert(r.getTimestamp(5).getTime == 1589355606000L)  // source.ts_ms string
      assert(r.getString(6) == "inv" && r.getString(7) == "pg" && r.getString(8) == "products")
      val props = r.getMap[String, String](9)
      assert(props("version") == "1.1" && props("db") == "inv")
    }
    // null envelope fields → null metadata (the reference's nullable types)
    val bare = """{"before":null,"after":{"id":2,"name":"b","weight":1.0},"op":"c"}"""
    val r2 = CdcFormats.debeziumJson(df(bare), "value", schema,
      metadata = Seq("ingestion-timestamp", "source.database")).collect().head
    assert(r2.isNullAt(4) && r2.isNullAt(5))
  }

  test("debezium metadata: the schema key reads the TOP-LEVEL schema string, with and without schema-include") {
    // isJsonPayload=false in the reference — `schema` lives OUTSIDE payload
    val withEnvelope = """{"schema":{"type":"struct"},"payload":{"before":null,"after":{"id":1,"name":"a","weight":1.0},"op":"c","source":{"table":"t1"}}}"""
    val out = CdcFormats.debeziumJson(df(withEnvelope), "value", schema,
      schemaInclude = true, metadata = Seq("schema", "source.table")).collect().head
    assert(out.getString(4).contains("struct") && out.getString(5) == "t1")
    // invalid key is a pointed error listing the supported keys
    val e = intercept[Exception] {
      CdcFormats.debeziumJson(df(withEnvelope), "value", schema, metadata = Seq("nope"))
    }
    assert(e.getMessage.contains("Invalid metadata key 'nope'"))
  }

  test("debezium decode runs as a real StreamingQuery (file-stream source)") {
    val s = spark
    import s.implicits._
    val in = java.nio.file.Files.createTempDirectory("dbzstream").toString
    val changelog = Seq(
      ("+I", 1L, "a", 1.0), ("-U", 1L, "a", 1.0), ("+U", 1L, "a", 2.0),
      ("+I", 2L, "b", 3.0), ("-D", 2L, "b", 3.0))
      .toDF("kind", "id", "name", "weight")
    CdcFormats.toDebeziumJson(changelog).coalesce(1).write.mode("overwrite").text(in)
    val raw = spark.readStream.text(in).toDF("value")
    // the decode is a pure projection — identical plan under streaming
    val q = CdcFormats.debeziumJson(raw, "value", schema)
      .writeStream.format("memory").queryName("dbz_stream_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("dbz_stream_out").collect()
        .map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
      val batch = CdcFormats.debeziumJson(
        spark.read.text(in).toDF("value"), "value", schema).collect()
        .map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
      assert(streamed == batch && streamed.nonEmpty)
    } finally q.stop()
  }

  test("plan shape: decode is a single projection pipeline — no shuffle, no UDF") {
    val out = CdcFormats.debeziumJson(df(
      """{"before":null,"after":{"id":1,"name":"a","weight":1.0},"op":"c"}"""),
      "value", schema)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"decode must not shuffle:\n$plan")
    assert(!plan.contains("BatchEvalPython") && !plan.contains("SQLUDF"))
  }
}
