package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Round-trip fidelity of the native Avro record codec (the reference's
  * AvroRowSerializationSchema / AvroRowDeserializationSchema contract):
  * every supported Spark type, nullability, arrays, nested records. */
class AvroCodecSpec extends SparkSpec {

  test("full type matrix round-trips losslessly, including nulls") {
    val schema = StructType(Seq(
      StructField("b", BooleanType),
      StructField("i", IntegerType),
      StructField("l", LongType),
      StructField("f", FloatType),
      StructField("d", DoubleType),
      StructField("s", StringType),
      StructField("bin", BinaryType),
      StructField("ts", TimestampType),
      StructField("dt", DateType),
      StructField("dec", DecimalType(10, 2)),
      StructField("arr", ArrayType(LongType, containsNull = true)),
      StructField("rec", StructType(Seq(
        StructField("x", LongType), StructField("y", StringType))))
    ))
    val ts = java.sql.Timestamp.valueOf("2021-03-04 05:06:07.123456")
    val rows = Seq(
      Row(true, 7, 9L, 1.5f, 2.5, "héllo", Array[Byte](1, 2, 3), ts,
        java.sql.Date.valueOf("2020-01-31"), new java.math.BigDecimal("12345.67"),
        Seq(1L, null, 3L), Row(42L, "nested")),
      Row(null, null, null, null, null, null, null, null, null, null, null, null)
    )
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 2), schema)
    val back = AvroCodec.decodeRows(AvroCodec.encodeRows(df), schema).collect()
    val orig = df.collect()
    assert(back.length == 2)
    // binary needs element-wise compare; everything else structural
    def norm(r: Row): Seq[Any] = r.toSeq.map {
      case a: Array[Byte] => a.toSeq
      case d: java.math.BigDecimal => d.stripTrailingZeros
      case x => x
    }
    assert(back.map(norm).toSet == orig.map(norm).toSet)
    // timestamp keeps microsecond precision through the micros logical type
    val t = back.find(!_.isNullAt(7)).get.getTimestamp(7)
    assert(t.getNanos == 123456000)
  }

  test("avro schema carries nullable unions and logical types") {
    val schema = StructType(Seq(
      StructField("ts", TimestampType, nullable = false),
      StructField("s", StringType, nullable = true)))
    val avro = AvroCodec.avroSchemaFor(schema)
    assert(avro.getField("ts").schema().getLogicalType.getName == "timestamp-micros")
    assert(avro.getField("s").schema().getType == org.apache.avro.Schema.Type.UNION)
  }

  test("encoded bytes are the Kafka value contract: binary column named value") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val enc = AvroCodec.encodeRows(df)
    assert(enc.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      Seq(("value", BinaryType)))
    assert(enc.count() == 2)
  }

  test("schema evolution: by-name resolution, dropped/added fields, int→long promotion") {
    val s = spark
    import s.implicits._
    // writer: (a INT, b STRING, c DOUBLE); reader reorders, drops c,
    // promotes a to LONG, and adds nullable d
    val src = Seq((1, "x", 2.5), (2, "y", 3.5)).toDF("a", "b", "c")
    val encoded = AvroCodec.encodeRows(src)
    val readerSchema = StructType(Seq(
      StructField("b", StringType), StructField("a", LongType),
      StructField("d", StringType, nullable = true)))
    val out = AvroCodec.decodeRowsEvolved(encoded, src.schema, readerSchema)
      .orderBy("a").collect()
    assert(out.map(r => (r.getString(0), r.getLong(1), r.isNullAt(2))).toSeq ==
      Seq(("x", 1L, true), ("y", 2L, true)))
    // a non-nullable added field has no default → resolution fails loudly
    val bad = StructType(Seq(StructField("a", LongType),
      StructField("req", LongType, nullable = false)))
    intercept[Exception] {
      AvroCodec.decodeRowsEvolved(encoded, src.schema, bad).collect()
    }
  }
}
