package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer

import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema, SchemaBuilder}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{BinaryDecoder, BinaryEncoder, DecoderFactory, EncoderFactory}
import org.apache.avro.util.Utf8
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

/** Native Avro record codec — the executable half of the Avro format
  * surface (the reference's flink-formats/flink-avro
  * AvroRowSerializationSchema.java:75 / AvroRowDeserializationSchema.java:82,
  * which serialize ROWS to Avro binary for Kafka values; the container-file
  * side is AvroInputFormat).
  *
  * The offline sandbox has no spark-avro DataSource jar (checked: coursier
  * cache and /opt/spark/jars carry only core avro-1.12.1), so
  * `format("avro")` cannot resolve — but the core Avro library is on the
  * classpath, which is all a record-level codec needs. This implements the
  * schema mapping and per-record binary encode/decode directly on
  * GenericDatumWriter/Reader, giving the engine a PROVEN Avro path:
  * Kafka-style value bytes in and out of DataFrames with schema derived
  * from/applied to the Spark schema. Where the spark-avro jar exists,
  * [[KafkaAvro.readAvro]]/[[KafkaAvro.writeAvro]] remain the container-file
  * path.
  *
  * Scale: encode/decode run in `mapPartitions` with writer/decoder reuse —
  * one allocation per partition, not per row; the byte column pipelines
  * into the Kafka sink contract ([[KafkaAvro.kafkaSink]] expects exactly a
  * binary `value` column).
  *
  * Type mapping (AvroSchemaConverter.java:61 does the same in the
  * reference): boolean/int/long/float/double/string/binary 1:1, timestamp →
  * long + timestamp-micros logical type, date → int + date logical type,
  * decimal → string (lossless, deterministic), nullable → union(null, T),
  * array → array, struct → record (nested).
  */
object AvroCodec {

  // ---- Spark StructType → Avro Schema ----

  def avroSchemaFor(schema: StructType, name: String = "row"): Schema = {
    val fields = schema.fields.toSeq.map { f =>
      val base = fieldSchema(f.dataType, s"${name}_${f.name}")
      val s = if (f.nullable) Schema.createUnion(Schema.create(Schema.Type.NULL), base) else base
      new Schema.Field(f.name, s, null, if (f.nullable) Schema.Field.NULL_DEFAULT_VALUE else null)
    }
    Schema.createRecord(name, null, "graft", false, fields.asJava)
  }

  private def fieldSchema(dt: DataType, name: String): Schema = dt match {
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case ByteType | ShortType | IntegerType => Schema.create(Schema.Type.INT)
    case LongType => Schema.create(Schema.Type.LONG)
    case FloatType => Schema.create(Schema.Type.FLOAT)
    case DoubleType => Schema.create(Schema.Type.DOUBLE)
    case StringType => Schema.create(Schema.Type.STRING)
    case BinaryType => Schema.create(Schema.Type.BYTES)
    case TimestampType => LogicalTypes.timestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
    case DateType => LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
    case _: DecimalType => Schema.create(Schema.Type.STRING) // lossless textual
    case ArrayType(et, containsNull) =>
      val el = fieldSchema(et, s"${name}_item")
      Schema.createArray(
        if (containsNull) Schema.createUnion(Schema.create(Schema.Type.NULL), el) else el)
    case st: StructType => avroSchemaFor(st, name)
    case other => throw new IllegalArgumentException(s"unsupported Avro mapping for $other")
  }

  // ---- encode: DataFrame → binary `value` column ----

  /** Serialize every row to Avro binary (schema-less record payload — the
    * Kafka wire shape; the schema travels out-of-band, as with a registry). */
  def encodeRows(df: DataFrame): DataFrame = {
    val sparkSchema = df.schema
    val avroJson = avroSchemaFor(sparkSchema).toString
    df.mapPartitions { it =>
      val avroSchema = new Schema.Parser().parse(avroJson)
      val writer = new GenericDatumWriter[GenericRecord](avroSchema)
      val out = new ByteArrayOutputStream()
      var encoder: BinaryEncoder = null
      it.map { row =>
        out.reset()
        encoder = EncoderFactory.get().binaryEncoder(out, encoder)
        writer.write(toRecord(row, sparkSchema, avroSchema), encoder)
        encoder.flush()
        out.toByteArray
      }
    }(Encoders.BINARY).toDF("value")
  }

  /** Deserialize a binary `value` column back to rows of `schema`. */
  def decodeRows(df: DataFrame, schema: StructType): DataFrame =
    decodeRowsEvolved(df, schema, schema)

  /** Schema-RESOLVED decode — Avro schema evolution (the reference's
    * RegistryAvroDeserializationSchema path resolves writer vs reader
    * schema the same way; Avro spec "Schema Resolution"): bytes written
    * under `writerSchema` read as rows of `readerSchema`. Fields are
    * matched BY NAME (reordering is fine); fields dropped from the reader
    * are skipped; fields added by the reader fill from their default
    * (nullable → null — non-nullable additions fail resolution, as the
    * spec requires); int→long / float→double promotions apply. */
  def decodeRowsEvolved(df: DataFrame, writerSchema: StructType,
      readerSchema: StructType): DataFrame = {
    val wJson = avroSchemaFor(writerSchema).toString
    val rJson = avroSchemaFor(readerSchema).toString
    df.select("value").as(Encoders.BINARY).mapPartitions { it =>
      val w = new Schema.Parser().parse(wJson)
      val r = new Schema.Parser().parse(rJson)
      val reader = new GenericDatumReader[GenericRecord](w, r)
      var decoder: BinaryDecoder = null
      var record: GenericRecord = null
      it.map { bytes =>
        decoder = DecoderFactory.get().binaryDecoder(bytes, decoder)
        record = reader.read(record, decoder)
        toRow(record, readerSchema)
      }
    }(Encoders.row(readerSchema))
  }

  // ---- value conversions ----

  private def toRecord(row: Row, st: StructType, avro: Schema): GenericRecord = {
    val rec = new GenericData.Record(avro)
    var i = 0
    while (i < st.length) {
      val v = if (row.isNullAt(i)) null
        else toAvroValue(row.get(i), st.fields(i).dataType, unwrapUnion(avro.getFields.get(i).schema()))
      rec.put(i, v)
      i += 1
    }
    rec
  }

  private def unwrapUnion(s: Schema): Schema =
    if (s.getType == Schema.Type.UNION) s.getTypes.asScala.find(_.getType != Schema.Type.NULL).get
    else s

  private def toAvroValue(v: Any, dt: DataType, avro: Schema): Any = dt match {
    case ByteType => v.asInstanceOf[Byte].toInt
    case ShortType => v.asInstanceOf[Short].toInt
    case TimestampType => // java.sql.Timestamp → epoch micros
      val ts = v.asInstanceOf[java.sql.Timestamp]
      ts.getTime * 1000L + (ts.getNanos % 1000000L) / 1000L
    case DateType => v.asInstanceOf[java.sql.Date].toLocalDate.toEpochDay.toInt
    case _: DecimalType => v.toString
    case BinaryType => ByteBuffer.wrap(v.asInstanceOf[Array[Byte]])
    case ArrayType(et, _) =>
      val el = unwrapUnion(avro.getElementType)
      v.asInstanceOf[scala.collection.Seq[Any]]
        .map(x => if (x == null) null else toAvroValue(x, et, el)).asJava
    case st: StructType => toRecord(v.asInstanceOf[Row], st, avro)
    case _ => v // boolean/int/long/float/double/string pass through
  }

  private def toRow(rec: GenericRecord, st: StructType): Row = {
    val vals = new Array[Any](st.length)
    var i = 0
    while (i < st.length) {
      vals(i) = fromAvroValue(rec.get(i), st.fields(i).dataType)
      i += 1
    }
    Row.fromSeq(vals.toIndexedSeq)
  }

  private def fromAvroValue(v: Any, dt: DataType): Any =
    if (v == null) null
    else dt match {
      case ByteType => v.asInstanceOf[Int].toByte
      case ShortType => v.asInstanceOf[Int].toShort
      case StringType => v.asInstanceOf[CharSequence].toString // Utf8 → String
      case TimestampType =>
        val micros = v.asInstanceOf[Long]
        val ts = new java.sql.Timestamp(Math.floorDiv(micros, 1000L))
        ts.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
        ts
      case DateType => java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong))
      case d: DecimalType => new java.math.BigDecimal(v.asInstanceOf[CharSequence].toString)
      case BinaryType =>
        val bb = v.asInstanceOf[ByteBuffer]
        val arr = new Array[Byte](bb.remaining()); bb.duplicate().get(arr); arr
      case ArrayType(et, _) =>
        v.asInstanceOf[java.util.List[Any]].asScala.toSeq.map(fromAvroValue(_, et))
      case st: StructType => toRow(v.asInstanceOf[GenericRecord], st)
      case _ => v match { case u: Utf8 => u.toString; case other => other }
    }
}
