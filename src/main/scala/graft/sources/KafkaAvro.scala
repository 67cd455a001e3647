package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.Row

/** Kafka source/sink + Avro format facade — the reference's most-used
  * connector family (flink-connectors/flink-connector-kafka
  * FlinkKafkaConsumer.java:72, FlinkKafkaProducer.java:101;
  * flink-formats/flink-avro).
  *
  * Spark-first mapping (everything below is stock Structured Streaming —
  * the facade only fixes the option spellings):
  *
  *   FlinkKafkaConsumer(topic, deserializer, props) →
  *     spark.readStream.format("kafka")
  *          .option("kafka.bootstrap.servers", ...).option("subscribe", topic)
  *   setStartFromEarliest/Latest/Offsets → option("startingOffsets", ...)
  *   FlinkKafkaProducer (at-least-once) → df.writeStream.format("kafka") +
  *     checkpointing; EXACTLY_ONCE's two-phase commit has no Spark sink
  *     equivalent — Spark's idempotent-sink + checkpoint model replaces it
  *   AvroRowDeserializationSchema → from_avro(col, schema) (spark-avro)
  *   avro files → spark.read/write.format("avro")
  *
  * The kafka/avro DataSources resolve BY NAME at runtime, so this facade
  * compiles with no extra dependency; [[kafkaAvailable]]/[[avroAvailable]]
  * report whether the jars are on the classpath (they are not in the
  * offline build sandbox — KafkaAvroSpec auto-skips there and runs wherever
  * the jars exist, e.g. `--packages org.apache.spark:spark-sql-kafka-0-10`).
  *
  * Scale notes: one Kafka partition maps to one Spark input partition —
  * parallelism is governed by the topic's partition count, same as the
  * reference's consumer. `maxOffsetsPerTrigger` is the backpressure knob
  * (the analogue of the reference's fetch-size/poll bounds).
  */
object KafkaAvro {

  /** Is the Kafka DataSource on the classpath? */
  def kafkaAvailable: Boolean = providerExists("kafka")

  /** Is the Avro FileFormat on the classpath? */
  def avroAvailable: Boolean = providerExists("avro")

  private def providerExists(fmt: String): Boolean =
    try {
      // the same service-loader lookup Spark's own resolution uses
      org.apache.spark.sql.execution.datasources.DataSource.lookupDataSource(
        fmt, org.apache.spark.sql.internal.SQLConf.get)
      true
    } catch { case _: Throwable => false }

  /** The FlinkKafkaConsumer property → Spark option translation, as data —
    * the facade's actual content, testable without the DataSource jar.
    * Mirrors: setStartFromEarliest/Latest → startingOffsets,
    * setStartFromSpecificOffsets(json) → startingOffsets json,
    * properties("bootstrap.servers") → kafka.bootstrap.servers,
    * topic subscribe list → subscribe. */
  def kafkaSourceOptions(servers: String, topic: String,
                         startingOffsets: String = "earliest"): Map[String, String] = Map(
    "kafka.bootstrap.servers" -> servers,
    "subscribe" -> topic,
    "startingOffsets" -> startingOffsets)

  /** FlinkKafkaProducer property translation (sink side). */
  def kafkaSinkOptions(servers: String, topic: String,
                       checkpointDir: String): Map[String, String] = Map(
    "kafka.bootstrap.servers" -> servers,
    "topic" -> topic,
    "checkpointLocation" -> checkpointDir)

  /** The metadata columns the source projects — KafkaDeserializationSchema's
    * ConsumerRecord surface. */
  val SourceColumns: Seq[String] =
    Seq("key", "value", "topic", "partition", "offset", "timestamp")

  /** Streaming Kafka source: value bytes + standard metadata columns
    * (topic/partition/offset/timestamp — what the reference exposes through
    * KafkaDeserializationSchema's ConsumerRecord). */
  def kafkaSource(spark: SparkSession, servers: String, topic: String,
                  startingOffsets: String = "earliest"): DataFrame =
    spark.readStream
      .format("kafka")
      .options(kafkaSourceOptions(servers, topic, startingOffsets))
      .load()
      .select(SourceColumns.map(col): _*)

  /** Batch Kafka scan (the reference's bounded Kafka source mode). */
  def kafkaBatch(spark: SparkSession, servers: String, topic: String): DataFrame =
    spark.read
      .format("kafka")
      .options(kafkaSourceOptions(servers, topic) - "startingOffsets")
      .load()

  /** Kafka sink writer: expects `key`/`value` binary (or string) columns —
    * FlinkKafkaProducer's KeyedSerializationSchema contract. At-least-once
    * via checkpointing; pair with idempotent downstream consumers. */
  def kafkaSink(df: DataFrame, servers: String, topic: String,
                checkpointDir: String): DataStreamWriter[Row] =
    df.writeStream
      .format("kafka")
      .options(kafkaSinkOptions(servers, topic, checkpointDir))

  /** Avro file read — AvroInputFormat / avro FileSystemFormatFactory. */
  def readAvro(spark: SparkSession, path: String): DataFrame =
    spark.read.format("avro").load(path)

  /** Avro file write — AvroOutputFormat. */
  def writeAvro(df: DataFrame, path: String): Unit =
    df.write.format("avro").mode("overwrite").save(path)
}
