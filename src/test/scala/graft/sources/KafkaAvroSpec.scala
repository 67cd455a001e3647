package graft.sources

import graft.SparkSpec

/** Runs wherever the kafka/avro jars are on the classpath; auto-skips
  * (cancels) in the offline sandbox. The facade surface itself — option
  * spellings, column projection — is exercised the moment the provider
  * resolves. */
class KafkaAvroSpec extends SparkSpec {

  test("avro round-trip through the facade") {
    assume(KafkaAvro.avroAvailable, "spark-avro not on the classpath")
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("avro").toString
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "name")
    KafkaAvro.writeAvro(df, s"$dir/t")
    val back = KafkaAvro.readAvro(spark, s"$dir/t")
    assert(back.collect().map(r => (r.getLong(0), r.getString(1))).toSet ==
      Set((1L, "a"), (2L, "b")))
  }

  test("kafka source builds a streaming plan with the metadata columns") {
    assume(KafkaAvro.kafkaAvailable, "spark-sql-kafka not on the classpath")
    // no broker needed: constructing the source validates provider + options
    val df = KafkaAvro.kafkaSource(spark, "localhost:9092", "events")
    assert(df.isStreaming)
    assert(df.columns.toSet == Set("key", "value", "topic", "partition", "offset", "timestamp"))
  }

  test("availability flags are answerable offline") {
    // in the offline sandbox both are false; the call itself must not throw
    KafkaAvro.kafkaAvailable
    KafkaAvro.avroAvailable
    succeed
  }
}
