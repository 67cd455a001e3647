package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Streaming source/sink connectors beyond MemoryStream (SURVEY §2.1):
  * the rate source (stand-in for an unbounded ingest like Kafka — same
  * readStream surface) and the checkpointed file source/sink pair (the
  * reference's FileSystemTableSource streaming mode + StreamingFileSink
  * with exactly-once commit via the checkpoint + _spark_metadata log). */
class StreamingSourcesSpec extends SparkSpec {

  test("rate source streams monotonically increasing rows") {
    val q = spark.readStream.format("rate")
      .option("rowsPerSecond", "50").load()
      .select(col("value"))
      .writeStream.format("memory").queryName("rate_out").outputMode("append").start()
    try {
      q.processAllAvailable()
      Thread.sleep(1200)
      q.processAllAvailable()
      val vals = spark.sql("select value from rate_out").collect().map(_.getLong(0))
      assert(vals.nonEmpty, "rate source produced no rows")
      assert(vals.distinct.length == vals.length, "values must be unique")
    } finally q.stop()
  }

  test("file stream source → checkpointed parquet file sink, exactly-once re-read") {
    val s = spark
    import s.implicits._
    val in = Files.createTempDirectory("graft_fs_in").toString
    val out = Files.createTempDirectory("graft_fs_out").toString
    val ckpt = Files.createTempDirectory("graft_fs_ckpt").toString
    // drop two json files into the watched dir across two micro-batches
    Seq("""{"k":1,"v":10}""").toDF("value").coalesce(1)
      .write.mode("append").text(s"$in/f1")
    val schema = "k LONG, v LONG"
    val q = spark.readStream.schema(schema).json(s"$in/*")
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      Seq("""{"k":2,"v":20}""").toDF("value").coalesce(1)
        .write.mode("append").text(s"$in/f2")
      q.processAllAvailable()
      // the sink's metadata log makes the output an exactly-once table
      val rows = spark.read.parquet(out).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(rows == Set((1L, 10L), (2L, 20L)))
    } finally q.stop()
  }
}
