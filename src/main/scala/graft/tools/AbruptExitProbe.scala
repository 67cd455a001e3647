package graft.tools

import org.apache.spark.sql.functions._

/** Forked-JVM probe for the ABNORMAL exit path (RocksDbShutdownSpec): build
  * RocksDB-backed streaming state, then `System.exit(3)` WITHOUT stopping
  * the query, the providers, or the session — the path a fatal task error
  * takes through Spark's uncaught-exception handler, which skips every
  * `finally`. GraftSession's once-per-JVM shutdown hook must close the
  * providers while JNI attach still succeeds; without it this exact shape
  * SIGSEGV'd in rocksdbjni's LoggerJniCallback (BASELINE.md round-11
  * incident addendum). A clean run exits with code 3 — never 134/139. */
object AbruptExitProbe {
  def main(args: Array[String]): Unit = {
    val keys = args.headOption.map(_.toLong).getOrElse(200000L)
    val spark = graft.GraftSession.create()
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("abrupt_in").toString
    spark.range(0, keys)
      .select(col("id").as("key"), col("id").as("ts"), col("id").as("id"),
        lit("x").as("kind"), lit(1.0).as("value"))
      .write.mode("overwrite").parquet(dir)
    val rows = spark.readStream
      .schema(org.apache.spark.sql.Encoders.product[graft.streaming.KeyedRow].schema)
      .parquet(dir).as[graft.streaming.KeyedRow]
    val q = graft.streaming.StatefulOps.dedupKeepLast(rows)
      .writeStream.outputMode("update").format("noop")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("abrupt_ckpt").toString)
      .start()
    q.processAllAvailable()
    println(s"ABRUPT_PROBE_STATE_BUILT keys=$keys")
    // deliberately NO q.stop(), NO shutdown, NO spark.stop(): the hook is
    // the only thing standing between the open providers and the exit
    System.exit(3)
  }
}
