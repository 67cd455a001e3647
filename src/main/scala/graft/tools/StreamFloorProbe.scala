package graft.tools

import org.apache.spark.sql.functions._

/** Measures the fixed per-StreamingQuery lifecycle cost in this
  * environment: (a) stateless file-stream → exactly-once parquet sink,
  * (b) the same with one flatMapGroupsWithState hop (RocksDB-backed),
  * (c) a memory-sink no-op. Local iteration tool — not part of the bench. */
object StreamFloorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = graft.GraftSession.builder(s"local[$cpus]", cpus.toInt)
    val b2 = sys.env.get("FLOOR_CHANGELOG") match {
      case Some(v) => b.config(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", v)
      case None => b
    }
    val s = sys.env.get("FLOOR_PROVIDER") match {
      case Some(p) => b2.config("spark.sql.streaming.stateStore.providerClass", p).getOrCreate()
      case None => b2.getOrCreate()
    }
    s.sparkContext.setLogLevel("ERROR")
    import s.implicits._
    val schema = s.read.parquet(s"$sfDir/events.parquet").schema
    def t(label: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      System.err.println(f"[floor] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    }
    for (round <- 1 to 3) {
      t(s"stateless-sink r$round") {
        val dir = graft.RelayDir.fresh("floorprobe", "a")
        val q = graft.Tables.streamTable(s, sfDir, "events", schema)
          .select(col("event_id"), col("user_id"))
          .writeStream.format("parquet").option("path", dir)
          .option("checkpointLocation", s"$dir.ckpt").outputMode("append").start()
        try q.processAllAvailable() finally q.stop()
      }
      t(s"stateful-sink  r$round") {
        val dir = graft.RelayDir.fresh("floorprobe", "b")
        val rows = graft.Tables.streamTable(s, sfDir, "events", schema)
          .select(col("user_id").cast("long").as("key"),
            col("event_id").cast("long").as("id"))
          .as[(Long, Long)]
        val q = rows.groupByKey(_._1)
          .flatMapGroupsWithState[Long, (Long, Long)](
            org.apache.spark.sql.streaming.OutputMode.Append(),
            org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout()) {
            case (k, it, st) =>
              val n = it.size.toLong + st.getOption.getOrElse(0L)
              st.update(n); Iterator((k, n))
          }
          .toDF("key", "n")
          .writeStream.format("parquet").option("path", dir)
          .option("checkpointLocation", s"$dir.ckpt").outputMode("append").start()
        try q.processAllAvailable() finally q.stop()
      }
      t(s"readback       r$round") {
        s.read.parquet(s"$sfDir/events.parquet").count(): Unit
      }
    }
    graft.GraftSession.shutdown(s)
  }
}
