package graft.tools

import org.apache.spark.sql.functions._

/** Per-micro-batch breakdown for the stream-stream interval join row:
  * prints each batch's durationMs map and state-operator commit metrics.
  * Local iteration tool — not part of the bench. */
object StreamJoinProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = graft.GraftSession.builder(s"local[$cpus]", cpus.toInt)
    val b2 = sys.env.get("SJP_JOIN_V3") match {
      case Some("1") => b.config("spark.sql.streaming.join.stateFormatVersion", "3")
      case _ => b
    }
    val s = (sys.env.get("SJP_NO_NODATA") match {
      case Some("1") => b2.config("spark.sql.streaming.noDataMicroBatches.enabled", "false")
      case _ => b2
    }).getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val schema = s.read.parquet(s"$sfDir/events.parquet").schema
    def run(round: Int): Unit = {
      val t0 = System.nanoTime()
      def src() = graft.Tables.streamTable(s, sfDir, "events", schema)
        .withColumn("ts", graft.Tables.tsAsTimestamp(schema))
      val p = src().filter(col("event_type") === "purchase")
        .withWatermark("ts", "0 seconds")
        .select(col("user_id").as("u"), col("event_id").as("p_id"),
          col("ts").as("p_ts"))
      val c = src().filter(col("event_type") === "click")
        .withWatermark("ts", "0 seconds")
        .select(col("user_id").as("cu"), col("event_id").as("c_id"),
          col("ts").as("c_ts"))
      val joined = p.join(c, col("u") === col("cu")
        && col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR")
        && col("c_ts") <= col("p_ts"))
        .select(col("u"), col("p_id"), col("c_id"))
      val dir = graft.RelayDir.fresh("sjprobe", "a")
      val tStart = System.nanoTime()
      val q = joined.writeStream.format("parquet")
        .option("path", dir).option("checkpointLocation", s"$dir.ckpt")
        .outputMode("append").start()
      val tStarted = System.nanoTime()
      try q.processAllAvailable() finally {
        val tDrained = System.nanoTime()
        q.recentProgress.foreach { pr =>
          System.err.println(s"[sjp r$round] batch=${pr.batchId} rows=${pr.numInputRows} dur=${pr.durationMs}")
          pr.stateOperators.foreach { so =>
            System.err.println(s"[sjp r$round]   state op=${so.operatorName} commitMs=${so.commitTimeMs} " +
              s"rowsTotal=${so.numRowsTotal} mem=${so.memoryUsedBytes} custom=${so.customMetrics}")
          }
        }
        q.stop()
        val tStopped = System.nanoTime()
        System.err.println(f"[sjp r$round] build=${(tStart - t0) / 1e9}%.2f start=${(tStarted - tStart) / 1e9}%.2f drain=${(tDrained - tStarted) / 1e9}%.2f stop=${(tStopped - tDrained) / 1e9}%.2f")
      }
      val rb0 = System.nanoTime()
      val n = s.read.parquet(dir).orderBy(col("u"), col("p_id"), col("c_id")).count()
      System.err.println(f"[sjp r$round] readback+sort+count=${(System.nanoTime() - rb0) / 1e9}%.2f rows=$n total=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    (1 to 3).foreach(run)
    graft.GraftSession.shutdown(s)
  }
}
