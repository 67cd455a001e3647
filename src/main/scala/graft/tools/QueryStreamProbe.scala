package graft.tools

import org.apache.spark.sql.streaming.StreamingQueryListener

/** Runs declared queries by name with a listener that prints every
  * streaming micro-batch's duration breakdown — shows where a
  * streaming-protocol row's wall-clock goes. Local iteration tool. */
object QueryStreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val names = args(0).split(",").toSeq
    val s = graft.GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit =
        System.err.println(s"[qsp] START ${e.name}/${e.id} at ${System.nanoTime() / 1000000}")
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        val st = p.stateOperators.map(so =>
          s"${so.operatorName}:commit=${so.commitTimeMs}ms rows=${so.numRowsTotal}").mkString("; ")
        System.err.println(s"[qsp] batch=${p.batchId} rows=${p.numInputRows} dur=${p.durationMs} state[$st]")
      }
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit =
        System.err.println(s"[qsp] END ${e.id} at ${System.nanoTime() / 1000000}")
    })
    for (name <- names; round <- 1 to 2) {
      graft.ResultCaches.dropAll()
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(s, sfDir).count()
      System.err.println(f"[qsp] $name r$round total=${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
    }
    graft.GraftSession.shutdown(s)
  }
}
