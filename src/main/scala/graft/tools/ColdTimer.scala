package graft.tools

/** One-sample COLD timings — the scale-probe companion to Bench: run each
  * named query exactly once in a fresh session, dropping registered
  * result caches between queries (see [[graft.ResultCaches]]), and print
  * wall time + output row count. Use for expensive scale points where
  * Bench's min-of-2 would double the cost:
  *   sbt "runMain graft.tools.ColdTimer target/sf10 dedup_simhash,..."
  */
object ColdTimer {
  def main(args: Array[String]): Unit = {
    val s = graft.GraftSession.create()
    val dir = args(0)
    args(1).split(",").foreach { name =>
      graft.ResultCaches.dropAll()
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(s, dir).count()
      println(f"COLD $name%s ${(System.nanoTime() - t0) / 1e9}%.1f s rows=$n")
    }
    graft.GraftSession.shutdown(s)
  }
}
