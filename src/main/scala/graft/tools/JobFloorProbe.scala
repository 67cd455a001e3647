package graft.tools

import org.apache.spark.sql.SparkSession

/** Per-job fixed-cost probe: trivial actions in a loop, across session
  * configurations, to locate the overhead. */
object JobFloorProbe {
  def run(label: String, s: SparkSession): Unit = {
    s.sparkContext.setLogLevel("ERROR")
    (1 to 20).foreach(_ => s.range(10).count()) // warm
    val rdd = s.sparkContext.parallelize(1 to 10, 1)
    (1 to 20).foreach(_ => rdd.count())
    for (r <- 1 to 2) {
      var t0 = System.nanoTime()
      (1 to 50).foreach(_ => s.range(10).count())
      System.err.println(f"[jobfloor] $label%-26s sql ${(System.nanoTime()-t0)/1e9/50*1000}%8.2f ms/job")
      t0 = System.nanoTime()
      (1 to 50).foreach(_ => rdd.count())
      System.err.println(f"[jobfloor] $label%-26s rdd ${(System.nanoTime()-t0)/1e9/50*1000}%8.2f ms/job")
    }
  }
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val mode = sys.env.getOrElse("JOBFLOOR_MODE", "graft")
    val s = mode match {
      case "vanilla" =>
        SparkSession.builder().master(s"local[$cpus]").appName("probe")
          .config("spark.ui.enabled", "false").getOrCreate()
      case "vanilla-noaqe" =>
        SparkSession.builder().master(s"local[$cpus]").appName("probe")
          .config("spark.ui.enabled", "false")
          .config("spark.sql.adaptive.enabled", "false").getOrCreate()
      case "graft-noaqe" =>
        graft.GraftSession.builder(s"local[$cpus]", cpus.toInt)
          .config("spark.sql.adaptive.enabled", "false").getOrCreate()
      case _ => graft.GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    }
    run(mode, s)
    graft.GraftSession.shutdown(s)
  }
}
// appended probe variant lives in run(); see JOBFLOOR_MODE=rdd below
