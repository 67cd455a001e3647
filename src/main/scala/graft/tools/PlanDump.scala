package graft.tools

/** Bulk `.explain("formatted")` capture: one file per query under the given
  * out dir. Streaming-composed queries execute their streaming stages during
  * construction (their plan is the final read-back's); use the filter arg to
  * keep captures cheap. Usage: runMain graft.tools.PlanDump <outDir> [names]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val only: Option[Set[String]] = args.lift(1).map(_.split(",").toSet)
    val spark = graft.GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          val txt = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          val w = new java.io.PrintWriter(s"$outDir/$name.txt")
          try w.println(txt) finally w.close()
        } catch { case e: Throwable =>
          System.err.println(s"[plandump] $name failed: ${e.getMessage}")
        }
      }
    graft.GraftSession.shutdown(spark)
  }
}
