package graft

/** Plan probe: print the physical plan of one `SparkEntry.queries` entry
  * without executing it — for auditing join strategies and partitioning at
  * a given scale factor (the plan's estimates change with the data).
  *
  * Usage: runMain graft.Explain <query> [sfDir]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.explain("formatted")
    GraftSession.shutdown(spark)
  }
}
