package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // optional arg: comma-separated query-name filter (local iteration only;
    // the driver invokes with no args = full run)
    val only: Option[Set[String]] = args.lift(0).map(_.split(",").toSet)
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup (classloading, codegen, parquet footer caches) so the
    // first timed query isn't charged for JVM start; sorted order keeps
    // per-query numbers comparable across rounds (Map order moves with the
    // key set)
    try { SparkEntry.entry(spark).count() } catch { case _: Throwable => }
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() }
        catch { case e: Throwable => // a crash must surface, not pose as a timing
          errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(160)
        }
        name -> (System.nanoTime() - t0) / 1e9
      }
    // ms precision keeps the single output line short (the driver's capture
    // window has truncated full-precision doubles before); total and error
    // count lead the object so they survive a tail cut
    def ms(v: Double): Double = math.rint(v * 1000) / 1000
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"
        case c if c < ' ' => " "
        case c => c.toString
      } + "\""
    val qs = results.map { case (k, v) => jstr(k) + ":" + ms(v) }.mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => jstr(k) + ":" + jstr(v) }.mkString("{", ",", "}")
    val total = ms(results.map(_._2).sum)
    println(s"""{"metric":"total","value":$total,"unit":"sec","n_errors":${errors.size},"errors":$errJson,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
