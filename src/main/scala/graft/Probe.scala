package graft
import org.apache.spark.sql.functions._
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = Tables.load(spark, "/root/testdata/sf0.1", "documents")
    d.count()
    def t(name: String)(f: => Long): Unit = { val t0=System.nanoTime(); val n=f; println(f"PROBE $name%-28s ${(System.nanoTime()-t0)/1e9}%8.2f s  rows=$n") }
    t("lower only")    { d.groupBy(lower(col("text"))).count().count() }
    t("one regexp")    { d.groupBy(regexp_replace(lower(col("text")), "[^a-z0-9 ]", "")).count().count() }
    t("two regexp")    { d.groupBy(regexp_replace(regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""), " +", " ")).count().count() }
    t("norm full")     { d.groupBy(pipeline.TextFunctions.normalize(col("text"))).count().count() }
    t("norm pre-select"){ d.select(pipeline.TextFunctions.normalize(col("text")).as("n")).groupBy(col("n")).count().count() }
    t("norm again")    { d.groupBy(pipeline.TextFunctions.normalize(col("text"))).count().count() }
    t("exact_norm query"){ pipeline.Dedup.queries("dedup_exact_norm")(spark, "/root/testdata/sf0.1").count() }
    spark.stop()
  }
}
