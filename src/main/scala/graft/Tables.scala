package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table catalog over the driver's parquet testdata.
  *
  * Mirrors the reference's filesystem connector surface
  * (flink-table-runtime-blink FileSystemTableSource.java:72) re-expressed as
  * plain Spark DataSource reads: `spark.read.parquet` already provides the
  * pushdown abilities Flink models explicitly (SupportsFilterPushDown /
  * ProjectionPushDown / LimitPushDown — flink-table-common
  * connector/source/abilities/) via Catalyst + DataSource V2.
  *
  * At 100 TB these would be partitioned tables behind a real catalog; the
  * access pattern (declarative scan, pushdown-friendly) is identical.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(sfDir: String, name: String): String = s"$sfDir/$name.parquet"

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(path(sfDir, name))

  /** Register every table as a temp view so spark.sql(...) works too. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
