package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized reader
    * rejects. We read it as raw nanos (legacy nanosAsLong, set in the session
    * conf) and truncate to µs NTZ — the documented TIMESTAMP(9)→TIMESTAMP(6)
    * degradation from SURVEY.md §1.2. All other timestamps are NTZ already. */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(path(sfDir, name))
    if (name == "events")
      df.withColumn("ts",
        expr("timestamp_micros(ts div 1000)").cast("timestamp_ntz"))
    else df
  }

  /** Register every table as a temp view so spark.sql(...) works too. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
