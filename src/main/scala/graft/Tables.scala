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

  /** `events.ts` has shipped as either parquet TIMESTAMP(NANOS) — which
    * Spark's vectorized reader surfaces as raw nano longs (legacy
    * nanosAsLong, set in the session conf) — or plain TIMESTAMP(MICROS),
    * depending on the testdata generation. Normalize both to µs NTZ — the
    * documented TIMESTAMP(9)→TIMESTAMP(6) degradation from SURVEY.md §1.2
    * in the nanos case, an identity re-tag otherwise. */
  /** (session identity, table path) → parquet schema. Schema inference runs
    * a footer-reading Spark job per `spark.read.parquet` call; every query
    * constructor calls [[load]] 1-4 times and the bench re-invokes each
    * query, so the same static fixture footer was read thousands of times
    * per run. Only the SCHEMA is memoized — the file index is rebuilt per
    * call, so a regenerated dir is still re-listed; per-session key, so a
    * rebuilt session re-infers. */
  private val schemaCache = new java.util.concurrent.ConcurrentHashMap[
    (Int, String), org.apache.spark.sql.types.StructType]()

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val p = path(sfDir, name)
    val schema = schemaCache.computeIfAbsent(
      (System.identityHashCode(spark), p),
      _ => spark.read.parquet(p).schema)
    val df = spark.read.schema(schema).parquet(p)
    if (name == "events")
      df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          df.withColumn("ts",
            expr("timestamp_micros(ts div 1000)").cast("timestamp_ntz"))
        case _ => df.withColumn("ts", col("ts").cast("timestamp_ntz"))
      }
    else df
  }

  /** `events.ts` as epoch-micros BIGINT, schema-polymorphic (see [[load]]):
    * raw nanos long → `div 1000`; timestamp → `unix_micros` via a
    * session-UTC cast (value-preserving, matches DuckDB's `epoch_us(ts)`). */
  def tsAsMicrosLong(schema: org.apache.spark.sql.types.StructType,
                     colName: String = "ts"): org.apache.spark.sql.Column =
    schema(colName).dataType match {
      case org.apache.spark.sql.types.LongType => expr(s"$colName div 1000")
      case _ => expr(s"unix_micros(cast($colName as timestamp))")
    }

  /** `events.ts` as a watermarkable TimestampType column, schema-polymorphic. */
  def tsAsTimestamp(schema: org.apache.spark.sql.types.StructType,
                    colName: String = "ts"): org.apache.spark.sql.Column =
    schema(colName).dataType match {
      case org.apache.spark.sql.types.LongType =>
        expr(s"timestamp_micros($colName div 1000)").cast("timestamp")
      case _ => expr(s"cast($colName as timestamp)")
    }

  /** (session identity, view name) → (sfDir, the exact view plan object we
    * registered). Lets [[registerAll]] skip re-reading ten parquet footers
    * per call — it is invoked by ~30 query constructors, each bench sample —
    * while staying correct when someone else REPLACED a fixture name (the
    * TPC-DS fixture mounts its own `customer`): a skipped name requires the
    * catalog to still hold the very object this method registered. Input-
    * fixture memo only — no query results are cached. */
  private val regCache = new java.util.concurrent.ConcurrentHashMap[
    (Int, String), (String, org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)]()

  /** Register every table as a temp view so spark.sql(...) works too. */
  def registerAll(spark: SparkSession, sfDir: String): Unit = {
    val catalog = spark.sessionState.catalog
    val sid = System.identityHashCode(spark)
    names.foreach { n =>
      val key = (sid, n)
      val current = catalog.getRawTempView(n)
      val cached = Option(regCache.get(key))
      val fresh = cached.exists { case (dir, plan) =>
        dir == sfDir && current.exists(_ eq plan) }
      if (!fresh) {
        load(spark, sfDir, n).createOrReplaceTempView(n)
        catalog.getRawTempView(n).foreach(p => regCache.put(key, (sfDir, p)))
      }
    }
  }

  /** File-STREAM a table, layout-aware. The driver fixtures ship each table
    * as one FILE (`<dir>/<name>.parquet`), which a file-stream source can
    * only pick up by streaming the parent dir with a `pathGlobFilter`; any
    * real deployment — and the ScaleUp sf1 probe — ships a parquet
    * DIRECTORY of part files, where that same glob silently matches
    * NOTHING (it filters leaf FILE names, and `part-*.parquet` ≠
    * `<name>.parquet`). Round 8's sf1 probe caught streaming queries
    * reading zero rows that way — stream the table path directly when it
    * is a directory. */
  def streamTable(spark: SparkSession, sfDir: String, name: String,
                  schema: org.apache.spark.sql.types.StructType): DataFrame = {
    val p = path(sfDir, name)
    if (new java.io.File(p).isDirectory)
      spark.readStream.schema(schema).parquet(p)
    else
      spark.readStream.schema(schema).format("parquet")
        .option("pathGlobFilter", s"$name.parquet").load(sfDir)
  }
}
