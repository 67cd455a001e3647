package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic scale-up of the driver's test fixtures: replicate every
  * table `factor`× with key-domain shifts that preserve referential
  * integrity (replica i shifts each key family by i · (max-key+1)), so
  * joins fan out exactly like a larger scale factor instead of exploding.
  * Dimension tables (region/nation) stay fixed — TPC-H's own scaling rule.
  *
  * Purpose: the sf1 scale probe (BASELINE.md) — expose driver-side or skew
  * bottlenecks the sf0.1 bench cannot see. Text/embedding payloads repeat
  * across replicas, which makes the dedup family's candidate sets ~factor×
  * denser; that is the representative regime for near-dup mining on a real
  * crawl, and the probe reports it as such.
  *
  * Usage: runMain graft.ScaleUp <srcSfDir> <outDir> <factor>
  */
object ScaleUp {

  def main(args: Array[String]): Unit = {
    val src = args(0); val out = args(1); val factor = args(2).toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    scaleUp(spark, src, out, factor)
    GraftSession.shutdown(spark)
  }

  /** max(key)+1 — the shift stride of a key family. */
  private def stride(df: DataFrame, col0: String): Long =
    df.agg(max(col(col0))).head.getLong(0) + 1L

  def scaleUp(spark: SparkSession, src: String, out: String, factor: Int): Unit = {
    def load(t: String) = spark.read.parquet(s"$src/$t.parquet")
    val kCust = stride(load("customer"), "c_custkey")
    val kSupp = stride(load("supplier"), "s_suppkey")
    val kPart = stride(load("part"), "p_partkey")
    val kOrd = stride(load("orders"), "o_orderkey")
    val kEv = stride(load("events"), "event_id")
    val kUser = stride(load("events"), "user_id")
    val kDoc = stride(load("documents"), "doc_id")
    val kVec = stride(load("embeddings"), "vec_id")

    /** One wide pass per table: crossJoin with the replica index (a
      * broadcast 1×factor side — no shuffle), shift the key columns,
      * keep column order. */
    def emit(t: String, shifts: Map[String, Long]): Unit = {
      val df = load(t)
      val scaled =
        if (shifts.isEmpty) df // dimension table: fixed size at every SF
        else {
          val reps = broadcast(spark.range(factor).toDF("__rep"))
          shifts.foldLeft(df.crossJoin(reps)) { case (d, (c, k)) =>
            d.withColumn(c, col(c) + col("__rep") * lit(k))
          }.select(df.columns.map(col).toIndexedSeq: _*)
            // A factor× table must also carry factor× SPLITS: replicated
            // text/vectors snappy-compress ~100×, so the broadcast-crossJoin
            // output otherwise collapses into ONE small file — and every
            // probe scan (and anything cached off it) then starts life as a
            // single partition, hiding exactly the parallelism bugs the
            // probe exists to find. Real corpora arrive in many files; the
            // probe's layout should too.
            .repartition(math.min(256, math.max(8, factor)))
        }
      scaled.write.mode("overwrite").parquet(s"$out/$t.parquet")
      println(s"[scaleup] $t ${if (shifts.isEmpty) "copied" else s"-> ${factor}x"}")
    }

    emit("region", Map.empty)
    emit("nation", Map.empty)
    emit("customer", Map("c_custkey" -> kCust))
    emit("supplier", Map("s_suppkey" -> kSupp))
    emit("part", Map("p_partkey" -> kPart))
    emit("orders", Map("o_orderkey" -> kOrd, "o_custkey" -> kCust))
    emit("lineitem", Map("l_orderkey" -> kOrd, "l_partkey" -> kPart,
      "l_suppkey" -> kSupp))
    emit("events", Map("event_id" -> kEv, "user_id" -> kUser))
    emit("documents", Map("doc_id" -> kDoc))
    emit("embeddings", Map("vec_id" -> kVec))
  }
}
