package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Dataset, SparkSession}
import graft.streaming.{Changelog, KeyedRow, StatefulOps}

/** State-DEPTH probe for the stateful streaming operators (round 9).
  *
  * The sf1 streaming probes prove THROUGHPUT scaling; this main proves the
  * state dimension: the retractable Top-N and the unbounded outer join
  * driven to millions of DISTINCT KEYS on the RocksDB state store provider
  * (the disk-backed scale path — SURVEY maps flink-statebackend-rocksdb
  * onto it), with the no-silent-fallback metrics assert from
  * RocksDbStateStoreSpec repeated at every depth: the run FAILS unless the
  * progress metrics carry rocksdb-prefixed custom metrics AND the state
  * row count equals the expected key count.
  *
  * Inputs are generated DISTRIBUTED (spark.range → parquet, multiple part
  * files streamed with maxFilesPerTrigger so state builds across several
  * micro-batches) and outputs are counted in foreachBatch — nothing routes
  * through the driver at any depth.
  *
  * Usage: runMain graft.StateScaleProbe [keyCount ...]
  *        (default 1000000 3000000 10000000)
  * Prints one JSON line per (probe, depth).
  */
object StateScaleProbe {
  private val Rocks =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def rm(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(rm))
    f.delete(): Unit
  }

  private def fresh(tag: String): String = {
    val d = new java.io.File(s"target/state_probe/$tag")
    rm(d)
    d.getPath
  }

  /** Run a streaming pipeline until its output is complete, counting rows
    * executor-side; returns (outRows, stateRowsTotal, seconds) and asserts
    * the RocksDB provider actually served the state.
    *
    * `minOut > 0` switches to poll-until-stable shutdown instead of
    * processAllAvailable: an operator holding pending PROCESSING-TIME
    * timeouts (the TTL join) makes Spark schedule timeout-check batches
    * continuously, and every such batch re-scans and deserializes the
    * ENTIRE state (FlatMapGroupsWithStateExec has no timer heap — a real
    * Spark-vs-reference cost this probe quantifies, see BASELINE.md).
    * processAllAvailable races that storm indefinitely, so the probe
    * instead waits for the expected output floor + stability, captures the
    * progress metrics, and stops the query. */
  private def drive[T](out: Dataset[T], tag: String, minOut: Long = 0L): (Long, Long, Double) = {
    val ckpt = fresh(s"$tag.ckpt")
    val n = new java.util.concurrent.atomic.AtomicLong()
    val t0 = System.nanoTime()
    val q = out.writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: Dataset[T], _: Long) => n.addAndGet(b.count()): Unit }
      .start()
    try {
      if (minOut == 0L) q.processAllAvailable()
      else {
        var stable = 0
        var last = -1L
        while (stable < 3) {
          Thread.sleep(2000)
          val cur = n.get()
          // an empty (timeout-check) batch as the LATEST completed batch
          // proves every data batch committed — numRowsTotal then reflects
          // the full state, not the state as of some mid-load batch
          val drained = Option(q.lastProgress).exists(_.numInputRows == 0L)
          if (cur == last && cur >= minOut && drained) stable += 1
          else { stable = 0; last = cur }
        }
      }
    } catch { case t: Throwable => q.stop(); throw t }
    val sec = (System.nanoTime() - t0) / 1e9
    val op = q.lastProgress.stateOperators.head
    q.stop()
    require(op.customMetrics.keySet.toArray.exists(_.toString.startsWith("rocksdb")),
      s"$tag: expected rocksdb custom metrics — the provider silently fell back; " +
        s"got ${op.customMetrics.keySet}")
    (n.get(), op.numRowsTotal, sec)
  }

  /** Retractable Top-N over `k` distinct keys, 2 changes per key, streamed
    * as 8 files / 4 micro-batches. State = per-key row map + rank list. */
  private def probeTopN(spark: SparkSession, k: Long): Unit = {
    import spark.implicits._
    val dir = fresh(s"topn_$k")
    spark.range(0, 2 * k).select(
        lit("+I").as("kind"), (col("id") % k).as("key"), col("id").as("id"),
        col("id").as("ts"), (col("id") % 1000).cast("double").as("value"))
      .repartition(8).write.parquet(dir)
    val changes = spark.readStream
      .schema(org.apache.spark.sql.Encoders.product[Changelog.Change].schema)
      .option("maxFilesPerTrigger", 2).parquet(dir)
      .as[Changelog.Change]
    val (outRows, stateRows, sec) = drive(Changelog.retractableTopN(changes, 3), s"topn_$k")
    require(stateRows == k, s"topn_$k: state rows $stateRows != $k keys")
    require(outRows >= k, s"topn_$k: only $outRows rank changes for $k keys")
    println(s"""{"probe":"retract_topn","keys":$k,"outRows":$outRows,"stateRows":$stateRows,"sec":${math.round(sec * 10) / 10.0}}""")
  }

  /** Unbounded left-outer join with TTL over `k` distinct keys, one row per
    * key per side. State = per-key left+right buffers until the TTL. */
  private def probeJoin(spark: SparkSession, k: Long): Unit = {
    import spark.implicits._
    def gen(tag: String, idOff: Long): Dataset[KeyedRow] = {
      val dir = fresh(s"join_${tag}_$k")
      spark.range(0, k).select(
          col("id").as("key"), col("id").as("ts"), (col("id") + idOff).as("id"),
          lit("x").as("kind"), lit(1.0).as("value"))
        .repartition(4).write.parquet(dir)
      spark.readStream
        .schema(org.apache.spark.sql.Encoders.product[KeyedRow].schema)
        .option("maxFilesPerTrigger", 1).parquet(dir)
        .as[KeyedRow]
    }
    val joined = StatefulOps.unboundedLeftOuterJoinWithTtl(
      gen("l", 0L), gen("r", 1000000000L), java.time.Duration.ofMinutes(30))
    // every key ends fully paired: at least one +I per key survives any
    // arrival interleaving, so k is a safe output floor for the poll
    val (outRows, stateRows, sec) = drive(joined, s"join_$k", minOut = k)
    require(stateRows == k, s"join_$k: state rows $stateRows != $k keys")
    require(outRows >= k, s"join_$k: only $outRows emissions for $k keys")
    println(s"""{"probe":"unbounded_join","keys":$k,"outRows":$outRows,"stateRows":$stateRows,"sec":${math.round(sec * 10) / 10.0}}""")
  }

  def main(args: Array[String]): Unit = {
    val depths =
      if (args.nonEmpty) args.toSeq.map(_.toLong)
      else Seq(1000000L, 3000000L, 10000000L)
    val spark = GraftSession.create()
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", Rocks)
    depths.foreach { k =>
      probeTopN(spark, k)
      probeJoin(spark, k)
    }
    spark.stop()
  }
}
