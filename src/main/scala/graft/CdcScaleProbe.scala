package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.CdcFormats

/** Scale probe for the CDC changelog formats: generate a synthetic
  * consistent changelog DISTRIBUTED (spark.range — never through the
  * driver), encode it to debezium-json text files, decode + net-count fold,
  * and assert the surviving state EXACTLY (count + keyed checksums).
  *
  * The decode is a no-shuffle projection pipeline, so wall-clock should
  * track message volume linearly; the fold adds exactly one hash shuffle.
  * Run at two decades to pin the curve (BASELINE.md table).
  *
  * Usage: runMain graft.CdcScaleProbe [nUsers ...]   (default 250000 2500000)
  * Per user: +I, 3 × (-U,+U), and users ≡0 (mod 3) a trailing -D
  * → 8 changelog rows/user ≈ 8 messages/user after the lossy encoding.
  */
object CdcScaleProbe {

  private def rm(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(rm))
    f.delete(): Unit
  }

  def main(args: Array[String]): Unit = {
    val depths = if (args.nonEmpty) args.map(_.toLong).toSeq else Seq(250000L, 2500000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val V = 4 // versions per user

    depths.foreach { users =>
      val dir = new java.io.File(s"target/cdc_probe/u$users")
      rm(dir)
      // changelog rows: (kind, k, seq, v) with v = k*10 + seq (exact asserts)
      val versions = spark.range(users * V).select(
        (col("id") / V).cast("long").as("k"),
        (col("id") % V + 1).as("seq"))
        .withColumn("v", col("k") * 10 + col("seq"))
      val ups = versions.select(explode(
        when(col("seq") === 1, array(struct(lit("+I").as("kind"), col("k"), col("seq"), col("v"))))
          .otherwise(array(
            struct(lit("-U").as("kind"), col("k"), (col("seq") - 1).as("seq"),
              (col("k") * 10 + col("seq") - 1).as("v")),
            struct(lit("+U").as("kind"), col("k"), col("seq"), col("v"))))).as("e"))
        .select("e.*")
      val dels = spark.range(users).filter(col("id") % 3 === 0).select(
        lit("-D").as("kind"), col("id").as("k"), lit(V.toLong).as("seq"),
        (col("id") * 10 + V).as("v"))
      val changelog = ups.unionAll(dels)

      // encode is a pure projection over the changelog (to_json of a
      // kind-mapped struct) — the plan must stay shuffle-free; at 100 TB
      // the encode cost is the JSON serialization itself, map-side only
      val encoded = CdcFormats.toDebeziumJson(changelog)
      assert(!encoded.queryExecution.executedPlan.toString.contains("Exchange"),
        "debezium encode must stay shuffle-free")
      val t0 = System.nanoTime()
      encoded.write.mode("overwrite").text(dir.getPath)
      val tEnc = (System.nanoTime() - t0) / 1e9

      val rowSchema = StructType(Seq(StructField("k", LongType),
        StructField("seq", LongType), StructField("v", LongType)))
      val t1 = System.nanoTime()
      val decoded = CdcFormats.debeziumJson(
        spark.read.text(dir.getPath).toDF("value"), "value", rowSchema)
      val survivors = decoded.groupBy("k", "seq", "v")
        .agg(sum(when(col("kind").isin("+I", "+U"), 1).otherwise(-1)).as("net"))
        .filter(col("net") > 0)
      val agg = survivors.agg(count(lit(1)).as("n"), sum("k").as("sk"),
        sum("seq").as("ss"), sum("v").as("sv")).head
      val tDec = (System.nanoTime() - t1) / 1e9

      // expected: every user with k % 3 != 0 survives at (seq=V, v=k*10+V)
      val live = (0L until users).count(_ % 3 != 0).toLong
      val sumK = (0L until users).filter(_ % 3 != 0).sum
      assert(agg.getLong(0) == live, s"count ${agg.getLong(0)} != $live")
      assert(agg.getLong(1) == sumK, "sum(k) mismatch")
      assert(agg.getLong(2) == live * V, "sum(seq) mismatch")
      assert(agg.getLong(3) == sumK * 10 + live * V, "sum(v) mismatch")

      // round 13: decode the SAME files with readable metadata requested —
      // the wider parse schema + appended projections must stay shuffle-free
      // and leave the fold unchanged (metadata-less envelopes → NULLs)
      val t2 = System.nanoTime()
      val decodedMeta = CdcFormats.debeziumJson(
        spark.read.text(dir.getPath).toDF("value"), "value", rowSchema,
        metadata = Seq("ingestion-timestamp", "source.table", "source.properties"))
      assert(!decodedMeta.queryExecution.executedPlan.toString.contains("Exchange"),
        "metadata decode must stay shuffle-free")
      val survMeta = decodedMeta.groupBy("k", "seq", "v")
        .agg(sum(when(col("kind").isin("+I", "+U"), 1).otherwise(-1)).as("net"))
        .filter(col("net") > 0)
        .agg(count(lit(1))).head.getLong(0)
      val tMeta = (System.nanoTime() - t2) / 1e9
      assert(survMeta == live, s"metadata-decode survivors $survMeta != $live")

      val msgs = users * (1 + 2 * (V - 1)) + (users + 2) / 3
      println(s"""{"probe":"cdc_debezium","users":$users,"messages":$msgs,""" +
        s""""encode_sec":${f"$tEnc%.1f"},"decode_fold_sec":${f"$tDec%.1f"},""" +
        s""""decode_meta_sec":${f"$tMeta%.1f"},"survivors":$live,"exact":true}""")
      rm(dir)
    }

    // round 15: the OTHER two formats' encode+decode paths at the top
    // decade — same changelog, same fold asserts, same shuffle-free encode
    // plan requirement (both encoders are map-side to_json projections)
    val users = depths.max
    Seq(
      ("canal",
        (df: org.apache.spark.sql.DataFrame) => CdcFormats.toCanalJson(df),
        (raw: org.apache.spark.sql.DataFrame, sc: StructType) =>
          CdcFormats.canalJson(raw, "value", sc)),
      ("maxwell",
        (df: org.apache.spark.sql.DataFrame) => CdcFormats.toMaxwellJson(df),
        (raw: org.apache.spark.sql.DataFrame, sc: StructType) =>
          CdcFormats.maxwellJson(raw, "value", sc))
    ).foreach { case (fmt, enc, dec) =>
      val dir = new java.io.File(s"target/cdc_probe/${fmt}_u$users")
      rm(dir)
      val versions = spark.range(users * V).select(
        (col("id") / V).cast("long").as("k"),
        (col("id") % V + 1).as("seq"))
        .withColumn("v", col("k") * 10 + col("seq"))
      val ups = versions.select(explode(
        when(col("seq") === 1, array(struct(lit("+I").as("kind"), col("k"), col("seq"), col("v"))))
          .otherwise(array(
            struct(lit("-U").as("kind"), col("k"), (col("seq") - 1).as("seq"),
              (col("k") * 10 + col("seq") - 1).as("v")),
            struct(lit("+U").as("kind"), col("k"), col("seq"), col("v"))))).as("e"))
        .select("e.*")
      val dels = spark.range(users).filter(col("id") % 3 === 0).select(
        lit("-D").as("kind"), col("id").as("k"), lit(V.toLong).as("seq"),
        (col("id") * 10 + V).as("v"))
      val changelog = ups.unionAll(dels)
      val encoded = enc(changelog)
      assert(!encoded.queryExecution.executedPlan.toString.contains("Exchange"),
        s"$fmt encode must stay shuffle-free")
      val t0 = System.nanoTime()
      encoded.write.mode("overwrite").text(dir.getPath)
      val tEnc = (System.nanoTime() - t0) / 1e9
      val rowSchema = StructType(Seq(StructField("k", LongType),
        StructField("seq", LongType), StructField("v", LongType)))
      val t1 = System.nanoTime()
      val decoded = dec(spark.read.text(dir.getPath).toDF("value"), rowSchema)
      val agg = decoded.groupBy("k", "seq", "v")
        .agg(sum(when(col("kind").isin("+I", "+U"), 1).otherwise(-1)).as("net"))
        .filter(col("net") > 0)
        .agg(count(lit(1)).as("n"), sum("k").as("sk"),
          sum("seq").as("ss"), sum("v").as("sv")).head
      val tDec = (System.nanoTime() - t1) / 1e9
      val live = (0L until users).count(_ % 3 != 0).toLong
      val sumK = (0L until users).filter(_ % 3 != 0).sum
      assert(agg.getLong(0) == live, s"$fmt count ${agg.getLong(0)} != $live")
      assert(agg.getLong(1) == sumK, s"$fmt sum(k) mismatch")
      assert(agg.getLong(2) == live * V, s"$fmt sum(seq) mismatch")
      assert(agg.getLong(3) == sumK * 10 + live * V, s"$fmt sum(v) mismatch")
      val msgs = users * (1 + 2 * (V - 1)) + (users + 2) / 3
      println(s"""{"probe":"cdc_$fmt","users":$users,"messages":$msgs,""" +
        s""""encode_sec":${f"$tEnc%.1f"},"decode_fold_sec":${f"$tDec%.1f"},""" +
        s""""survivors":$live,"exact":true}""")
      rm(dir)
    }
    GraftSession.shutdown(spark)
  }
}
