package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

class StreamOpsSpec extends SparkSpec {

  case class Ev(ts: Timestamp, user: Long, v: Double)
  private def t(sec: Long) = new Timestamp(sec * 1000L)

  test("tumbling window agg with watermark drops late rows past the delay") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val in = MemoryStream[Ev]
    val agged = StreamOps.tumbleAgg(
      StreamOps.withEventTime(in.toDF(), "ts", "5 seconds"),
      "ts", "10 seconds", Seq(col("user")), Seq(count(lit(1)).as("n")))
    val q = agged.writeStream.format("memory").queryName("tumble")
      .outputMode("append").start()
    try {
      in.addData(Ev(t(1), 1, 1.0), Ev(t(4), 1, 1.0), Ev(t(12), 1, 1.0))
      q.processAllAvailable()
      in.addData(Ev(t(30), 1, 1.0)) // watermark → 25s: closes [0,10) and [10,20)
      q.processAllAvailable()
      in.addData(Ev(t(2), 1, 99.0)) // late beyond watermark → dropped
      in.addData(Ev(t(45), 1, 1.0)) // push watermark past [30,40)
      q.processAllAvailable()
      in.addData(Ev(t(60), 1, 1.0))
      q.processAllAvailable()
      val rows = s.sql("select w_start, n from tumble order by w_start").collect()
        .map(r => (r.getTimestamp(0).getTime / 1000, r.getLong(1))).toSeq
      assert(rows.contains((0L, 2L)))   // late row NOT counted
      assert(rows.contains((10L, 1L)))
      assert(rows.contains((30L, 1L)))
    } finally q.stop()
  }

  test("session window agg merges rows within the gap") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val in = MemoryStream[Ev]
    val agged = StreamOps.sessionAgg(
      StreamOps.withEventTime(in.toDF(), "ts", "2 seconds"),
      "ts", "5 seconds", Seq(col("user")), Seq(count(lit(1)).as("n")))
      .select(col("session_window.start").as("st"), col("user"), col("n"))
    val q = agged.writeStream.format("memory").queryName("sess")
      .outputMode("append").start()
    try {
      in.addData(Ev(t(1), 1, 1.0), Ev(t(3), 1, 1.0), Ev(t(20), 1, 1.0))
      q.processAllAvailable()
      in.addData(Ev(t(60), 1, 1.0)) // close both sessions
      q.processAllAvailable()
      in.addData(Ev(t(120), 1, 1.0))
      q.processAllAvailable()
      val rows = s.sql("select st, n from sess order by st").collect()
        .map(r => (r.getTimestamp(0).getTime / 1000, r.getLong(1))).toSeq
      assert(rows.take(2) == Seq((1L, 2L), (20L, 1L))) // 1s & 3s merged; 20s separate
    } finally q.stop()
  }

  test("stream-stream interval join joins within the time bound only") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val l = MemoryStream[Ev]
    val r = MemoryStream[Ev]
    val joined = StreamOps.intervalJoin(
      StreamOps.withEventTime(l.toDF().toDF("lts", "luser", "lv"), "lts", "5 seconds"),
      StreamOps.withEventTime(r.toDF().toDF("rts", "ruser", "rv"), "rts", "5 seconds"),
      (col("luser"), col("ruser")), col("lts"), col("rts"), "10 seconds", "10 seconds")
    val q = joined.writeStream.format("memory").queryName("ij")
      .outputMode("append").start()
    try {
      l.addData(Ev(t(10), 1, 1.0))
      r.addData(Ev(t(15), 1, 2.0), Ev(t(50), 1, 3.0))
      q.processAllAvailable()
      val rows = s.sql("select lv, rv from ij").collect().map(r => (r.getDouble(0), r.getDouble(1)))
      assert(rows.toSeq == Seq((1.0, 2.0))) // 50s is outside ±10s of 10s
    } finally q.stop()
  }

  test("dedupFirstWithinWatermark keeps first row per key") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val in = MemoryStream[Ev]
    val deduped = StreamOps.dedupFirstWithinWatermark(
      StreamOps.withEventTime(in.toDF(), "ts", "10 seconds"), Seq("user"))
    val q = deduped.writeStream.format("memory").queryName("dd")
      .outputMode("append").start()
    try {
      in.addData(Ev(t(1), 1, 1.0), Ev(t(2), 1, 2.0), Ev(t(3), 2, 3.0))
      q.processAllAvailable()
      val rows = s.sql("select user, v from dd order by user").collect()
        .map(r => (r.getLong(0), r.getDouble(1)))
      assert(rows.toSeq == Seq((1L, 1.0), (2L, 3.0)))
    } finally q.stop()
  }

  test("update-mode unbounded aggregation re-emits per key") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val in = MemoryStream[Ev]
    val agged = StreamOps.updateAgg(in.toDF(), Seq(col("user")),
      Seq(sum(col("v").cast("decimal(18,2)")).cast("double").as("total")))
    val q = agged.writeStream.format("memory").queryName("upd")
      .outputMode("update").start()
    try {
      in.addData(Ev(t(1), 1, 1.5))
      q.processAllAvailable()
      in.addData(Ev(t(2), 1, 2.5))
      q.processAllAvailable()
      val emitted = s.sql("select total from upd order by total").collect().map(_.getDouble(0))
      assert(emitted.toSeq == Seq(1.5, 4.0)) // accumulator state carried across batches
    } finally q.stop()
  }

  test("watermark idleness policy: an idle input no longer stalls the window") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    // withIdleness analogue: policy=max lets the ACTIVE stream advance the
    // query watermark although the second stream never produces a row
    StreamOps.setWatermarkIdlenessPolicy(s, advanceOnIdle = true)
    try {
      val active = MemoryStream[Ev]
      val idle = MemoryStream[Ev]
      val union = StreamOps.withEventTime(active.toDF(), "ts", "0 seconds")
        .union(StreamOps.withEventTime(idle.toDF(), "ts", "0 seconds"))
      val agged = StreamOps.tumbleAgg(union, "ts", "10 seconds",
        Seq(col("user")), Seq(count(lit(1)).as("n")))
      val q = agged.writeStream.format("memory").queryName("idlewm")
        .outputMode("append").start()
      try {
        active.addData(Ev(t(1), 1, 1.0), Ev(t(4), 1, 1.0))
        q.processAllAvailable()
        active.addData(Ev(t(30), 1, 1.0)) // only the active stream moves time
        q.processAllAvailable()
        active.addData(Ev(t(40), 1, 1.0)) // one more batch applies the new watermark
        q.processAllAvailable()
        val fired = s.sql("select n from idlewm").collect().map(_.getLong(0))
        // under the default min policy the idle stream pins the watermark at
        // -inf and nothing ever fires; with idleness it closes [0,10) → n=2
        assert(fired.contains(2L), s"window must fire despite the idle input; got ${fired.toSeq}")
      } finally q.stop()
    } finally StreamOps.setWatermarkIdlenessPolicy(s, advanceOnIdle = false)
  }
}
