package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** Remaining SURVEY §2 streaming patterns: temporal sort, side outputs,
  * window join, broadcast-state (stream-static join). */
class StreamPatternsSpec extends SparkSpec {

  private def ev(key: Long, ts: Long, id: Long, kind: String = "x") =
    KeyedRow(key, ts, id, kind, 0.0)

  test("temporalSort releases rows in event-time order at the watermark") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val in = MemoryStream[KeyedRow]
    val q = StatefulOps.temporalSort(in.toDS(), "10 seconds")
      .writeStream.format("memory").queryName("tsort").outputMode("append").start()
    try {
      in.addData(ev(1, 3000000, 3), ev(1, 1000000, 1)) // out of order
      q.processAllAvailable()
      in.addData(ev(1, 2000000, 2)) // gap filler, within the 10s delay
      q.processAllAvailable()
      in.addData(ev(1, 60000000, 9)) // advance watermark far past 3s
      q.processAllAvailable()
      in.addData(ev(1, 90000000, 10))
      q.processAllAvailable()
      val ids = s.sql("select id from tsort").collect().map(_.getLong(0)).toSeq
      assert(ids.startsWith(Seq(1L, 2L, 3L)), s"event-time order violated: $ids")
    } finally q.stop()
  }

  test("side outputs: one pass, tagged union, split consumers") {
    val s = spark
    import s.implicits._
    val rows = Seq(ev(1, 1, 1, "error"), ev(1, 2, 2, "view"), ev(2, 3, 3, "error")).toDS()
    val tagged = StatefulOps.tagRows(rows, r => if (r.kind == "error") "err" else "main")
    assert(StatefulOps.sideOutput(tagged, "err").collect().map(_.id).toSet == Set(1L, 3L))
    assert(StatefulOps.sideOutput(tagged, "main").collect().map(_.id).toSet == Set(2L))
  }

  test("window join: same tumbling window + key (JoinedStreams semantics)") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    case class E(ts: Timestamp, user: Long, v: Double)
    val l = MemoryStream[(Timestamp, Long, String)]
    val r = MemoryStream[(Timestamp, Long, String)]
    def t(sec: Long) = new Timestamp(sec * 1000)
    // join within the same 10s tumble: window equality + user equality
    val lw = l.toDF().toDF("lts", "luser", "ltag").withWatermark("lts", "5 seconds")
      .withColumn("w", window(col("lts"), "10 seconds"))
    val rw = r.toDF().toDF("rts", "ruser", "rtag").withWatermark("rts", "5 seconds")
      .withColumn("w2", window(col("rts"), "10 seconds"))
    val joined = lw.join(rw, col("luser") === col("ruser") && col("w") === col("w2"))
      .select(col("luser"), col("ltag"), col("rtag"))
    val q = joined.writeStream.format("memory").queryName("wj").outputMode("append").start()
    try {
      l.addData((t(1), 1L, "a"), (t(15), 1L, "b"))
      r.addData((t(8), 1L, "x"), (t(22), 1L, "y"))
      q.processAllAvailable()
      l.addData((t(60), 9L, "z")); r.addData((t(60), 8L, "z")) // advance watermarks
      q.processAllAvailable()
      val rows = s.sql("select ltag, rtag from wj").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      assert(rows == Set(("a", "x"))) // b@15s and y@22s fall in different windows
    } finally q.stop()
  }

  test("broadcast state pattern: stream enriched by a broadcast static side") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val rules = Seq((1L, "gold"), (2L, "silver")).toDF("user", "tier") // static side
    val in = MemoryStream[KeyedRow]
    val joined = in.toDS().toDF()
      .join(broadcast(rules), col("key") === col("user"), "left")
      .select(col("id"), coalesce(col("tier"), lit("none")).as("tier"))
    val q = joined.writeStream.format("memory").queryName("bs").outputMode("append").start()
    try {
      in.addData(ev(1, 1, 1), ev(2, 2, 2), ev(3, 3, 3))
      q.processAllAvailable()
      val out = s.sql("select id, tier from bs").collect()
        .map(r => (r.getLong(0), r.getString(1))).toMap
      assert(out == Map(1L -> "gold", 2L -> "silver", 3L -> "none"))
    } finally q.stop()
  }
}
