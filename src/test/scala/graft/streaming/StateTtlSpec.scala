package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.time.Duration

class StateTtlSpec extends SparkSpec {

  private def row(key: Long, ts: Long, id: Long, v: Double) = KeyedRow(key, ts, id, "x", v)

  test("idle-state retention evicts keys after the TTL, state restarts fresh") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val in = MemoryStream[KeyedRow]
    val q = StatefulOps.dedupKeepLastWithTtl(in.toDS(), Duration.ofMillis(500))
      .writeStream.format("memory").queryName("ttl").outputMode("update").start()
    // with ProcessingTimeTimeout the engine keeps scheduling timeout-check
    // batches, so processAllAvailable never quiesces — poll the sink instead
    def awaitEmit(id: Long): Unit = {
      val deadline = System.nanoTime() + 30L * 1000000000L
      while (!s.sql(s"select * from ttl").as[LastRowEmit].collect().exists(_.id == id)) {
        if (q.exception.isDefined) throw q.exception.get
        assert(System.nanoTime() < deadline, s"row id=$id never emitted")
        Thread.sleep(100)
      }
    }
    try {
      in.addData(row(1, 100, 1, 1.0))
      awaitEmit(1)
      Thread.sleep(1200) // idle past the retention window → key 1 evicted
      in.addData(row(2, 50, 2, 2.0)) // unrelated key keeps the stream moving
      awaitEmit(2)
      // key 1's state was evicted, so an OLDER row now wins (fresh state);
      // were the state still present, this stale row would never be emitted
      in.addData(row(1, 10, 3, 3.0))
      awaitEmit(3)
      val key1Ids = s.sql("select * from ttl").as[LastRowEmit].collect()
        .filter(_.key == 1L).map(_.id).toSet
      assert(key1Ids == Set(1L, 3L))
    } finally q.stop()
  }

  test("stream-stream left semi join (streaming IN/EXISTS)") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    import org.apache.spark.sql.functions._
    val l = MemoryStream[KeyedRow]
    val r = MemoryStream[KeyedRow]
    val lw = l.toDF().withColumn("lts", timestamp_micros(col("ts")))
      .withWatermark("lts", "10 seconds")
    val rw = r.toDF().toDF("rkey", "rts0", "rid", "rkind", "rvalue")
      .withColumn("rts", timestamp_micros(col("rts0")))
      .withWatermark("rts", "10 seconds")
    val joined = lw.join(rw,
      col("key") === col("rkey") &&
        col("rts") >= col("lts") - expr("INTERVAL 5 SECONDS") &&
        col("rts") <= col("lts") + expr("INTERVAL 5 SECONDS"),
      "left_semi")
    val q = joined.select("id").writeStream.format("memory")
      .queryName("ss_semi").outputMode("append").start()
    try {
      l.addData(KeyedRow(1, 1000000, 1, "x", 0), KeyedRow(2, 1000000, 2, "x", 0))
      r.addData(KeyedRow(1, 2000000, 9, "x", 0)) // matches key 1 within ±5s
      q.processAllAvailable()
      l.addData(KeyedRow(9, 60000000, 99, "x", 0)) // advance watermarks
      r.addData(KeyedRow(9, 60000000, 98, "x", 0))
      q.processAllAvailable()
      val ids = s.sql("select id from ss_semi").collect().map(_.getLong(0)).toSet
      assert(ids.contains(1L) && !ids.contains(2L))
    } finally q.stop()
  }
}
