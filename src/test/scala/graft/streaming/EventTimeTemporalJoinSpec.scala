package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The EVENT-time streaming temporal join (StatefulOps.eventTimeTemporalJoin
  * — TemporalRowTimeJoinOperator.java:77): watermark-driven resolution,
  * out-of-order version arrival inside the delay, inner/left keyword forms,
  * and the reference's version-cleanup rule. */
class EventTimeTemporalJoinSpec extends SparkSpec {

  private val sec = 1000000L
  private def row(key: Long, tsSec: Long, id: Long, kind: String = "x") =
    KeyedRow(key, tsSec * sec, id, kind, id.toDouble)

  test("probes wait for the watermark; an out-of-order version inside the delay still wins") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val probes = MemoryStream[KeyedRow]
    val versions = MemoryStream[KeyedRow]
    val q = StatefulOps.eventTimeTemporalJoin(
        probes.toDS(), versions.toDS(), watermarkDelay = "1000 seconds")
      .writeStream.format("memory").queryName("ett").outputMode("append").start()
    def got: Set[(Long, Long, Option[Long])] =
      s.sql("select * from ett").as[AsOfStreamEmit].collect()
        .map(e => (e.key, e.probe_id, e.version_id)).toSet
    try {
      // batch 1: version v100@10s, probes @15s and @30s — nothing resolves
      // (watermark far behind under the 1000s delay)
      versions.addData(row(1, 10, 100))
      probes.addData(row(1, 15, 1), row(1, 30, 2), row(2, 40, 3))
      q.processAllAvailable()
      assert(got.isEmpty, "no probe may resolve before the watermark passes it")
      // batch 2: version v101@20s arrives AFTER the @30s probe was seen —
      // out of order across batches but inside the delay; it must be the
      // @30s probe's version
      versions.addData(row(1, 20, 101))
      q.processAllAvailable()
      assert(got.isEmpty)
      // batch 3+: a far-future sentinel probe advances the shared watermark
      probes.addData(row(9, 100000, 999))
      q.processAllAvailable()
      probes.addData(row(9, 200000, 998))
      q.processAllAvailable()
      // inner: probe 3 (key 2, no versions) DROPS; key 2's state removes
      // entirely (no versions, no pending probes) — state keys = {1, 9}
      assert(got == Set((1L, 1L, Some(100L)), (1L, 2L, Some(101L))),
        s"got $got")
      assert(q.lastProgress.stateOperators.head.numRowsTotal == 2,
        s"state keys: ${q.lastProgress.stateOperators.head.numRowsTotal}")
      // version cleanup (TemporalRowTimeJoinOperator's rule): key 1 keeps
      // the single NEWEST at-or-below-watermark version — a later probe
      // must still join v101 through the retained history
      probes.addData(row(1, 199500, 4))
      q.processAllAvailable()
      probes.addData(row(9, 300000, 997))
      q.processAllAvailable()
      assert(got.contains((1L, 4L, Some(101L))),
        s"the retained below-watermark version must serve later probes: $got")
    } finally q.stop()
  }

  test("LEFT form null-pads versionless probes; batch run equals the streaming result") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val data = Seq(row(1, 10, 100, "v"), row(1, 20, 101, "v"))
    val probeData = Seq(row(1, 15, 1), row(1, 30, 2), row(2, 40, 3))
    // streaming, outer
    val probes = MemoryStream[KeyedRow]
    val versions = MemoryStream[KeyedRow]
    // a real delay: the running query may trigger BETWEEN the two addData
    // calls below, and with delay 0 the versions-only batch would advance
    // the watermark past the earliest probe (a correct late-drop — but not
    // what this test is about)
    val q = StatefulOps.eventTimeTemporalJoin(
        probes.toDS(), versions.toDS(), outer = true, watermarkDelay = "100 seconds")
      .writeStream.format("memory").queryName("ettl").outputMode("append").start()
    try {
      versions.addData(data: _*)
      probes.addData(probeData: _*)
      q.processAllAvailable()
      probes.addData(row(9, 100000, 999))
      q.processAllAvailable()
      probes.addData(row(9, 200000, 998))
      q.processAllAvailable()
      val streamed = s.sql("select * from ettl").as[AsOfStreamEmit].collect()
        .filter(_.key < 9).sortBy(e => (e.key, e.probe_id)).toSeq
      // bounded-batch run of the same operator on the same rows
      val batch = StatefulOps.eventTimeTemporalJoin(
          probeData.toDS(), data.toDS(), outer = true)
        .collect().sortBy(e => (e.key, e.probe_id)).toSeq
      assert(streamed == batch, s"stream $streamed != batch $batch")
      assert(batch.map(e => (e.key, e.probe_id, e.version_id)) ==
        Seq((1L, 1L, Some(100L)), (1L, 2L, Some(101L)), (2L, 3L, None)))
    } finally q.stop()
  }

  test("round 12: idle-retention evicts retained versions of keys with no pending probes") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val probes = MemoryStream[KeyedRow]
    val versions = MemoryStream[KeyedRow]
    // retention = 50s of watermark progress past the last activity
    val q = StatefulOps.eventTimeTemporalJoin(
        probes.toDS(), versions.toDS(), watermarkDelay = "0 seconds",
        idleRetentionMs = Some(50000L))
      .writeStream.format("memory").queryName("ettidle").outputMode("append").start()
    try {
      // key 1 gets versions but never another probe after resolution
      versions.addData(row(1, 10, 100))
      probes.addData(row(1, 15, 1))
      q.processAllAvailable()
      // sentinel probes march the watermark forward; key 1's probe resolves,
      // leaving only its retained version row + an idle deadline
      probes.addData(row(9, 100, 999))
      q.processAllAvailable()
      probes.addData(row(9, 200, 998))
      q.processAllAvailable()
      val got = s.sql("select * from ettidle").as[AsOfStreamEmit].collect()
        .map(e => (e.key, e.probe_id, e.version_id)).toSet
      assert(got.contains((1L, 1L, Some(100L))))
      // watermark is now ~200s; deadline was ≤ 200s+50s. March past it.
      probes.addData(row(9, 400, 997))
      q.processAllAvailable()
      probes.addData(row(9, 600, 996))
      q.processAllAvailable()
      // key 1's state (version rows only) must be evicted; key 9 remains
      val stateKeys = q.lastProgress.stateOperators.head.numRowsTotal
      assert(stateKeys == 1, s"idle key 1 must evict, state keys = $stateKeys")
    } finally q.stop()
  }

  test("round 12: merged buffers resolve a deep same-batch history correctly") {
    val s = spark
    import s.implicits._
    // bounded run, interleaved out-of-order arrival: versions every 10s,
    // probes offset by 5s — each probe must join the version just below it
    val vs = (1 to 50).map(i => row(1, i * 10, 1000 + i, "v"))
    val ps = (1 to 50).map(i => row(1, i * 10 + 5, i))
    val out = StatefulOps.eventTimeTemporalJoin(
        ps.reverse.toDS(), vs.reverse.toDS())
      .collect().sortBy(_.probe_id)
    assert(out.length == 50)
    out.foreach(e => assert(e.version_id.contains(1000 + e.probe_id),
      s"probe ${e.probe_id} joined ${e.version_id}"))
  }
}
