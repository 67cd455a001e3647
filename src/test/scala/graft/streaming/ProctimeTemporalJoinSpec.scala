package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Processing-time temporal join semantics across micro-batches
  * (TemporalProcessTimeJoinOperator.java:48): probes see the latest build
  * version AS OF their batch, never a later one retroactively, and
  * no-version-yet probes are dropped (inner). */
class ProctimeTemporalJoinSpec extends SparkSpec {

  private def row(key: Long, ts: Long, id: Long, kind: String) =
    KeyedRow(key, ts, id, kind, 0.0)

  test("probes join the version current at processing time; state persists; inner drops early probes") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val leftIn = MemoryStream[KeyedRow]
    val rightIn = MemoryStream[KeyedRow]
    val out = StatefulOps.proctimeTemporalJoin(leftIn.toDS(), rightIn.toDS())
      .toDF("key", "probe_id", "version")
    val q = out.writeStream.format("memory").queryName("proctime_tj")
      .outputMode("append").start()
    def got: Set[(Long, Long, String)] =
      spark.table("proctime_tj").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    try {
      // batch 1: version v1 for key 1 + probe on key 1 (build-first within
      // the batch) + probe on key 2 (no version -> dropped)
      rightIn.addData(row(1, 10, 100, "v1"))
      leftIn.addData(row(1, 11, 1, "p"), row(2, 11, 2, "p"))
      q.processAllAvailable()
      assert(got == Set((1L, 1L, "v1")))

      // batch 2: key 1 upgrades to v2 AND probes in the same batch -> v2;
      // key 2 gets its first version
      rightIn.addData(row(1, 20, 101, "v2"), row(2, 20, 102, "w1"))
      leftIn.addData(row(1, 21, 3, "p"))
      q.processAllAvailable()
      assert(got == Set((1L, 1L, "v1"), (1L, 3L, "v2")))

      // batch 3: probes only — key 1 still v2 (state persisted), key 2
      // joins w1 now (but its batch-1 probe stays dropped: no retro-fill)
      leftIn.addData(row(1, 30, 4, "p"), row(2, 30, 5, "p"))
      q.processAllAvailable()
      assert(got == Set((1L, 1L, "v1"), (1L, 3L, "v2"),
        (1L, 4L, "v2"), (2L, 5L, "w1")))

      // batch 4: an out-of-order build row older than the held version
      // must NOT regress the keep-last state
      rightIn.addData(row(1, 5, 99, "v0"))
      leftIn.addData(row(1, 31, 6, "p"))
      q.processAllAvailable()
      assert(got.contains((1L, 6L, "v2")) && !got.exists(_._3 == "v0"))
    } finally q.stop()
  }

  test("round 11: LEFT form null-pads version-less probes, never retro-fills") {
    // TemporalJoinITCase.scala:344 testProcTimeLeftTemporalJoin: a probe
    // whose key has no version yet keeps a null-padded row (inner drops
    // it); when the version later arrives, the old probe is NOT re-emitted
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val leftIn = MemoryStream[KeyedRow]
    val rightIn = MemoryStream[KeyedRow]
    val out = StatefulOps.proctimeTemporalJoin(leftIn.toDS(), rightIn.toDS(), outer = true)
      .toDF("key", "probe_id", "version")
    val q = out.writeStream.format("memory").queryName("proctime_tj_left")
      .outputMode("append").start()
    def got: Set[(Long, Long, Option[String])] =
      spark.table("proctime_tj_left").collect()
        .map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2)))).toSet
    try {
      // key 2 has no version: its probe emits null-padded
      rightIn.addData(row(1, 10, 100, "v1"))
      leftIn.addData(row(1, 11, 1, "p"), row(2, 11, 2, "p"))
      q.processAllAvailable()
      assert(got == Set((1L, 1L, Some("v1")), (2L, 2L, None)))

      // key 2's version arrives: a NEW probe joins it; the old null-padded
      // row stays exactly once (no retro-fill, no duplicate)
      rightIn.addData(row(2, 20, 102, "w1"))
      leftIn.addData(row(2, 21, 3, "p"))
      q.processAllAvailable()
      assert(got == Set((1L, 1L, Some("v1")), (2L, 2L, None), (2L, 3L, Some("w1"))))
    } finally q.stop()
  }
}
