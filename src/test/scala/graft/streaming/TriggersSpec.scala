package graft.streaming

import graft.SparkSpec
import Triggers._

/** Trigger/evictor composition semantics on hand fixtures (the reference's
  * CountTrigger/DeltaTrigger/ContinuousEventTimeTrigger × CountEvictor/
  * TimeEvictor/DeltaEvictor matrix). */
class TriggersSpec extends SparkSpec {

  private def ev(key: Long, ts: Long, id: Long, v: Double) = KeyedRow(key, ts, id, "x", v)
  private val W = 1000000L // 1s windows

  private def run(rows: Seq[KeyedRow], t: WinTrigger, e: WinEvictor): Seq[TriggerEmit] = {
    val s = spark
    import s.implicits._
    triggeredTumbleWindows(rows.toDS(), W, t, e).collect().toSeq
      .sortBy(x => (x.key, x.win_start, x.fire_seq))
  }

  test("CountTrigger fires every n rows; leftovers are discarded at close") {
    val rows = (1 to 7).map(i => ev(1, i.toLong * 1000, i.toLong, i.toDouble))
    val out = run(rows, CountTrigger(3), NoEvictor)
    // 7 rows in one window: fires at rows 3 and 6; row 7 is discarded
    assert(out.map(_.n_buf) == Seq(3L, 6L)) // no evictor → buffer keeps growing
    assert(out.map(_.last_id) == Seq(3L, 6L))
  }

  test("CountEvictor caps the aggregated buffer and removes evicted rows") {
    val rows = (1 to 6).map(i => ev(1, i.toLong * 1000, i.toLong, i.toDouble))
    val out = run(rows, CountTrigger(3), CountEvictor(2))
    assert(out.map(_.n_buf) == Seq(2L, 2L))
    assert(out.map(_.max_value) == Seq(3.0, 6.0)) // last-2 buffers {2,3}, {5,6}
  }

  test("DeltaTrigger fires when the delta from the last fire exceeds the threshold") {
    val rows = Seq(ev(1, 1000, 1, 10.0), ev(1, 2000, 2, 10.5),
      ev(1, 3000, 3, 14.0), ev(1, 4000, 4, 14.2), ev(1, 5000, 5, 20.0))
    val out = run(rows, DeltaTrigger(3.0, (a, b) => math.abs(b.value - a.value)), NoEvictor)
    // ref point starts at v=10: fires at v=14 (Δ4) then at v=20 (Δ6 from 14)
    assert(out.map(_.last_id) == Seq(3L, 5L))
  }

  test("ContinuousEventTimeTrigger fires on interval boundaries and at close") {
    // 4s window-width rows inside one 1s-width window? use bigger window:
    val rows = Seq(ev(1, 100000, 1, 1.0), ev(1, 200000, 2, 2.0),
      ev(1, 450000, 3, 3.0), ev(1, 900000, 4, 4.0))
    val s = spark
    import s.implicits._
    val out = triggeredTumbleWindows(rows.toDS(), W,
      ContinuousEventTimeTrigger(400000L), NoEvictor).collect().toSeq.sortBy(_.fire_seq)
    // boundary at 400ms crossed by row 3 (ts 450ms) → early fire of {1,2,3};
    // boundary 800ms crossed by row 4 → fire {1..4}; terminal fire at close
    assert(out.map(_.n_buf) == Seq(3L, 4L, 4L))
  }

  test("TimeEvictor keeps only the trailing time span") {
    val rows = Seq(ev(1, 100000, 1, 9.0), ev(1, 150000, 2, 1.0),
      ev(1, 500000, 3, 2.0), ev(1, 520000, 4, 3.0), ev(1, 540000, 5, 1.5),
      ev(1, 560000, 6, 0.5))
    val out = run(rows, CountTrigger(6), TimeEvictor(100000L))
    // fire on row 6: only rows within 100ms of ts=560ms survive → {3,4,5,6}?
    // 560-500=60 ≤ 100 → rows 3..6 kept; max = 3.0
    assert(out.map(x => (x.n_buf, x.max_value)) == Seq((4L, 3.0)))
  }
}
