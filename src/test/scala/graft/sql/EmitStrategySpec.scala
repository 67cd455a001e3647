package graft.sql

import graft.SparkSpec
import java.sql.Timestamp

/** Config-gated early-fire on the SQL TUMBLE window (the reference's
  * WindowEmitStrategy + TABLE_EXEC_EMIT_EARLY_FIRE_*): with the conf unset
  * the query is a plain window aggregate; with it set, the emission log. */
class EmitStrategySpec extends SparkSpec {

  private def fixture(): Unit = {
    val s = spark
    import s.implicits._
    // one user, one 1-hour window [00:00, 01:00): rows at 00:01, 00:12,
    // 00:25, 00:55 with a 10-minute delay → early fires at the 00:12 row
    // (bucket 0→1) and the 00:25 row (1→2); terminal fire at 00:55
    Seq(
      (1L, Timestamp.valueOf("2021-01-01 00:01:00"), 10L, 1.0),
      (1L, Timestamp.valueOf("2021-01-01 00:12:00"), 11L, 5.0),
      (1L, Timestamp.valueOf("2021-01-01 00:25:00"), 12L, 3.0),
      (1L, Timestamp.valueOf("2021-01-01 00:55:00"), 13L, 2.0)
    ).toDF("user_id", "ts", "event_id", "value").createOrReplaceTempView("ef_events")
  }

  private val q =
    """SELECT TUMBLE_START(ts, INTERVAL '1' HOUR) AS w_start, user_id,
              count(*) AS n, max(value) AS mx
       FROM ef_events
       GROUP BY TUMBLE(ts, INTERVAL '1' HOUR), user_id
       ORDER BY user_id, w_start"""

  test("conf unset: plain one-row-per-window aggregate") {
    fixture()
    val rows = spark.sql(q).collect()
    assert(rows.length == 1 && rows(0).getLong(2) == 4L && rows(0).getDouble(3) == 5.0)
  }

  test("conf set: hopping windows explode into covering panes, each firing independently") {
    fixture()
    spark.conf.set(EmitStrategy.DelayConf, "10 minutes")
    spark.conf.set(EmitStrategy.TiebreakConf, "event_id")
    try {
      // 2h windows sliding 1h: rows at 00:01..00:55 land in the [23:00,01:00)
      // and [00:00,02:00) panes → two terminal fires with the same 4 rows
      val rows = spark.sql(
        """SELECT HOP_START(ts, INTERVAL '1' HOUR, INTERVAL '2' HOUR) AS w_start, user_id,
                  count(*) AS n, max(value) AS mx
           FROM ef_events
           GROUP BY HOP(ts, INTERVAL '1' HOUR, INTERVAL '2' HOUR), user_id
           ORDER BY w_start, fire_time""").collect()
      val finals = rows.filter(_.getBoolean(5))
      assert(finals.length == 2 && finals.forall(r => r.getLong(2) == 4L && r.getDouble(3) == 5.0))
    } finally {
      spark.conf.unset(EmitStrategy.DelayConf)
      spark.conf.unset(EmitStrategy.TiebreakConf)
    }
  }

  test("conf set: session windows split on the gap, fire early inside a session") {
    val s = spark
    import s.implicits._
    // 30-min gap, 10-min delay: rows 00:01/00:12/00:25 form session 1 — the
    // 00:12 row crosses the 00:10 boundary (early fire); the 00:25 row also
    // crosses a boundary but is the session's last row, so it emits once,
    // as the terminal fire (end 00:55 = last + gap). The 01:30 row is
    // > 30 min later → its own session (single terminal fire, end 02:00)
    Seq(
      (1L, Timestamp.valueOf("2021-01-01 00:01:00"), 10L, 1.0),
      (1L, Timestamp.valueOf("2021-01-01 00:12:00"), 11L, 5.0),
      (1L, Timestamp.valueOf("2021-01-01 00:25:00"), 12L, 3.0),
      (1L, Timestamp.valueOf("2021-01-01 01:30:00"), 13L, 2.0)
    ).toDF("user_id", "ts", "event_id", "value").createOrReplaceTempView("efs_events")
    spark.conf.set(EmitStrategy.DelayConf, "10 minutes")
    spark.conf.set(EmitStrategy.TiebreakConf, "event_id")
    try {
      val rows = spark.sql(
        """SELECT SESSION_START(ts, INTERVAL '30' MINUTE) AS w_start, user_id,
                  count(*) AS n, max(value) AS mx
           FROM efs_events
           GROUP BY SESSION(ts, INTERVAL '30' MINUTE), user_id
           ORDER BY w_start, fire_time""").collect()
        .map(r => (r.getTimestamp(0), r.getLong(2), r.getDouble(3),
                   r.getTimestamp(4), r.getBoolean(5))).toList
      val s1 = Timestamp.valueOf("2021-01-01 00:01:00")
      val s2 = Timestamp.valueOf("2021-01-01 01:30:00")
      assert(rows == List(
        (s1, 2L, 5.0, Timestamp.valueOf("2021-01-01 00:20:00"), false),
        (s1, 3L, 5.0, Timestamp.valueOf("2021-01-01 00:55:00"), true),
        (s2, 1L, 2.0, Timestamp.valueOf("2021-01-01 02:00:00"), true)))
    } finally {
      spark.conf.unset(EmitStrategy.DelayConf)
      spark.conf.unset(EmitStrategy.TiebreakConf)
    }
  }

  test("conf set: emission log with accumulating early fires and a terminal fire") {
    fixture()
    spark.conf.set(EmitStrategy.DelayConf, "10 minutes")
    spark.conf.set(EmitStrategy.TiebreakConf, "event_id")
    try {
      val rows = spark.sql(q).collect()
        .map(r => (r.getLong(2), r.getDouble(3), r.getBoolean(5))).toList
      assert(rows == List(
        (2L, 5.0, false), // 00:12 crosses the 00:10 boundary: 2 rows so far
        (3L, 5.0, false), // 00:25 crosses 00:20: 3 rows
        (4L, 5.0, true))) // terminal: the full window
    } finally {
      spark.conf.unset(EmitStrategy.DelayConf)
      spark.conf.unset(EmitStrategy.TiebreakConf)
    }
  }

  test("late-fire: late rows re-fire the accumulate, beyond-lateness rows drop") {
    val s = spark
    import s.implicits._
    // arrival order `arr` is deliberately out of event-time order; 1 h
    // tumble, 2 h allowed lateness. Walked by hand:
    //  arr 1  ts 00:10 → on-time W[00:00) ; arr 2  ts 02:30 → on-time
    //  W[02:00), watermark → 02:30 closes W[00:00) ; arr 3  ts 00:20 →
    //  LATE fire of W[00:00) (n=2 @ 02:30) ; arr 4  ts 04:30 → on-time
    //  W[04:00), watermark → 04:30 ; arr 5  ts 00:30 → 04:30 ≥ 01:00+2h →
    //  DROPPED ; arr 6  ts 02:45 → LATE fire of W[02:00) (n=2 @ 04:30)
    Seq(
      (1L, Timestamp.valueOf("2021-01-01 00:10:00"), 10L, 1.0, 1L),
      (1L, Timestamp.valueOf("2021-01-01 02:30:00"), 11L, 5.0, 2L),
      (1L, Timestamp.valueOf("2021-01-01 00:20:00"), 12L, 3.0, 3L),
      (1L, Timestamp.valueOf("2021-01-01 04:30:00"), 13L, 2.0, 4L),
      (1L, Timestamp.valueOf("2021-01-01 00:30:00"), 14L, 9.0, 5L),
      (1L, Timestamp.valueOf("2021-01-01 02:45:00"), 15L, 7.0, 6L)
    ).toDF("user_id", "ts", "event_id", "value", "arr")
      .createOrReplaceTempView("lf_events")
    s.conf.set(EmitStrategy.LateConf, "true")
    s.conf.set(EmitStrategy.LatenessConf, "2 hours")
    s.conf.set(EmitStrategy.ArrivalConf, "arr")
    try {
      val rows = s.sql(
        """SELECT TUMBLE_START(ts, INTERVAL '1' HOUR) AS w_start, user_id,
                  count(*) AS n, max(value) AS mx
           FROM lf_events
           GROUP BY TUMBLE(ts, INTERVAL '1' HOUR), user_id
           ORDER BY w_start, fire_time, is_final""").collect()
        .map(r => (r.getTimestamp(0).toString, r.getLong(2), r.getDouble(3),
          r.getTimestamp(4).toString, r.getBoolean(5))).toList
      assert(rows == List(
        ("2021-01-01 00:00:00.0", 1L, 1.0, "2021-01-01 01:00:00.0", true), // on-time prefix final
        ("2021-01-01 00:00:00.0", 2L, 3.0, "2021-01-01 02:30:00.0", false), // late fire (dropped 00:30 absent)
        ("2021-01-01 02:00:00.0", 1L, 5.0, "2021-01-01 03:00:00.0", true),
        ("2021-01-01 02:00:00.0", 2L, 7.0, "2021-01-01 04:30:00.0", false),
        ("2021-01-01 04:00:00.0", 1L, 2.0, "2021-01-01 05:00:00.0", true)))
    } finally {
      s.conf.unset(EmitStrategy.LateConf)
      s.conf.unset(EmitStrategy.LatenessConf)
      s.conf.unset(EmitStrategy.ArrivalConf)
    }
  }

  test("late-fire plan: the running-max watermark is bucket-parallel, never one global window") {
    val s = spark
    import s.implicits._
    Seq((1L, Timestamp.valueOf("2021-01-01 00:10:00"), 10L, 1.0, 1L))
      .toDF("user_id", "ts", "event_id", "value", "arr")
      .createOrReplaceTempView("lp_events")
    s.conf.set(EmitStrategy.LateConf, "true")
    s.conf.set(EmitStrategy.LatenessConf, "2 hours")
    s.conf.set(EmitStrategy.ArrivalConf, "arr")
    try {
      val plan = s.sql(
        """SELECT TUMBLE_START(ts, INTERVAL '1' HOUR) AS w_start, user_id,
                  count(*) AS n FROM lp_events
           GROUP BY TUMBLE(ts, INTERVAL '1' HOUR), user_id""")
        .queryExecution.executedPlan.toString
      // the per-row running max must hash-partition on the arrival bucket
      // (a global ORDER BY window would collapse 100 TB onto one task);
      // only the ~256-row bucket-summary prefix pass may be unpartitioned
      assert("hashpartitioning\\(__bk".r.findAllIn(plan).length >= 2,
        s"watermark windows must partition on the arrival bucket:\n${plan.take(1500)}")
      assert(!plan.linesIterator.exists(l =>
        l.contains("windowspecdefinition(__arr") && !l.contains("__bk")),
        "no window over global arrival order without the bucket partition")
    } finally {
      s.conf.unset(EmitStrategy.LateConf)
      s.conf.unset(EmitStrategy.LatenessConf)
      s.conf.unset(EmitStrategy.ArrivalConf)
    }
  }

  test("late-fire validations mirror the reference's WindowEmitStrategy checks") {
    val s = spark
    import s.implicits._
    Seq((1L, Timestamp.valueOf("2021-01-01 00:10:00"), 10L, 1.0))
      .toDF("user_id", "ts", "event_id", "value").createOrReplaceTempView("lv_events")
    val tumble = """SELECT count(*) AS n FROM lv_events
                    GROUP BY TUMBLE(ts, INTERVAL '1' HOUR)"""
    s.conf.set(EmitStrategy.LateConf, "true")
    try {
      // lateness unset (reference: requires minIdleStateRetentionTime)
      val e1 = intercept[IllegalArgumentException] { s.sql(tumble) }
      assert(e1.getMessage.contains("allow-lateness"))
      s.conf.set(EmitStrategy.LatenessConf, "2 hours")
      // arrival order unset: the batch log has no notion of lateness without it
      val e2 = intercept[IllegalArgumentException] { s.sql(tumble) }
      assert(e2.getMessage.contains("arrival"))
      // session windows reject EMIT late-fire (reference parity)
      s.conf.set(EmitStrategy.ArrivalConf, "event_id")
      val e3 = intercept[IllegalArgumentException] {
        s.sql("""SELECT count(*) AS n FROM lv_events
                 GROUP BY SESSION(ts, INTERVAL '10' MINUTE)""")
      }
      assert(e3.getMessage.contains("Session window"))
      // early + late combined is out of the deterministic subset
      s.conf.set(EmitStrategy.DelayConf, "10 minutes")
      val e4 = intercept[IllegalArgumentException] { s.sql(tumble) }
      assert(e4.getMessage.contains("combined"))
    } finally {
      s.conf.unset(EmitStrategy.LateConf)
      s.conf.unset(EmitStrategy.LatenessConf)
      s.conf.unset(EmitStrategy.ArrivalConf)
      s.conf.unset(EmitStrategy.DelayConf)
    }
  }
}
