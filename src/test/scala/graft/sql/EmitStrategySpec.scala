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
}
