package graft.sql

import graft.SparkSpec
import java.sql.Timestamp

class MatchRecognizeSpec extends SparkSpec {

  private def fixture(): Unit = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, new Timestamp(1000L), "signup"),
      (1L, new Timestamp(2000L), "purchase"),
      (1L, new Timestamp(3000L), "view"),
      (1L, new Timestamp(4000L), "signup"),
      (1L, new Timestamp(5000L), "view"), // breaks strict contiguity
      (1L, new Timestamp(6000L), "purchase"),
      (2L, new Timestamp(1000L), "signup"),
      (2L, new Timestamp(2000L), "purchase")
    ).toDF("user_id", "ts", "event_type").createOrReplaceTempView("mr_events")
  }

  test("MATCH_RECOGNIZE via spark.sql: strict contiguity, skip past last row") {
    fixture()
    val rows = spark.sql(
      """SELECT user_id, start_ts, end_ts, n_rows FROM mr_events
         MATCH_RECOGNIZE (
           PARTITION BY user_id
           ORDER BY ts
           ONE ROW PER MATCH
           AFTER MATCH SKIP PAST LAST ROW
           PATTERN (A B)
           DEFINE A AS event_type = 'signup', B AS event_type = 'purchase'
         ) ORDER BY user_id, start_ts""").collect()
    // user 1: only the adjacent signup→purchase at 1s→2s (4s signup is
    // followed by a view — strict miss); user 2: 1s→2s
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq ==
      Seq((1L, 1000000L, 2000000L, 2L), (2L, 1000000L, 2000000L, 2L)))
  }

  test("WITHIN bound excludes slow sequences") {
    fixture()
    val rows = spark.sql(
      """SELECT user_id, start_ts FROM mr_events
         MATCH_RECOGNIZE (
           PARTITION BY user_id
           ORDER BY ts
           ONE ROW PER MATCH
           AFTER MATCH SKIP PAST LAST ROW
           PATTERN (A B)
           WITHIN INTERVAL '1' SECOND
           DEFINE A AS event_type = 'signup', B AS event_type = 'purchase'
         ) ORDER BY user_id""").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L)) // 1s gaps are exactly within
  }

  test("unsupported quantifiers are rejected loudly") {
    fixture()
    val e = intercept[Exception] {
      spark.sql(
        """SELECT user_id FROM mr_events MATCH_RECOGNIZE (
             PARTITION BY user_id ORDER BY ts ONE ROW PER MATCH
             PATTERN (A+ B) DEFINE A AS true, B AS true)""").collect()
    }
    assert(e.getMessage.contains("quantifiers") || e.getMessage.contains("unsupported"))
  }
}
