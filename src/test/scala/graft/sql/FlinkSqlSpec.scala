package graft.sql

import graft.SparkSpec

class FlinkSqlSpec extends SparkSpec {

  test("rewriter maps the Flink group-window dialect onto Spark syntax") {
    assert(FlinkSql.rewrite("GROUP BY TUMBLE(ts, INTERVAL '10' MINUTE)")
      == "GROUP BY window(ts, '10 minute')")
    assert(FlinkSql.rewrite("SELECT TUMBLE_START(ts, INTERVAL '10' MINUTE)")
      == "SELECT window.start")
    // HOP flips (time, slide, size) → window(time, size, slide)
    assert(FlinkSql.rewrite("HOP(ts, INTERVAL '1' HOUR, INTERVAL '2' HOUR)")
      == "window(ts, '2 hour', '1 hour')")
    assert(FlinkSql.rewrite("SESSION(ts, INTERVAL '30' MINUTE)")
      == "session_window(ts, '30 minute')")
    // untouched SQL passes through verbatim
    val plain = "SELECT a, count(*) FROM t WHERE b IN ('TUMBLEWEED') GROUP BY a"
    assert(FlinkSql.rewrite(plain) == plain)
    // nested expressions survive
    assert(FlinkSql.rewrite("TUMBLE(coalesce(ts, ts2), INTERVAL '5' SECOND)")
      == "window(coalesce(ts, ts2), '5 second')")
  }

  test("dialect queries execute through the injected parser") {
    graft.Tables.registerAll(spark, sf)
    val df = spark.sql(
      """SELECT TUMBLE_START(ts, INTERVAL '1' HOUR) AS w_start, count(*) AS n
         FROM events GROUP BY TUMBLE(ts, INTERVAL '1' HOUR)""")
    assert(df.count() > 0)
    assert(df.columns.toSeq == Seq("w_start", "n"))
  }
}
