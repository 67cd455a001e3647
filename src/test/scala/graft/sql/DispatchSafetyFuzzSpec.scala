package graft.sql

import graft.SparkSpec

/** Fuzz family 29: front-end DISPATCH SAFETY.
  *
  * The SQL surface is routed by keyword probes over literal/comment-blanked
  * text ([[FlinkSql.blankLiteralsAndComments]] + per-front-end regexes).
  * The regression class that architecture carries is OVERCAPTURE: a
  * statement that merely LOOKS like a front-end shape being swallowed,
  * rewritten, or failed instead of reaching Spark's parser untouched.
  *
  * This family sweeps seeded randomized NEAR-MISS statements — front-end
  * keywords inside string literals (with both '' and \' escapes), inside
  * line and block comments, native DDL without the connector's WITH
  * clause, native hints, INSERTs into non-connector tables, DESCRIBE of
  * plain relations — and asserts each one both RUNS through Spark and
  * returns the exact expected result. A dispatch leak fails loudly with
  * the statement text.
  */
class DispatchSafetyFuzzSpec extends SparkSpec {

  private def lit(r: scala.util.Random): String = {
    // front-end keywords wrapped in literal hazards, with random escapes
    val cores = Seq(
      "CREATE TABLE x (a INT) WITH ('connector' = 'filesystem')",
      "WATERMARK FOR ts AS ts - INTERVAL '5' SECOND",
      "FOR SYSTEM_TIME AS OF t.ts",
      "MATCH_RECOGNIZE (PARTITION BY u)",
      "INSERT OVERWRITE sink PARTITION (p = 'v')",
      "SHOW CATALOGS",
      "USE CATALOG memcat",
      "ALTER FUNCTION f AS 'klass'",
      "DESCRIBE CATALOG c",
      "LIKE base (INCLUDING ALL)",
      "OPTIONS('csv.field-delimiter' = '|')",
      "TUMBLE(ts, INTERVAL '10' MINUTE)")
    val core = cores(r.nextInt(cores.size))
    r.nextInt(3) match {
      case 0 => core.replace("'", "''")   // doubled-quote escape
      case 1 => core.replace("'", "\\'")  // backslash escape
      case _ => core.filterNot(_ == '\'') // no quotes at all
    }
  }

  test("family 29: near-miss statements fall through to Spark untouched on 3 seeds") {
    val s = spark
    import s.implicits._
    val baseSeed = sys.props.get("graft.fuzz.seed")
      .orElse(sys.env.get("GRAFT_FUZZ_SEED")).map(_.toLong).getOrElse(20260813L)
    spark.range(5).selectExpr("id", "CAST(id * 1.5 AS DOUBLE) AS v",
      "CAST(id AS STRING) AS s").createOrReplaceTempView("fz29_t")
    var checked = 0
    (0 until 3).foreach { si =>
      val r = new scala.util.Random(baseSeed + 290 + si)
      (0 until 12).foreach { _ =>
        val payload = lit(r)
        val n = r.nextInt(1000)
        // 1. keyword payload inside a string literal: must come back VERBATIM
        val got = spark.sql(s"SELECT '$payload' AS p, $n AS n FROM fz29_t WHERE id = 0")
          .collect().head
        val expect = payload.replace("''", "'").replace("\\'", "'")
        assert(got.getString(0) == expect && got.getInt(1) == n,
          s"family29 literal roundtrip broke for: $payload")
        // 2. keyword payload inside comments: the query still evaluates
        val c = spark.sql(
          s"-- $payload\nSELECT /* $payload */ sum(id) AS t FROM fz29_t").collect().head
        assert(c.getLong(0) == 10L, s"family29 comment case broke for: $payload")
        checked += 2
      }
    }
    // 3. native statements adjacent to front-end shapes stay native
    spark.sql("CREATE TABLE fz29_native (a INT, b STRING) USING parquet " +
      "LOCATION '" + java.nio.file.Files.createTempDirectory("fz29n") + "'")
    try {
      spark.sql("INSERT INTO fz29_native SELECT 1, 'x'") // non-connector INSERT
      assert(spark.sql("SELECT a, b FROM fz29_native").collect().head.getInt(0) == 1)
      // native DESCRIBE keeps Spark's 3-column shape
      assert(spark.sql("DESCRIBE fz29_native").columns.length == 3)
      // a native join hint is not an OPTIONS hint and must survive
      val j = spark.sql(
        """SELECT /*+ BROADCAST(b) */ count(*) AS n
           FROM fz29_t a JOIN fz29_t b ON a.id = b.id""").collect().head
      assert(j.getLong(0) == 5L)
      // LIKE the SQL predicate (not the DDL clause) stays a predicate
      assert(spark.sql("SELECT count(*) AS n FROM fz29_t WHERE s LIKE '%1%'")
        .collect().head.getLong(0) == 1L)
      checked += 4
    } finally spark.sql("DROP TABLE IF EXISTS fz29_native")
    println(s"[fuzz] family29 checked=$checked")
    assert(checked >= 72)
  }
}
