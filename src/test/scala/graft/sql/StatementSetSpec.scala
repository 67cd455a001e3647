package graft.sql

import graft.SparkSpec

/** StatementSet: buffered multi-INSERT execution with shared-source reuse
  * (the reference's TableEnvironment.createStatementSet surface). */
class StatementSetSpec extends SparkSpec {

  private def freshSink(name: String, cols: String): String = {
    val path = s"target/test_sink/$name"
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(rm))
      f.delete(): Unit
    }
    rm(new java.io.File(path))
    spark.sql(s"""CREATE TABLE $name ($cols)
                  WITH ('connector' = 'filesystem', 'path' = '$path',
                        'format' = 'parquet')""")
    path
  }

  test("two inserts from one source: both sinks written, source detected as shared") {
    val s = spark
    import s.implicits._
    Seq((1L, "a"), (2L, "b"), (3L, "a")).toDF("id", "tag")
      .createOrReplaceTempView("ss_src")
    freshSink("ss_out1", "tag STRING, n BIGINT")
    freshSink("ss_out2", "mx BIGINT")
    val shared = StatementSet.create(spark)
      .addInsertSql("INSERT INTO ss_out1 SELECT tag, count(*) AS n FROM ss_src GROUP BY tag")
      .addInsertSql("INSERT INTO ss_out2 SELECT max(id) AS mx FROM ss_src")
      .execute()
    assert(shared == Seq("ss_src"), "the common source must be cached around the batch")
    assert(spark.table("ss_out1").collect().map(r => (r.getString(0), r.getLong(1))).toSet
      == Set(("a", 2L), ("b", 1L)))
    assert(spark.table("ss_out2").collect().map(_.getLong(0)).toSeq == Seq(3L))
    // the cache is released after execute()
    assert(spark.table("ss_src").storageLevel == org.apache.spark.storage.StorageLevel.NONE)
  }

  test("a statement reading from its own sink still exposes that table as a shared source") {
    val s = spark
    import s.implicits._
    // stmt 2 both reads from and inserts into ss_acc; ss_acc is also read by
    // stmt 1 — subtracting the sink name from a whole-plan collect used to
    // erase the genuine source reference and skip the shared-scan cache
    Seq((1L, "x")).toDF("id", "tag").createOrReplaceTempView("ss_acc")
    freshSink("ss_out4", "tag STRING")
    val set = StatementSet.create(spark)
      .addInsertSql("INSERT INTO ss_out4 SELECT tag FROM ss_acc")
      .addInsertSql("INSERT INTO ss_acc SELECT id + 1, tag FROM ss_acc")
    assert(set.sharedTables == Seq("ss_acc"))
  }

  test("single-source statements share nothing; non-INSERT statements are rejected") {
    val s = spark
    import s.implicits._
    Seq(1L).toDF("id").createOrReplaceTempView("ss_only")
    freshSink("ss_out3", "id BIGINT")
    val shared = StatementSet.create(spark)
      .addInsertSql("INSERT INTO ss_out3 SELECT id FROM ss_only")
      .execute()
    assert(shared.isEmpty)
    intercept[IllegalArgumentException] {
      StatementSet.create(spark).addInsertSql("SELECT 1")
    }
  }
}
