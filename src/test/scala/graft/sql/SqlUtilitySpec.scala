package graft.sql

import graft.SparkSpec

/** OPTIONS hint, CREATE TABLE ... LIKE, and utility-statement spellings —
  * the round-12 SQL-surface additions (reference semantics:
  * CatalogSourceTable.java:242-259, SqlTableLike.java:104,
  * MergeTableLikeUtil.java:185-206, TableEnvironmentImpl.executeSql). */
class SqlUtilitySpec extends SparkSpec {

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  private def writePipeCsv(dir: String): Unit = {
    val s = spark
    import s.implicits._
    Seq(("click", 1L, 2.5), ("view", 2L, 1.0), ("click", 3L, 4.0))
      .toDF("etype", "eid", "v")
      .coalesce(1).write.mode("overwrite").option("sep", "|").csv(dir)
  }

  test("OPTIONS hint overrides the registered csv delimiter for one query") {
    val dir = freshDir("opthint")
    writePipeCsv(dir)
    spark.conf.set(OptionsHint.ConfKey, "true")
    try {
      spark.sql(s"""CREATE TABLE hint_ev (etype STRING, eid BIGINT, v DOUBLE)
                    WITH ('connector' = 'filesystem', 'path' = '$dir',
                          'format' = 'csv', 'csv.field-delimiter' = ',')""")
      val rows = spark.sql(
        """SELECT etype, count(*) AS n, sum(v) AS sv
           FROM hint_ev /*+ OPTIONS('csv.field-delimiter' = '|') */
           GROUP BY etype ORDER BY etype""").collect()
      assert(rows.map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq ==
        Seq(("click", 2L, 6.5), ("view", 1L, 1.0)))
      // the registration itself is untouched: an unhinted read still uses
      // the (wrong for this file) comma delimiter → values land in col 1
      val unhinted = spark.sql("SELECT * FROM hint_ev").collect()
      assert(unhinted.forall(r => r.isNullAt(1) || r.getString(0).contains("|")))
    } finally spark.conf.unset(OptionsHint.ConfKey)
  }

  test("OPTIONS hint with an explicit alias after the hint") {
    val dir = freshDir("opthint2")
    writePipeCsv(dir)
    spark.conf.set(OptionsHint.ConfKey, "true")
    try {
      spark.sql(s"""CREATE TABLE hint_ev2 (etype STRING, eid BIGINT, v DOUBLE)
                    WITH ('connector' = 'filesystem', 'path' = '$dir',
                          'format' = 'csv')""")
      val n = spark.sql(
        """SELECT count(*) AS n
           FROM hint_ev2 /*+ OPTIONS('csv.field-delimiter' = '|') */ AS e
           WHERE e.eid > 1""").collect().head.getLong(0)
      assert(n == 2L)
    } finally spark.conf.unset(OptionsHint.ConfKey)
  }

  test("OPTIONS hint without the enabling conf throws the reference's error") {
    val dir = freshDir("opthint3")
    writePipeCsv(dir)
    spark.sql(s"""CREATE TABLE hint_ev3 (etype STRING, eid BIGINT, v DOUBLE)
                  WITH ('connector' = 'filesystem', 'path' = '$dir', 'format' = 'csv')""")
    val e = intercept[Exception] {
      spark.sql("SELECT count(*) FROM hint_ev3 /*+ OPTIONS('csv.field-delimiter' = '|') */")
    }
    assert(e.getMessage.contains("table.dynamic-table-options.enabled"))
  }

  test("OPTIONS hint on a non-connector table is a pointed error") {
    spark.conf.set(OptionsHint.ConfKey, "true")
    try {
      spark.range(3).createOrReplaceTempView("plain_view")
      val e = intercept[Exception] {
        spark.sql("SELECT count(*) FROM plain_view /*+ OPTIONS('k' = 'v') */")
      }
      assert(e.getMessage.contains("not a registered connector table"))
    } finally spark.conf.unset(OptionsHint.ConfKey)
  }

  test("a string literal containing the hint spelling is NOT a hint") {
    // no conf enabled — if the literal dispatched as a hint this would
    // throw the conf-gate error instead of returning the literal
    val v = spark.sql("SELECT '/*+ OPTIONS(''k''=''v'') */' AS s").collect().head.getString(0)
    assert(v == "/*+ OPTIONS('k'='v') */")
  }

  test("CREATE TABLE LIKE inherits options; derived WITH overwrites under OVERWRITING OPTIONS") {
    val s = spark
    import s.implicits._
    val baseDir = freshDir("likebase")
    val derivedDir = freshDir("likederived")
    spark.sql(s"""CREATE TABLE like_base (k BIGINT, v DOUBLE)
                  WITH ('connector' = 'filesystem', 'path' = '$baseDir',
                        'format' = 'parquet')""")
    spark.sql("INSERT INTO like_base SELECT id AS k, CAST(id * 1.5 AS DOUBLE) AS v FROM range(4)")
    // derived: same format (inherited), new path (overwritten)
    spark.sql(s"""CREATE TABLE like_derived WITH ('path' = '$derivedDir')
                  LIKE like_base (OVERWRITING OPTIONS)""")
    spark.sql("INSERT INTO like_derived SELECT id AS k, CAST(id * 10.0 AS DOUBLE) AS v FROM range(2)")
    val derived = spark.sql("SELECT k, v FROM like_derived ORDER BY k").collect()
    assert(derived.map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      Seq((0L, 0.0), (1L, 10.0)))
    // base is untouched by the derived insert
    assert(spark.sql("SELECT count(*) FROM like_base").collect().head.getLong(0) == 4L)
  }

  test("CREATE TABLE LIKE: INCLUDING duplicate option errors with the reference's guidance") {
    val baseDir = freshDir("likedup")
    spark.sql(s"""CREATE TABLE like_dup_base (k BIGINT)
                  WITH ('connector' = 'filesystem', 'path' = '$baseDir')""")
    val e = intercept[Exception] {
      spark.sql(s"""CREATE TABLE like_dup WITH ('path' = '/tmp/other')
                    LIKE like_dup_base""")
    }
    assert(e.getMessage.contains("EXCLUDING OPTIONS or OVERWRITING OPTIONS"))
  }

  test("CREATE TABLE LIKE (EXCLUDING OPTIONS) starts from the derived WITH only") {
    val baseDir = freshDir("likeexcl")
    val exclDir = freshDir("likeexcl2")
    spark.sql(s"""CREATE TABLE like_excl_base (k BIGINT, v DOUBLE)
                  WITH ('connector' = 'filesystem', 'path' = '$baseDir',
                        'format' = 'parquet')""")
    // EXCLUDING: nothing inherited — format falls back to the default
    // (parquet) and path must be supplied
    spark.sql(s"""CREATE TABLE like_excl WITH ('path' = '$exclDir')
                  LIKE like_excl_base (EXCLUDING OPTIONS)""")
    spark.sql("INSERT INTO like_excl SELECT id AS k, CAST(1.0 AS DOUBLE) AS v FROM range(3)")
    assert(spark.sql("SELECT count(*) FROM like_excl").collect().head.getLong(0) == 3L)
  }

  test("CREATE TABLE LIKE inherits the base's partition columns") {
    val b = freshDir("likepart") + "/b"; val d = freshDir("likepart2") + "/d"
    spark.sql(s"""CREATE TABLE lp_base (k BIGINT, grp STRING) PARTITIONED BY (grp)
                  WITH ('connector' = 'filesystem', 'path' = '$b', 'format' = 'parquet')""")
    spark.sql(s"CREATE TABLE lp_drv WITH ('path' = '$d') LIKE lp_base (OVERWRITING OPTIONS)")
    spark.sql("INSERT INTO lp_drv SELECT id AS k, CAST(id % 2 AS STRING) AS grp FROM range(4)")
    val subdirs = new java.io.File(d).listFiles.filter(_.isDirectory).map(_.getName).sorted
    assert(subdirs.toSeq == Seq("grp=0", "grp=1")) // partitioned layout inherited
  }

  test("connector csv table reads with the DECLARED schema, not inference") {
    val dir = freshDir("csvschema")
    writePipeCsv(dir)
    spark.sql(s"""CREATE TABLE csv_decl (etype STRING, eid BIGINT, v DOUBLE)
                  WITH ('connector' = 'filesystem', 'path' = '$dir',
                        'format' = 'csv', 'csv.field-delimiter' = '|')""")
    val df = spark.sql("SELECT * FROM csv_decl")
    assert(df.schema.map(f => (f.name, f.dataType.typeName)) ==
      Seq(("etype", "string"), ("eid", "long"), ("v", "double")))
    assert(df.count() == 3)
  }

  test("PARTITIONED BY connector table: col=value layout, declared order/types restored, scan prunes") {
    val dir = freshDir("partsink") + "/t"
    spark.sql(s"""CREATE TABLE part_t (k BIGINT, grp STRING) PARTITIONED BY (grp)
                  WITH ('connector' = 'filesystem', 'path' = '$dir', 'format' = 'parquet')""")
    spark.sql("INSERT INTO part_t SELECT id AS k, CASE WHEN id % 2 = 0 THEN 'even' ELSE 'odd' END AS grp FROM range(10)")
    // directory layout is the reference's col=value partitioning
    val subdirs = new java.io.File(dir).listFiles.filter(_.isDirectory).map(_.getName).sorted
    assert(subdirs.toSeq == Seq("grp=even", "grp=odd"))
    val df = spark.sql("SELECT k, grp FROM part_t WHERE grp = 'even'")
    assert(df.schema.map(f => (f.name, f.dataType.typeName)) ==
      Seq(("k", "long"), ("grp", "string")))
    assert(df.count() == 5)
    // the partition filter prunes at the scan, not post-read
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("grp"),
      s"partition filter not pushed:\n$plan")
  }

  test("INSERT OVERWRITE on a partitioned table replaces only the written partitions") {
    val dir = freshDir("partovw") + "/t"
    spark.sql(s"""CREATE TABLE part_o (k BIGINT, grp STRING) PARTITIONED BY (grp)
                  WITH ('connector' = 'filesystem', 'path' = '$dir', 'format' = 'parquet')""")
    spark.sql("INSERT INTO part_o SELECT id AS k, CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END AS grp FROM range(6)")
    // dynamic overwrite: only partition 'a' is replaced (FileSystemCommitter semantics)
    spark.sql("INSERT OVERWRITE part_o SELECT id + 100 AS k, 'a' AS grp FROM range(2)")
    val rows = spark.sql("SELECT grp, count(*) AS n, min(k) AS mn FROM part_o GROUP BY grp ORDER BY grp")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq == Seq(("a", 2L, 100L), ("b", 3L, 1L)))
  }

  test("static PARTITION clause pins the partition value as a constant column") {
    val dir = freshDir("partstatic") + "/t"
    spark.sql(s"""CREATE TABLE part_s (k BIGINT, grp STRING) PARTITIONED BY (grp)
                  WITH ('connector' = 'filesystem', 'path' = '$dir', 'format' = 'parquet')""")
    spark.sql("INSERT INTO part_s PARTITION (grp = 'fixed') SELECT id AS k FROM range(3)")
    val rows = spark.sql("SELECT k, grp FROM part_s ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(rows.toSeq == Seq((0L, "fixed"), (1L, "fixed"), (2L, "fixed")))
  }

  test("ALTER TABLE SET retargets the connector registration; RENAME TO moves it; DROP TABLE unregisters") {
    val p1 = freshDir("alterp1"); val p2 = freshDir("alterp2")
    spark.sql(s"""CREATE TABLE alt_t (k BIGINT) WITH
                  ('connector' = 'filesystem', 'path' = '$p1', 'format' = 'parquet')""")
    spark.sql("INSERT INTO alt_t SELECT id AS k FROM range(3)")
    spark.sql(s"ALTER TABLE alt_t SET ('path' = '$p2')")
    spark.sql("INSERT INTO alt_t SELECT id + 100 AS k FROM range(2)")
    // reads now come from p2 only — the SET retargeted both halves
    val afterSet = spark.sql("SELECT k FROM alt_t ORDER BY k").collect().map(_.getLong(0))
    assert(afterSet.toSeq == Seq(100L, 101L))
    spark.sql("ALTER TABLE alt_t RENAME TO alt_r")
    assert(spark.sql("SELECT count(*) FROM alt_r").collect().head.getLong(0) == 2L)
    intercept[Exception] { spark.sql("SELECT * FROM alt_t").collect() } // old name gone
    spark.sql("DROP TABLE alt_r")
    intercept[Exception] { spark.sql("SELECT * FROM alt_r").collect() }
    // non-connector ALTER/DROP falls through to Spark's own DDL
    spark.sql("CREATE TABLE IF NOT EXISTS native_drop_probe (x INT) USING parquet")
    spark.sql("DROP TABLE native_drop_probe") // must not be intercepted
  }

  test("EXPLAIN PLAN FOR / SHOW CURRENT CATALOG / SHOW CURRENT DATABASE / USE CATALOG") {
    val plan = spark.sql("EXPLAIN PLAN FOR SELECT 1 AS one").collect().head.getString(0)
    assert(plan.contains("Physical Plan") || plan.contains("Project"))
    val cat = spark.sql("SHOW CURRENT CATALOG")
    assert(cat.columns.toSeq == Seq("current catalog name"))
    assert(cat.collect().head.getString(0) == "spark_catalog")
    val db = spark.sql("SHOW CURRENT DATABASE")
    assert(db.columns.toSeq == Seq("current database name"))
    assert(db.collect().head.getString(0) == "default")
    spark.sql("USE CATALOG spark_catalog") // the reference's USE CATALOG spelling
    assert(spark.sql("SHOW CURRENT CATALOG").collect().head.getString(0) == "spark_catalog")
  }

  test("native utility statements pass through: SHOW TABLES / VIEWS / FUNCTIONS / DESCRIBE") {
    spark.range(2).createOrReplaceTempView("util_probe_view")
    val views = spark.sql("SHOW VIEWS").collect().map(_.getString(1))
    assert(views.contains("util_probe_view"))
    assert(spark.sql("SHOW TABLES").columns.nonEmpty)
    assert(spark.sql("SHOW FUNCTIONS").count() > 100)
    val desc = spark.sql("DESCRIBE util_probe_view").collect()
    assert(desc.exists(r => r.getString(0) == "id" && r.getString(1) == "bigint"))
  }
}
