package graft.sql

import graft.SparkSpec

/** Fuzz family 28: DDL front-end COMPOSITION.
  *
  * The LIKE strategy matrix, watermark inheritance, partition merging and
  * the OPTIONS hint are each spec-pinned pointwise; this family sweeps
  * seeded random 1–3-hop CREATE TABLE ... LIKE chains — random strategy
  * lists (including illegal ones), random derived columns (physical /
  * computed / colliding), random watermarks and partitions, a random
  * OPTIONS hint on the final table — and checks every hop against an
  * INDEPENDENT in-test merge model re-derived from the reference's
  * MergeTableLikeUtil semantics (MergeTableLikeUtil.java:74-81 defaults,
  * :98-121 strategy computation, :164-180 partitions, :185-206 options,
  * :395-443 derived columns; SqlTableLike.validate():194-210 illegality;
  * populateWatermarksFromSourceTable:258-266). A divergence between the
  * model and [[ConnectorTables]] — either a wrong merge OR a missed/wrong
  * error — fails the case with the chain's DDL text.
  */
class DdlCompositionFuzzSpec extends SparkSpec {

  // ---- independent merge model ---------------------------------------------

  private case class Model(
      options: Map[String, String],
      // None ⇔ the table's physical schema is inferred from files (the
      // WatermarkDdl registration shape) — column lists merge as
      // Option.orElse, exactly like Tbl.schema
      physical: Option[Seq[String]],
      computed: Seq[(String, String)],
      partitions: Seq[String],
      wm: Option[(String, String)], // (col, delay-literal "5 seconds")
      pk: Option[Seq[String]] = None,
      // full declared-column order (physical + computed interleaved as
      // declared) — what DESCRIBE must render, merged per MergeTableLikeUtil
      declNames: Seq[String] = Nil)

  /** One derived hop's declaration. */
  private case class Hop(
      newPhysical: Seq[String],      // fresh physical columns (BIGINT)
      collidePhysical: Option[String], // re-declare an inherited physical col
      computed: Seq[(String, String)], // name -> expr (may collide)
      partitions: Seq[String],
      wm: Option[(String, String, String)], // (col, n, unit)
      pk: Option[Seq[String]],
      options: Map[String, String],
      strategies: Seq[(String, String)]) // (strategy, feature) in order

  private val feats = Seq("CONSTRAINTS", "GENERATED", "METADATA", "OPTIONS",
    "PARTITIONS", "WATERMARKS")

  /** The model's expected outcome: Left(error fragment) or Right(merged). */
  private def mergeModel(base: Model, hop: Hop): Either[String, Model] = {
    // strategy list validation (SqlTableLike.validate)
    val byFeat = hop.strategies.map(_._2)
    if (byFeat.distinct.size != byFeat.size)
      return Left("Each like option feature can be declared only once.")
    hop.strategies.collectFirst {
      case (s, f) if s == "OVERWRITING" && Set("ALL", "PARTITIONS", "CONSTRAINTS")(f) =>
        s"Illegal merging strategy '$s' for '$f' option."
    }.foreach(e => return Left(e))
    val defaults = feats.map(f => f -> (if (f == "OPTIONS") "OVERWRITING" else "INCLUDING")).toMap
    val withAll = hop.strategies.collectFirst { case (s, "ALL") => s }
      .fold(defaults)(s => feats.map(_ -> s).toMap)
    val st = withAll ++ hop.strategies.filter(_._2 != "ALL").map { case (s, f) => f -> s }
    // options merge
    var opts = scala.collection.mutable.LinkedHashMap[String, String]()
    if (st("OPTIONS") != "EXCLUDING") opts ++= base.options
    hop.options.foreach { case (k, v) =>
      if (st("OPTIONS") == "INCLUDING" && opts.contains(k))
        return Left(s"There already exists an option ['$k' -> '${opts(k)}'] in the base table.")
      opts(k) = v
    }
    // physical columns: duplicates are an unconditional error; None/Some
    // merge as orElse (MergeTableLikeUtil.collectPhysicalFieldsTypes)
    val derivedPhys = hop.collidePhysical.toSeq ++ hop.newPhysical
    val phys = (base.physical, if (derivedPhys.nonEmpty) Some(derivedPhys) else None) match {
      case (Some(b), Some(d)) =>
        d.find(b.contains).foreach(c =>
          return Left(s"A column named '$c' already exists in the base table."))
        Some(b ++ d)
      case (b, d) => d.orElse(b)
    }
    // computed (GENERATED) — a derived WATERMARK's rowtime column is ALSO a
    // derived computed column (it is declared `c AS CAST(...)`), so it
    // participates in the generated-column collision check FIRST
    val hopComputed = hop.computed ++ hop.wm.map { case (c, _, _) => (c, "CAST(ts AS TIMESTAMP)") }
    val baseComp = if (st("GENERATED") == "EXCLUDING") Nil else base.computed
    hopComputed.foreach { case (n, _) =>
      if (baseComp.exists(_._1.equalsIgnoreCase(n)) && st("GENERATED") != "OVERWRITING")
        return Left(s"A generated column named '$n' already exists in the base table.")
    }
    val comp = baseComp.filterNot(bc => hopComputed.exists(_._1.equalsIgnoreCase(bc._1))) ++
      hopComputed
    // partitions — the 1.12 shape: derived+base needs EXCLUDING, but an
    // EMPTY derived list inherits under every strategy
    if (hop.partitions.nonEmpty && base.partitions.nonEmpty && st("PARTITIONS") != "EXCLUDING")
      return Left("The base table already has partitions defined.")
    val parts = if (hop.partitions.nonEmpty) hop.partitions else base.partitions
    // watermarks
    val baseWm = if (st("WATERMARKS") == "EXCLUDING") None else base.wm
    hop.wm.foreach { case (c, _, _) =>
      if (baseWm.exists(_._1.equalsIgnoreCase(c)) && st("WATERMARKS") != "OVERWRITING")
        return Left(s"There already exists a watermark spec for column '$c' in the base table.")
    }
    val wm = hop.wm.map { case (c, n, u) => (c, s"$n ${u.toLowerCase}s") }.orElse(baseWm)
    // primary key — LAST in the real merge order: copied only under
    // INCLUDING (populatePrimaryKeyFromSourceTable:268-275); base+derived
    // together is the error (appendDerivedPrimaryKey:277-281); the merged
    // key then re-validates existence against the merged declared list
    val basePk = if (st("CONSTRAINTS") == "INCLUDING") base.pk else None
    if (hop.pk.isDefined && basePk.isDefined)
      return Left("The base table already has a primary key.")
    val pk = hop.pk.orElse(basePk)
    pk.foreach { cols =>
      // the generator only produces valid-by-construction PKs or the
      // sentinel bogus column
      if (cols.contains("nope_col"))
        return Left("Could not create a PRIMARY KEY 'PK_nope_col'. " +
          "Column 'nope_col' does not exist.")
    }
    // declaration order: the base's list with excluded/overridden computed
    // items dropped, then the derived items in their declared order
    val baseCompNames = base.computed.map(_._1.toLowerCase).toSet
    val hopCompNames = hopComputed.map(_._1.toLowerCase).toSet
    val keptBase = base.declNames.filter { n =>
      val isComp = baseCompNames(n.toLowerCase)
      !isComp || (st("GENERATED") != "EXCLUDING" && !hopCompNames(n.toLowerCase))
    }
    val hopDeclNames = hop.collidePhysical.toSeq ++ hop.newPhysical ++
      hop.computed.map(_._1) ++ hop.wm.map(_._1).toSeq
    Right(Model(opts.toMap, phys, comp, parts, wm, pk, keptBase ++ hopDeclNames))
  }

  // ---- generator ------------------------------------------------------------

  private val filePool = Seq("a", "b", "c", "d") // columns present in the data

  private def genHop(r: scala.util.Random, base: Model, fresh: () => String): Hop = {
    val known = base.physical.getOrElse(Nil)
    val unusedFile = filePool.filterNot(known.contains)
    val newPhys =
      if (unusedFile.nonEmpty && r.nextInt(3) == 0) Seq(unusedFile(r.nextInt(unusedFile.size)))
      else Nil
    val collide =
      if (known.nonEmpty && r.nextInt(6) == 0) Some(known(r.nextInt(known.size))) else None
    // computed columns (incl. a watermark's rowtime) reference file columns
    // that a PARTITIONED table's declared-order restore would drop, so a
    // chain is either computed-bearing or partitioned, never both — the
    // same constraint the reference enforces by requiring computed columns
    // to reference declared columns only
    val allowComputed = base.partitions.isEmpty
    val computed: Seq[(String, String)] =
      if (!allowComputed) Nil
      else r.nextInt(4) match {
        case 0 => Seq((fresh(), s"b + ${r.nextInt(10)}"))
        case 1 if base.computed.nonEmpty => // collision with an inherited one
          Seq((base.computed(r.nextInt(base.computed.size))._1, s"b * ${1 + r.nextInt(5)}"))
        case _ => Nil
      }
    val wm: Option[(String, String, String)] =
      if (!allowComputed) None
      else r.nextInt(5) match {
        case 0 => Some((s"ts_${fresh()}", r.nextInt(10).toString, "SECOND"))
        case 1 if base.wm.isDefined => // collision with the inherited rowtime
          Some((base.wm.get._1, r.nextInt(10).toString, "SECOND"))
        case _ => None
      }
    val partSrc = if (known.nonEmpty) known else filePool
    val partitions =
      if (base.computed.isEmpty && computed.isEmpty && wm.isEmpty && r.nextInt(5) == 0)
        Seq(partSrc(r.nextInt(partSrc.size)))
      else Nil
    val optPool = Seq("probe", "team", "tag")
    val options = (Seq("path" -> "__PATH__") ++ // re-filled by the caller
      (0 until r.nextInt(3)).map(_ => optPool(r.nextInt(3)) -> s"v${r.nextInt(4)}")).toMap
    // derived PK: on a fresh NOT NULL physical column (valid by
    // construction), or the sentinel bogus column (existence error)
    val pk: Option[Seq[String]] =
      if (newPhys.nonEmpty && r.nextInt(4) == 0) Some(Seq(newPhys.head))
      else if (r.nextInt(20) == 0) Some(Seq("nope_col"))
      else None
    val stratPool = Seq("INCLUDING", "EXCLUDING", "OVERWRITING")
    val featPool = "ALL" +: feats
    val strategies = (0 until r.nextInt(4)).map(_ =>
      (stratPool(r.nextInt(3)), featPool(r.nextInt(featPool.size))))
    Hop(newPhys, collide, computed, partitions, wm, pk, options, strategies)
  }

  private def hopDdl(name: String, baseName: String, hop: Hop, path: String): String = {
    val colItems =
      hop.collidePhysical.map(c => s"$c BIGINT").toSeq ++
      hop.newPhysical.map(c => s"$c BIGINT NOT NULL") ++
      hop.computed.map { case (n, e) => s"$n AS $e" } ++
      hop.wm.toSeq.flatMap { case (c, n, u) =>
        Seq(s"$c AS CAST(ts AS TIMESTAMP)",
          s"WATERMARK FOR $c AS $c - INTERVAL '$n' $u")
      } ++
      hop.pk.map(cols => s"PRIMARY KEY (${cols.mkString(", ")})").toSeq
    val cols = if (colItems.isEmpty) "" else colItems.mkString("(", ", ", ") ")
    val parts = if (hop.partitions.isEmpty) "" else hop.partitions.mkString("PARTITIONED BY (", ", ", ") ")
    val props = hop.options.map { case (k, v) =>
      s"'$k' = '${if (k == "path") path else v}'" }.mkString(", ")
    val likeOpts = if (hop.strategies.isEmpty) ""
      else hop.strategies.map { case (s, f) => s"$s $f" }.mkString(" (", ", ", ")")
    s"CREATE TABLE $name $cols${parts}WITH ($props) LIKE $baseName$likeOpts"
  }

  test("family 28: random LIKE chains with hints match an independent merge model on 3 seeds") {
    val s = spark
    import s.implicits._
    val dataDir = java.nio.file.Files.createTempDirectory("fz28").toString
    Seq((1L, 2L, 3L, 4L, "2024-01-01 00:00:01"), (5L, 6L, 7L, 8L, "2024-01-01 00:00:02"))
      .toDF("a", "b", "c", "d", "ts").write.mode("overwrite").parquet(dataDir)
    val baseSeed = sys.props.get("graft.fuzz.seed")
      .orElse(sys.env.get("GRAFT_FUZZ_SEED")).map(_.toLong).getOrElse(20260813L)
    var casesRun = 0; var errorsPredicted = 0; var mergesChecked = 0
    (0 until 3).foreach { si =>
      val r = new scala.util.Random(baseSeed + 280 + si)
      // seed 2 runs its whole chain INSIDE a DDL-catalog namespace: every
      // registration/lookup/LIKE/DESCRIBE/hint then goes through the
      // (catalog, database, name) canonical keys and the bare-name mounts
      // — the round-15 scoping machinery under the heaviest DDL path
      val namespaced = si == 2
      if (namespaced) {
        spark.sql(s"DROP CATALOG IF EXISTS fz28cat_$si")
        spark.sql(s"CREATE CATALOG fz28cat_$si WITH ('type' = 'generic_in_memory')")
        spark.sql(s"USE CATALOG fz28cat_$si")
      }
      try (0 until 10).foreach { ci =>
        casesRun += 1
        var freshId = 0
        def fresh(): String = { freshId += 1; s"g${si}_${ci}_$freshId" }
        // base table: 2 physical file columns, random options, maybe a
        // watermark (WatermarkDdl path), maybe partitions (plain path only)
        val basePhys = r.shuffle(filePool).take(2).sorted
        val baseOpts = Map("connector" -> "filesystem", "path" -> dataDir,
          "format" -> "parquet") ++
          (if (r.nextBoolean()) Map("probe" -> s"v${r.nextInt(3)}") else Map.empty)
        val baseWm = if (r.nextInt(3) == 0) Some((s"ts_${fresh()}", "5", "SECOND")) else None
        val baseParts = if (baseWm.isEmpty && r.nextInt(4) == 0) Seq(basePhys.head) else Nil
        val basePk = if (r.nextInt(4) == 0) Some(Seq(basePhys.head)) else None
        val baseName = s"fz28_${si}_${ci}_b"
        val baseCols = basePhys.map(c => s"$c BIGINT" +
            (if (basePk.exists(_.contains(c))) " NOT NULL" else "")) ++
          baseWm.toSeq.flatMap { case (c, n, u) =>
            Seq(s"$c AS CAST(ts AS TIMESTAMP)", s"WATERMARK FOR $c AS $c - INTERVAL '$n' $u") } ++
          basePk.map(cols => s"PRIMARY KEY (${cols.mkString(", ")})").toSeq
        val basePartsSql = if (baseParts.isEmpty) "" else baseParts.mkString("PARTITIONED BY (", ", ", ") ")
        val baseDdl = s"CREATE TABLE $baseName (${baseCols.mkString(", ")}) " +
          basePartsSql + s"WITH (${baseOpts.map { case (k, v) => s"'$k' = '$v'" }.mkString(", ")})"
        spark.sql(baseDdl)
        // a watermark base registers through WatermarkDdl, whose Tbl carries
        // NO physical schema (inferred from files)
        var model = Model(baseOpts,
          if (baseWm.isDefined) None else Some(basePhys),
          baseWm.map(w => (w._1, "CAST(ts AS TIMESTAMP)")).toSeq,
          baseParts, baseWm.map { case (c, n, u) => (c, s"$n ${u.toLowerCase}s") },
          basePk, basePhys ++ baseWm.map(_._1).toSeq)
        var prevName = baseName
        val hops = 1 + r.nextInt(3)
        var aborted = false
        (0 until hops).foreach { hi =>
          if (!aborted) {
            val hop0 = genHop(r, model, fresh _)
            val hop = hop0.copy(options = hop0.options.updated("path", dataDir))
            val name = s"fz28_${si}_${ci}_h$hi"
            val ddl = hopDdl(name, prevName, hop, dataDir)
            mergeModel(model, hop) match {
              case Left(fragment) =>
                errorsPredicted += 1
                val e = intercept[Exception] { spark.sql(ddl) }
                assert(e.getMessage.contains(fragment),
                  s"family28 s$si c$ci h$hi expected error '$fragment', " +
                    s"got '${e.getMessage}'\nDDL: $ddl")
                aborted = true
              case Right(next) =>
                spark.sql(ddl)
                mergesChecked += 1
                val tbl = ConnectorTables.lookup(spark, name).getOrElse(
                  fail(s"family28 s$si c$ci h$hi: $name not registered\nDDL: $ddl"))
                assert(tbl.props == next.options,
                  s"family28 s$si c$ci h$hi options mismatch\nDDL: $ddl\n" +
                    s"got ${tbl.props}\nexp ${next.options}")
                assert(tbl.schema.map(_.fieldNames.toSeq) == next.physical,
                  s"family28 s$si c$ci h$hi physical mismatch\nDDL: $ddl\n" +
                    s"got ${tbl.schema.map(_.fieldNames.toSeq)}\nexp ${next.physical}")
                assert(tbl.computed.map(_._1) == next.computed.map(_._1),
                  s"family28 s$si c$ci h$hi computed mismatch\nDDL: $ddl\n" +
                    s"got ${tbl.computed}\nexp ${next.computed}")
                assert(tbl.partitions == next.partitions,
                  s"family28 s$si c$ci h$hi partitions mismatch\nDDL: $ddl")
                val gotWm = SystemTimeJoin.watermarkOf(
                  ConnectorTables.canonical(spark, name))
                assert(gotWm == next.wm,
                  s"family28 s$si c$ci h$hi watermark mismatch\nDDL: $ddl\n" +
                    s"got $gotWm exp ${next.wm}")
                assert(tbl.pk.map(_._2) == next.pk,
                  s"family28 s$si c$ci h$hi pk mismatch\nDDL: $ddl\n" +
                    s"got ${tbl.pk} exp ${next.pk}")
                // DESCRIBE renders the MERGED declaration order (the decl
                // merge is what LIKE chains exercise hardest)
                val descNames = spark.sql(s"DESCRIBE $name").collect()
                  .map(_.getString(0)).toSeq
                assert(descNames == next.declNames,
                  s"family28 s$si c$ci h$hi DESCRIBE order mismatch\nDDL: $ddl\n" +
                    s"got $descNames\nexp ${next.declNames}")
                // the readable view exists and the computed columns resolve
                assert(spark.table(ConnectorTables.viewName(
                  ConnectorTables.canonical(spark, name))).count() == 2)
                model = next
                prevName = name
            }
          }
        }
        // compose with an OPTIONS hint on the final table: per-query only,
        // the registration must stay untouched (FlinkHints.mergeTableOptions)
        if (!aborted) {
          spark.conf.set(OptionsHint.ConfKey, "true")
          try {
            val n = spark.sql(
              s"SELECT count(*) AS n FROM $prevName /*+ OPTIONS('probe' = 'hinted') */")
              .collect().head.getLong(0)
            assert(n == 2L)
            assert(ConnectorTables.lookup(spark, prevName).get.props == model.options,
              s"family28 s$si c$ci: OPTIONS hint leaked into the registration")
          } finally spark.conf.unset(OptionsHint.ConfKey)
        }
      } finally if (namespaced) {
        spark.sql("USE CATALOG spark_catalog")
        spark.sql(s"DROP CATALOG fz28cat_$si")
      }
    }
    println(s"[fuzz] family28 cases=$casesRun merges=$mergesChecked errors=$errorsPredicted")
    assert(mergesChecked > 10 && errorsPredicted > 0)
  }

  test("family 28b: METADATA strategies through LIKE chains over debezium tables") {
    val s = spark
    import s.implicits._
    val dataDir = java.nio.file.Files.createTempDirectory("fz28m").toString
    Seq("""{"before": null, "after": {"id": 7}, "op": "c", "ts_ms": 1000, """ +
        """"source": {"db": "d1", "table": "t1"}}""")
      .toDF("value").coalesce(1).write.mode("overwrite").text(dataDir)
    val baseSeed = sys.props.get("graft.fuzz.seed")
      .orElse(sys.env.get("GRAFT_FUZZ_SEED")).map(_.toLong).getOrElse(20260813L)
    var merges = 0; var errors = 0
    (0 until 3).foreach { si =>
      val r = new scala.util.Random(baseSeed + 285 + si)
      (0 until 8).foreach { ci =>
        val baseName = s"fz28m_${si}_${ci}_b"
        spark.sql(s"""CREATE TABLE $baseName (
                        id BIGINT,
                        m1 STRING METADATA FROM 'source.database'
                      ) WITH ('connector' = 'filesystem', 'path' = '$dataDir',
                              'format' = 'debezium-json')""")
        // derived: either a COLLIDING m1 (new key) or a fresh m2
        val collide = r.nextBoolean()
        val derived = if (collide) ("m1", "source.table") else ("m2", "source.table")
        val strat = r.nextInt(4) match {
          case 0 => ""                         // default INCLUDING
          case 1 => " (INCLUDING METADATA)"
          case 2 => " (EXCLUDING METADATA)"
          case 3 => " (OVERWRITING METADATA)"
        }
        val name = s"fz28m_${si}_${ci}_d"
        val ddl = s"""CREATE TABLE $name (
                        ${derived._1} STRING METADATA FROM '${derived._2}'
                      ) WITH ('path' = '$dataDir') LIKE $baseName$strat"""
        // model: collision + inherited + not OVERWRITING → error; else the
        // base's list (unless EXCLUDING) minus overridden ++ derived
        val inherits = !strat.contains("EXCLUDING")
        val expectError = collide && inherits && !strat.contains("OVERWRITING")
        if (expectError) {
          errors += 1
          val e = intercept[Exception] { spark.sql(ddl) }
          assert(e.getMessage.contains(
            "A metadata column named 'm1' already exists in the base table."),
            s"family28b unexpected error for: $ddl\n${e.getMessage}")
        } else {
          spark.sql(ddl)
          merges += 1
          val expected =
            (if (inherits && !collide) Seq(("m1", "source.database")) else Nil) :+ derived
          val tbl = ConnectorTables.lookup(spark, name).get
          assert(tbl.metaCols.map(mc => (mc.name, mc.key)) == expected,
            s"family28b metaCols mismatch for: $ddl\ngot ${tbl.metaCols}\nexp $expected")
          // the decode surfaces each declared name under ITS key's value
          val row = spark.sql(s"SELECT * FROM ${ConnectorTables.viewName(name)}")
            .collect().head
          val vals = expected.map { case (n, k) =>
            row.getString(row.fieldIndex(n)) ->
              (if (k == "source.database") "d1" else "t1") }
          vals.foreach { case (got, exp) =>
            assert(got == exp, s"family28b decode mismatch for: $ddl") }
        }
      }
    }
    println(s"[fuzz] family28b merges=$merges errors=$errors")
    assert(merges > 5 && errors > 0)
  }
}
