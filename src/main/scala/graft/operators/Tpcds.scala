package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Real TPC-DS: the 24-table schema and ALL 103 of the benchmark's query
  * variants the reference runs, over deterministically generated data.
  *
  * The reference proves its batch SQL planner on TPC-DS proper
  * (flink-end-to-end-tests/flink-tpcds-test/.../TpcdsTestProgram.java:59-70
  * runs 103 variants at sf1). The driver's testdata has no TPC-DS tables,
  * so this module synthesizes the full 24-table schema from seeded modular
  * arithmetic ([[TpcdsFixture.tableSql]]) — the same shared-SQL-text
  * discipline as the rest of the repo's oracles, which makes the DuckDB
  * comparison airtight: the oracle re-derives the data from the identical
  * expressions, so any mismatch is an ENGINE divergence, never a fixture
  * race.
  *
  * Coverage is the reference's full list: q1–q99 plus the a/b variants of
  * q14/q23/q24/q39 — 103 queries, each an oracle-gated `dsds_*` row. Every
  * optimizer shape the benchmark exercises is here: star joins, demographic
  * stars, correlated scalar subqueries, rollup ranks, YoY self-joins
  * (q11/q74/q75), cross-channel INTERSECT item spaces (q14a/b), frequent-
  * item/best-customer semi-join cascades (q23a/b), zip-colocated customer-
  * store joins (q24a/b), the 17-table q64 mega-join, inventory moment
  * statistics (q39a/b), channel P&L rollups (q5/q77/q80), EXISTS/NOT-EXISTS
  * demographic profiles (q10/q35/q69), warehouse pivots (q66), and the
  * inventory-shortage shipping join (q72).
  *
  * Cross-engine exactness rules (why some templates differ slightly from
  * the published text — each is a semantics-preserving rewrite):
  *   - money aggregates are DECIMAL sums (associative, exact) cast to
  *     DOUBLE only in the output projection;
  *   - `avg(x)` outputs become `CAST(sum(x) AS DOUBLE)/count(*)` (an
  *     exact double from exact operands — avg-of-decimal differs between
  *     engines in intermediate type/rounding);
  *   - ratio predicates are cross-multiplied into decimal products
  *     (q6: `price*10*cnt > 12*sum`; q11/q74: `w2*s1 > s2*w1`;
  *     q65: `revenue*10*cnt <= sum`) so no division ever feeds a
  *     comparison; where the published ratio can hit a zero divisor
  *     (q75) a nullif guard replaces the bare division;
  *   - stddev/variance gates (q17/q39) are rewritten over exact integer
  *     moment sums n/s1/s2, so `cov > c` becomes an exact integer
  *     inequality and the output stdev is one deterministic sqrt;
  *   - integer-sum outputs carry `CAST(... AS BIGINT)` because DuckDB
  *     widens integer sums to HUGEINT (pandas float64 — q78/q83);
  *   - every ORDER BY under a LIMIT carries a full tiebreak so the kept
  *     prefix is engine-independent; tiebreaks live ONLY on the outer
  *     ORDER BY, never inside a rank()/row_number() window's ordering —
  *     extra keys there would change the computed rank VALUES whenever
  *     the published ordering ties (per round-7 ADVICE on q70/q86);
  *   - q72 (round 8): the inventory×date_dim join is pre-associated in a
  *     subselect so `d1.d_week_seq = d2.d_week_seq` becomes part of the
  *     CS×INV equi-join key — pure inner-join reassociation, identical
  *     relational content on both engines. Without it Spark keys the
  *     two-fact join on item alone (the week equality only connects the
  *     date dims), which degenerates quadratically as facts scale over
  *     the probe's fixed item dimension: 599 s → 17 s at the 1000× probe.
  *
  * Fixture-scale parameter adaptations (the synthetic tables are ~1000×
  * smaller than sf1, and the modular generators impose residue structure
  * the DSGEN data doesn't have): q23's frequent-item gate counts per
  * (item, year) because the fixture's (item, day) pairs are unique by
  * construction; q64 matches equal demographic snapshots (the generators
  * make the published <>-match structurally empty) over a widened price
  * band; q24 pins the one store market whose zip slot intersects the
  * returned-ticket customers' zip subspace. Join/aggregation structure is
  * unchanged in all three.
  *
  * 100 TB scale shape: the facts shuffle only for their final aggregates;
  * every dimension (date_dim/item/store/demographics/…) sits far under the
  * broadcast threshold at ANY scale factor — TPC-DS dims grow with sqrt or
  * log of the fact tables — so Catalyst plans broadcast-hash star joins
  * with filter pushdown into the parquet scans. TpcdsPlanSpec asserts the
  * no-cartesian + broadcast-dim shape for every query here.
  */
object Tpcds {
  type QFn = (SparkSession, String) => DataFrame

  /** target/ path the generated tables land under — content-addressed by
    * the generation SQL, so any fixture change invalidates the parquet
    * cache instead of silently serving stale schemas. */
  private lazy val root = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(TpcdsFixture.tableSql.toSeq.sortBy(_._1).mkString.getBytes("UTF-8"))
    s"target/tpcds/${digest.take(6).map(b => f"$b%02x").mkString}"
  }

  private val built = scala.collection.concurrent.TrieMap.empty[String, Boolean]

  /** Loaded-table cache keyed on (session UUID, fixture root): re-binding
    * the temp views on every call is deliberate (the TPC-H family owns
    * colliding names like `customer`), but re-reading 24 parquet footers
    * per call is not — at bench cadence that read dominated the per-query
    * cost. `createOrReplaceTempView` over a cached DataFrame is catalog-
    * only. Keyed on `sessionUUID` (not identity hash) per round-6 ADVICE.
    * Entries whose session has stopped are evicted on the next call so a
    * long-lived JVM creating many sessions (test suites, repeated
    * GraftSession builds) cannot accumulate an unbounded map of DataFrames
    * pinned to dead sessions (round-7 ADVICE). */
  private val loaded = scala.collection.concurrent.TrieMap
    .empty[(String, String), (SparkSession, Map[String, DataFrame])]

  /** Materialize all 24 tables as parquet once per JVM (the data is
    * dir-independent), then register them as temp views — on EVERY call,
    * exactly like [[graft.Tables.registerAll]]: `customer` collides
    * between the TPC-H and TPC-DS schemas, so each query family must
    * (re)bind its own views before running rather than trust a
    * once-per-session registration to survive the other family's. Parquet
    * rather than in-memory views so the query plans exercise the real scan
    * path: column pruning + pushed filters, the same shape a 100 TB
    * warehouse scan has. */
  def ensureTables(s: SparkSession): Unit = {
    built.getOrElseUpdate(s"files:$root", {
      TpcdsFixture.tableSql.foreach { case (name, sql) =>
        val dir = new java.io.File(s"$root/$name")
        if (!dir.isDirectory || !new java.io.File(dir, "_SUCCESS").isFile)
          s.sql(sql).write.mode("overwrite").parquet(dir.getPath)
      }
      true
    })
    // sessionUUID is private[sql] at the Scala level but public in
    // bytecode; same reflective read as Bucketing.ensureBucketed.
    val uuid =
      try s.getClass.getMethod("sessionUUID").invoke(s).toString
      catch { case _: ReflectiveOperationException =>
        String.valueOf(System.identityHashCode(s)) }
    loaded.filterInPlace { case (_, (sess, _)) => !sess.sparkContext.isStopped }
    loaded.getOrElseUpdate((uuid, root),
      s -> TpcdsFixture.tableSql.keys.map(n => n -> s.read.parquet(s"$root/$n")).toMap
    )._2.foreach { case (name, df) => df.createOrReplaceTempView(name) }
  }

  private def run(q: String)(s: SparkSession, dir: String): DataFrame = {
    ensureTables(s)
    s.sql(TpcdsFixture.querySql(q)._2)
  }

  /** Oracle = the same query text over WITH-clauses that re-derive each
    * referenced table from the shared generation SQL. Self-contained: the
    * driver's DuckDB needs no view registration and no filesystem state. */
  private def oracle(q: String): String = {
    val (tables, sql) = TpcdsFixture.querySql(q)
    val trimmed = sql.trim
    val ctes = tables.map(t => s"$t AS (${TpcdsFixture.tableSql(t)})")
    // Splice into an existing WITH (q11/q51/q74) instead of nesting one.
    if (trimmed.toUpperCase.startsWith("WITH "))
      s"WITH ${ctes.mkString(",\n")},\n${trimmed.drop(5)}"
    else
      s"WITH ${ctes.mkString(",\n")}\n$trimmed"
  }

  private val names: Seq[String] = TpcdsFixture.querySql.keys.toSeq.sorted

  def queries: Map[String, QFn] =
    names.map(q => s"dsds_$q" -> (run(q) _)).toMap

  def oracles: Map[String, String] =
    names.map(q => s"dsds_$q" -> oracle(q)).toMap
}
