package graft.operators

import graft.SparkSpec

/** Plan health + fixture sanity for the real TPC-DS family ([[Tpcds]]).
  *
  * Scale discipline: every one of the 103 queries must plan star joins as
  * broadcast-hash (TPC-DS dims stay tiny relative to facts at ANY scale
  * factor), must never plan a two-large-sides CartesianProduct, and the
  * fact scans must carry pushed filters/pruned columns where the query
  * allows. A BroadcastNestedLoopJoin is tolerated only for the q6-style
  * scalar-subquery broadcast (1-row side) and q77's hinted 1-row cs×cr
  * cross join.
  */
class TpcdsPlanSpec extends SparkSpec {

  private lazy val plans: Map[String, String] = {
    Tpcds.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val df = fn(spark, sf)
      df.collect()
      name -> df.queryExecution.executedPlan.toString
    }.toMap
  }

  test("fixture: all 24 tables materialize and stay non-empty") {
    Tpcds.ensureTables(spark)
    TpcdsFixture.tableSql.keys.foreach { t =>
      assert(spark.table(t).count() > 0, s"$t is empty")
    }
    assert(TpcdsFixture.tableSql.size == 24)
  }

  test("every dsds query returns rows (no silently-empty parameter choice)") {
    Tpcds.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      assert(fn(spark, sf).count() > 0, s"$name returned no rows")
    }
  }

  test("no dsds query plans a CartesianProduct") {
    val cartesian = plans.collect { case (n, p) if p.contains("CartesianProduct") => n }
    assert(cartesian.isEmpty, s"cartesian products in: $cartesian")
  }

  test("star joins broadcast their dimensions") {
    // Every query that joins a dim must plan ≥1 broadcast-hash join — a
    // shuffled sort-merge join against `item` or `date_dim` would be the
    // 100 TB regression this pins down. q9 and q28 are the dim-free
    // queries (scalar-subquery / cross-joined CASE buckets over a single
    // fact or 1-row scan — their only joins are 1-row broadcast-NLJ).
    val dimFree = Set("dsds_q9", "dsds_q28")
    val unbroadcast = plans.collect {
      case (n, p) if !dimFree(n) && !p.contains("BroadcastHashJoin") => n
    }
    assert(unbroadcast.isEmpty, s"no broadcast join in: $unbroadcast")
  }

  test("fact scans push their date filters down (q3 representative)") {
    Tpcds.ensureTables(spark)
    val df = spark.sql(TpcdsFixture.querySql("q3")._2)
    val scan = df.queryExecution.executedPlan.toString
    // d_moy = 11 reaches the date_dim parquet scan as a pushed filter.
    assert(scan.contains("PushedFilters: [") && scan.contains("d_moy"),
      "expected d_moy pushdown into the date_dim scan")
  }
}
