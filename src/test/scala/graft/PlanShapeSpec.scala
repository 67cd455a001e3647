package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.BroadcastExchangeLike
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan

/** The scale contract: plans must push filters/projections into the parquet
  * scan, broadcast dimension tables, and stay inside whole-stage codegen —
  * the properties that decide whether a plan survives 100 TB (SURVEY §4). */
class PlanShapeSpec extends SparkSpec {

  private def executed(df: org.apache.spark.sql.DataFrame): SparkPlan = {
    df.collect() // materialize so AQE finalizes the plan
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
  }

  test("Q6: all predicates reach the parquet scan, projection pruned") {
    val df = operators.Relational.q6(spark, sf)
    val scans = df.queryExecution.executedPlan.collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      (plan.contains("l_shipdate") || scans.nonEmpty),
      "filter must be pushed into the scan")
    // only the 4 referenced columns are read, not all 11
    val readSchema = df.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString
    assert(!readSchema.contains("l_orderkey") || !readSchema.contains("ReadSchema"),
      "scan must not read unreferenced columns")
  }

  test("Q5: dimension tables join via broadcast, not shuffle") {
    // AQE wraps exchanges in query stages, so assert on the plan string
    val plan = executed(operators.Tpch.q5(spark, sf)).toString
    assert(plan.contains("BroadcastHashJoin"), "nation/region must be broadcast")
  }

  test("Q1: whole-stage codegen covers the agg pipeline") {
    // codegen'd operators print as "*(n) Operator" in the executed plan
    val plan = executed(operators.Relational.q1(spark, sf)).toString
    assert(plan.contains("*("), "agg must run inside codegen")
  }

  test("Q17's correlated avg shuffles the aggregate, not a cross join") {
    val plan = executed(operators.Tpch.q17(spark, sf)).toString
    assert(!plan.contains("CartesianProduct"), "decorrelation must avoid a cartesian product")
  }

  test("graph_triangles: oriented equi-joins only — no cartesian blowup") {
    val plan = executed(graph.Graphs.triangles(spark, sf)).toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      "triangle enumeration must join oriented edges on keys, never cross")
  }

  test("ngram-Jaccard: the singleton prefilter rides the self-join's own shuffle") {
    val df = pipeline.Dedup.queries("dedup_ngram_jaccard")(spark, sf)
    val plan = executed(df).toString
    // the window-count formulation must not add a separate aggregate+join of
    // the exploded shingles: no more than the candidate-pair aggregation
    assert(plan.contains("Window"), "prefilter must be the window count")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
  }

  test("dedup_embedding: LSH-bucketed — no all-pairs join anywhere in the plan") {
    val plan = executed(pipeline.Dedup.queries("dedup_embedding")(spark, sf)).toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      "embedding near-dup must bucket by hyperplane signature, not compare all pairs")
  }

  test("dedup_semantic: pairwise search confined to k-means clusters") {
    val plan = executed(pipeline.Dedup.queries("dedup_semantic")(spark, sf)).toString
    // exactly one broadcast-NLJ is legal: the k-row centroid assignment.
    // The PAIRWISE join must be hash-keyed on the cluster id — a second
    // NLJ or a cartesian would mean the SemDeDup cluster bound is gone
    // and the search went quadratic in the corpus.
    assert(!plan.contains("CartesianProduct"), "semantic dedup went all-pairs")
    val nlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).size
    assert(nlj <= 1, s"expected only the centroid-assignment NLJ, got $nlj")
    assert(plan.contains("cid"), "pairwise join must key on the cluster id")
  }

  test("dedup_simhash: candidate join keyed on signature bit-bands") {
    val df = pipeline.Dedup.queries("dedup_simhash")(spark, sf)
    val plan = executed(df).toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      "simhash pairing must block on signature bands, not all pairs")
    // the equi-join key must include the extracted signature bits
    assert(plan.contains("bits"), "join key must carry signature band bits")
  }
}
