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

  test("sim_ann_ivf: probes broadcast onto the assigned corpus, no shuffle on the cell key") {
    // the IVF scale claim: the bounded query×probe table broadcasts onto
    // the cell-assigned corpus — the big side must never shuffle on the
    // k-value cell key (parallelism would collapse to k)
    val plan = executed(pipeline.Similarity.queries("sim_ann_ivf")(spark, sf)).toString
    assert(plan.contains("BroadcastHashJoin"),
      "the bounded query/probe table must broadcast onto the corpus")
    assert(!plan.contains("hashpartitioning(cell"),
      "the corpus must never shuffle on the low-cardinality cell key")
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
    // node-level asserts (the string form re-prints cached subtrees and
    // over-counts): the only legal nested-loop joins are the bounded
    // centroid-frame broadcasts (coarse √k-row assignment + cellmap), and
    // the PAIRWISE join must be hash-keyed on the cluster id — an extra
    // NLJ or a cartesian would mean the SemDeDup cluster bound is gone
    // and the search went quadratic in the corpus.
    val p = executed(pipeline.Dedup.queries("dedup_semantic")(spark, sf))
    // AQE wraps finished stages as leaf QueryStageExec nodes — descend
    // into them (and reused exchanges) or the earlier joins are invisible
    def deep(n: SparkPlan): Seq[SparkPlan] = n +: (n.children ++ (n match {
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => Seq(r.child)
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      // releasing() caches the result (and the centroid frames), so the
      // compute plan sits behind InMemoryTableScan — descend into it
      case t: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
        Seq(t.relation.cachedPlan)
      case _ => Nil
    })).flatMap(deep)
    val all = deep(p).distinct
    assert(!all.exists(_.isInstanceOf[
      org.apache.spark.sql.execution.joins.CartesianProductExec]),
      "semantic dedup went all-pairs")
    val nlj = all.count(_.isInstanceOf[
      org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec])
    // the legal NLJs are the √k-row coarse-frame crossJoins (cellmap +
    // sample/full coarse assignment), counted once more when a cached
    // lineage re-embeds them — all broadcast a bounded centroid frame
    assert(nlj <= 6, s"expected only bounded centroid-frame NLJs, got $nlj")
    val hashKeys = all.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec =>
        j.leftKeys.map(_.toString).mkString(",")
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec =>
        j.leftKeys.map(_.toString).mkString(",")
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec =>
        j.leftKeys.map(_.toString).mkString(",")
    }
    assert(hashKeys.exists(_.contains("cid")),
      s"pairwise join must key on the cluster id; hash-join keys seen: " +
        s"[${hashKeys.mkString(" | ")}]; nodes: " +
        all.map(_.getClass.getSimpleName).distinct.mkString(","))
  }

  test("dedup_simhash: candidate join keyed on signature bit-bands") {
    val df = pipeline.Dedup.queries("dedup_simhash")(spark, sf)
    val plan = executed(df).toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      "simhash pairing must block on signature bands, not all pairs")
    // the equi-join key must include the extracted signature bits
    assert(plan.contains("bits"), "join key must carry signature band bits")
  }

  test("win_distribution: full-data window is bucket-partitioned, never single-partition") {
    // the two-pass global ntile/percent_rank/cume_dist: the only legal
    // unpartitioned WindowExec is the ≤P-row bucket-count prefix sum —
    // the customer-data row numbering must be hash-partitioned on the
    // range bucket, or the operator is back to a one-task full-table sort
    val df = operators.Windows.queries("win_distribution")(spark, sf)
    val p = executed(df)
    def deep(n: SparkPlan): Seq[SparkPlan] = n +: (n.children ++ (n match {
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => Seq(r.child)
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case _ => Nil
    })).flatMap(deep)
    val windows = deep(p).distinct.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w }
    assert(windows.nonEmpty, "expected WindowExec nodes in the two-pass plan")
    windows.filter(_.partitionSpec.isEmpty).foreach { w =>
      assert(!w.output.map(_.name).contains("c_custkey"),
        "an unpartitioned WindowExec may only run over bucket-count metadata, " +
          s"but saw customer data columns: ${w.output.map(_.name).mkString(",")}")
    }
    assert(windows.exists(w =>
      w.partitionSpec.nonEmpty && w.output.map(_.name).contains("c_custkey")),
      "per-row global positioning must ride a bucket-partitioned window")
    // arithmetic equivalence with the single-partition reference formulation
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w = Window.orderBy(col("c_acctbal"), col("c_custkey"))
    val naive = Tables.load(spark, sf, "customer")
      .select(col("c_custkey"), ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("pct_rank"), cume_dist().over(w).as("cume"))
      .collect().map(r => (r.getLong(0), r.getInt(1),
        math.round(r.getDouble(2) * 1e9), math.round(r.getDouble(3) * 1e9))).toSet
    val twoPass = df.collect().map(r => (r.getLong(0), r.getInt(1),
      math.round(r.getDouble(2) * 1e9), math.round(r.getDouble(3) * 1e9))).toSet
    assert(twoPass == naive, "two-pass distribution functions diverge from the reference form")
  }

  test("collapse-expand dedups pin their member expansion with an explicit repartition") {
    // BOTH sides of each collapse-expand dedup's expansion joins must ride
    // an explicit hash repartition (REPARTITION_BY_NUM, never AQE-coalesced):
    // whichever side the planner broadcasts, the join output inherits the
    // OTHER side's partitioning, and both unpinned lineages degenerate at
    // scale — the member table's scan can be a single split (one task,
    // 11+ CPU-minutes at the sf10 probe) and the pair list's distinct()
    // coalesces to a handful of AQE partitions (FOUR tasks carrying the
    // 2.3 B-row simhash expansion at the sf10 cold re-run, where the 8 MB
    // member table fit the broadcast threshold and flipped the roles).
    import org.apache.spark.sql.execution.exchange.{ShuffleExchangeExec, REPARTITION_BY_NUM}
    def deep(n: SparkPlan): Seq[SparkPlan] = n +: (n.children ++ (n match {
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => Seq(r.child)
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case t: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
        Seq(t.relation.cachedPlan)
      case _ => Nil
    })).flatMap(deep)
    for (q <- Seq("dedup_simhash", "dedup_minhash_lsh", "dedup_ngram_jaccard",
        "dedup_embedding")) {
      val p = executed(pipeline.Dedup.queries(q)(spark, sf))
      val pins = deep(p).distinct.collect {
        case s: ShuffleExchangeExec if s.shuffleOrigin == REPARTITION_BY_NUM => s
      }
      assert(pins.size >= 2,
        s"$q must pin BOTH expansion sides (member table AND pair list) with " +
          s"REPARTITION_BY_NUM exchanges, found ${pins.size} — an unpinned side " +
          "becomes the stream side when the other broadcasts and the copies² " +
          "fan-out collapses to the few partitions of its lineage")
    }
  }
}
