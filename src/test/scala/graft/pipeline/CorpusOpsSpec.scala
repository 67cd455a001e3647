package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Corpus-pipeline operators: semantics invariants + the plan-shape scale
  * contract for the new ops (same discipline as PlanShapeSpec). */
class CorpusOpsSpec extends SparkSpec {

  private def executed(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    (df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }).toString
  }

  test("norm_text matches the regexp_replace reference formulation") {
    val cases = Seq(
      "Hello,  World!", "  a  b  ", "UPPER lower 123", "", "   ",
      "a.b", "a . b", "!!!", "tabs\tand\nnewlines", "ümläut ños",
      "trailing space ", " leading", "a1b2c3", "X")
    val df = spark.createDataFrame(cases.map(Tuple1(_))).toDF("t")
    val got = df.select(TextFunctions.normalize(col("t")).as("n"))
      .collect().map(_.getString(0))
    val want = df.select(
        trim(regexp_replace(regexp_replace(lower(col("t")), "[^a-z0-9 ]", ""), " +", " ")).as("n"))
      .collect().map(_.getString(0))
    assert(got.toSeq == want.toSeq)
  }

  test("text_pack: offsets stay inside the bin, bins are monotone per lang") {
    val rows = CorpusOps.queries("text_pack")(spark, sf)
      .select(col("lang"), col("doc_id"), col("bin_id"), col("bin_offset"))
      .collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(3) >= 0 && r.getLong(3) < 2048))
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val byDoc = rs.sortBy(_.getLong(1)).map(_.getLong(2))
      assert(byDoc.zip(byDoc.drop(1)).forall { case (a, b) => a <= b },
        "bin ids must be non-decreasing in concat order")
    }
  }

  test("dedup_paragraph: dup counts bounded by paragraph counts") {
    val rows = CorpusOps.queries("dedup_paragraph")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, dup, ratio) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(dup >= 0 && dup <= n)
      assert(ratio >= 0.0 && ratio <= 1.0)
    }
  }

  test("text_sample_stratified: every kept row is inside its language's bucket range") {
    val rates = Map("en" -> 20, "es" -> 40, "fr" -> 60, "de" -> 80, "zh" -> 100)
    val rows = CorpusOps.queries("text_sample_stratified")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) < rates(r.getString(1)).toLong)
    }
  }

  test("sim_lsh_topk: banded candidates only — no all-pairs join in the plan") {
    val plan = executed(CorpusOps.queries("sim_lsh_topk")(spark, sf))
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      "LSH top-k must probe band buckets, never compare all pairs")
  }

  test("pipeline_corpus_filter: all corpus signals join broadcast/hash — no cartesian, no sort-merge") {
    val plan = executed(CorpusOps.queries("pipeline_corpus_filter")(spark, sf))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      "the composite filter must never go all-pairs")
    assert(!plan.contains("SortMergeJoin"),
      "per-doc signal joins must stay hash/broadcast (doc_id equi-joins on small per-doc tables)")
  }

  test("text_chunk covers every token exactly once") {
    val chunks = CorpusOps.queries("text_chunk")(spark, sf)
      .groupBy(col("doc_id")).agg(sum(col("n_tokens")).as("tok_sum"))
    val docs = graft.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), size(TextFunctions.tokens(col("text"))).as("n_tok"))
    val bad = chunks.join(docs, "doc_id")
      .filter(col("tok_sum") =!= col("n_tok")).count()
    assert(bad == 0, "chunk token counts must partition the document")
  }

  test("graph superstep aggregate runs on the edge cache's own partitioning — no shuffle") {
    val e = graft.graph.Graphs.edges(spark, sf)
    val labels = e.select(col("src").as("node")).distinct()
      .withColumn("label", col("node")).localCheckpoint(eager = true)
    val step = e.join(broadcast(labels), e("dst") === labels("node"))
      .select(e("src").as("node"), col("label"))
      .groupBy(col("node")).agg(min(col("label")).as("label"))
    step.collect()
    // walk the executed tree: a shuffle would appear as ShuffleExchangeLike
    // (the string form also prints the cached edge list's own build plan,
    // which legitimately contains the one-time repartition)
    def stages(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] =
      p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => stages(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => q.plan +: q.plan.children.flatMap(stages)
        case other => other +: other.children.flatMap(stages)
      }
    val shuffles = stages(step.queryExecution.executedPlan).filter {
      case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => true
      case _ => false
    }
    assert(shuffles.isEmpty,
      "superstep aggregate must reuse hash(src) from the cached edge list")
  }

  test("text_boilerplate: injected per-source header/footer stripped, body survives") {
    val rows = CorpusOps.queries("text_boilerplate")(spark, sf).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      assert(r.getLong(1) >= 3, "header + >=1 body line + footer")
      assert(r.getLong(2) == 2L,
        "exactly the injected header+footer is boilerplate at 25 docs/source")
      val clean = r.getString(3)
      assert(!clean.contains("promo banner") && !clean.contains("legal notice"))
      assert(clean.nonEmpty, "body lines are unique and must survive")
    }
  }

  test("text_train_order: reproducible permutation with contiguous per-shard ranks") {
    val a = CorpusOps.queries("text_train_order")(spark, sf).collect()
    val b = CorpusOps.queries("text_train_order")(spark, sf).collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq,
      "epoch order must be reproducible across runs")
    val ids = a.map(_.getLong(0))
    assert(ids.distinct.length == ids.length && ids.length == 500,
      "output must be a permutation of the corpus")
    a.groupBy(_.getInt(1)).foreach { case (_, rs) =>
      assert(rs.map(_.getInt(2)).sorted.toSeq == (1 to rs.length).toSeq,
        "ranks within a shard are contiguous from 1")
    }
    val permuted = a.groupBy(_.getInt(1)).values.exists { rs =>
      val byPos = rs.sortBy(_.getInt(2)).map(_.getLong(0))
      byPos.zip(byPos.drop(1)).exists { case (x, y) => x > y }
    }
    assert(permuted, "hash order must differ from insertion order")
  }

  test("text_budget_mixture: per-source totals within budget, prefix-closed, no per-source global sort") {
    val out = graft.SparkEntry.queries("text_budget_mixture")(spark, sf).cache()
    val rows = out.collect()
    assert(rows.nonEmpty)
    // the kept set per source is a prefix in cum order and never overshoots
    rows.groupBy(_.getString(1)).foreach { case (_, rs) =>
      val cums = rs.map(_.getLong(3)).sorted
      val toks = rs.map(r => r.getInt(2).toLong).sum
      assert(cums.last == toks, "cum of the last kept row = sum of kept tokens (prefix)")
      assert(cums.last < 1000L, "budget is at most 999 tokens")
    }
    // scale shape: the window partitions on (source, hb) — never source
    // alone (that would be a per-source single-reducer sort at 100 TB)
    val plan = graft.SparkEntry.queries("text_budget_mixture")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("hb"), "bucketed prefix-sum must survive into the physical plan")
    out.unpersist(): Unit
  }

  test("text_source_overlap: strict upper triangle, jaccard bounded, gram-sharded join") {
    val out = graft.SparkEntry.queries("text_source_overlap")(spark, sf)
    val rows = out.collect()
    rows.foreach { r =>
      assert(r.getString(0) < r.getString(1), "matrix is the strict upper triangle")
      val j = r.getDouble(3)
      assert(j > 0.0 && j <= 1.0)
    }
    val plan = out.queryExecution.executedPlan.toString.toLowerCase
    assert(!plan.contains("cartesian"), "pair counts must come from the gram join")
  }

  test("text_unigram_ppl: smoothed scores positive, ppl consistent with nll") {
    val rows = TextAnalysis.queries("text_unigram_ppl")(spark, sf).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val (nll, ppl) = (r.getDouble(2), r.getDouble(3))
      assert(nll > 0.0, "Laplace smoothing keeps every -ln p positive")
      assert(math.abs(ppl - math.exp(nll)) < 1e-2,
        "perplexity is exp of the mean nll (up to output rounding)")
    }
  }
}
