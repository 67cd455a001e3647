package graft.functions

import graft.SparkSpec

/** HLL NDV + CMS frequency sketches: estimate quality and determinism. */
class SketchesSpec extends SparkSpec {

  test("agg_cms_freq: never underestimates, within the eps*N bound, absent term ~0") {
    val df = Sketches.queries("agg_cms_freq")(spark, sf)
    val rows = df.collect()
    assert(rows.map(_.getString(0)).toSet.contains("zzz_absent_zzz"))
    val n = graft.Tables.load(spark, sf, "documents")
      .selectExpr("sum(size(split(trim(text), ' +')))").head.getLong(0)
    val epsN = math.E / 512.0 * n
    rows.foreach { r =>
      val (term, exact, est) = (r.getString(0), r.getLong(1), r.getLong(2))
      assert(est >= exact, s"$term: CMS must never underestimate ($est < $exact)")
      assert(est - exact <= 4 * epsN,
        s"$term: overestimate ${est - exact} beyond the sketch bound $epsN")
      if (term == "zzz_absent_zzz") assert(exact == 0L)
    }
    // mergeable-state plan: the sketch grid aggregate must partial-aggregate
    // (no full term-frequency shuffle on the estimate path)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("partial_count") || plan.contains("HashAggregate"))
  }

  test("agg_hll_ndv: estimate within sketch error of exact NDV, deterministic") {
    val rows = Sketches.queries("agg_hll_ndv")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (exact, est) = (r.getLong(1).toDouble, r.getDouble(3))
      // m=256 → σ ≈ 6.5%; linear-counting regime is tighter still.
      // 3σ + slack for the tiny-cardinality corpus vocab.
      assert(est > 0.0)
      assert(math.abs(est - exact) / exact < 0.5,
        s"estimate $est too far from exact $exact")
    }
    val again = Sketches.queries("agg_hll_ndv")(spark, sf).collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }
}
