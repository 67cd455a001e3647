package graft.functions

import graft.SparkSpec

/** HLL NDV sketch: estimate quality and determinism. */
class SketchesSpec extends SparkSpec {

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
