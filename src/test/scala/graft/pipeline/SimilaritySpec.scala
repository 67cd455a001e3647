package graft.pipeline

import graft.SparkSpec

/** PQ/ADC structural sanity — the value proof is the DuckDB oracle row
  * (sim_pq_adc_topk); here we pin the shape invariants. */
class SimilaritySpec extends SparkSpec {

  test("PQ ADC top-k: 3 ranked rows per query, non-negative distances") {
    val rows = Similarity.queries("sim_pq_adc_topk")(spark, sf).collect()
    val perQuery = rows.groupBy(_.getLong(0))
    assert(perQuery.nonEmpty)
    perQuery.foreach { case (q, rs) =>
      assert(rs.map(_.getInt(1)).sorted.toSeq == Seq(1, 2, 3), s"query $q ranks")
      // ADC is a sum of squared L2 subspace distances: ≥ 0 up to fp noise
      rs.foreach(r => assert(r.getDouble(3) >= -1e-9, s"query $q negative adc"))
      // self never appears as its own neighbor
      rs.foreach(r => assert(r.getLong(2) != q))
    }
  }
}
