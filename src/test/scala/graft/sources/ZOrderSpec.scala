package graft.sources

import graft.SparkSpec

/** Z-order layout: correctness of the interleave and the locality it buys. */
class ZOrderSpec extends SparkSpec {

  test("zvalue interleaves bits exactly (reference implementation check)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    def mortonRef(x: Long, y: Long): Long = {
      var z = 0L
      var i = 0
      while (i < 16) {
        z |= ((x >> i) & 1L) << (2 * i)
        z |= ((y >> i) & 1L) << (2 * i + 1)
        i += 1
      }
      z
    }
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 0L), (0L, 65535L),
      (65535L, 65535L), (12345L, 54321L), (1L, 1L), (255L, 256L))
    val got = cases.toDF("x", "y")
      .select(ZOrder.zvalue(col("x"), col("y")).as("z"))
      .collect().map(_.getLong(0))
    assert(got.toSeq == cases.map { case (x, y) => mortonRef(x, y) })
  }

  test("z-order clustering co-locates both dimensions better than single-key order") {
    val rows = ZOrder.queries("zorder_cluster")(spark, sf)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(rows.length > 1000)
    // footer-pruning proxy: sum over 64-row "files" of per-file
    // (x-range + y-range); smaller = tighter min/max = more pruning
    def blockCost(rs: Array[(Long, Long)]): Double =
      rs.grouped(64).map { b =>
        val (xs, ys) = (b.map(_._1), b.map(_._2))
        (xs.max - xs.min).toDouble + (ys.max - ys.min).toDouble
      }.sum
    val zCost = blockCost(rows)
    // baseline: the same rows laid out by x alone (perfect for x, blind to y)
    val xCost = blockCost(rows.sortBy(_._1))
    assert(zCost < xCost * 0.75,
      s"z-order two-dim locality ($zCost) must beat single-key layout ($xCost)")
  }
}
