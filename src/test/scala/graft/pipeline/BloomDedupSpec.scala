package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bloom-prefiltered incremental dedup: the result must be EXACT (the
  * Bloom filter only routes rows — false positives go through the exact
  * anti-join, false negatives cannot exist), and the prefilter must keep
  * genuinely-new rows out of the join. */
class BloomDedupSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: (Long, String)*) =
    rows.toDF("doc_id", "norm")

  test("exact result even at an absurd 50% fpp") {
    val hist = df(1L -> "aa", 2L -> "bb", 3L -> "cc").select("norm")
    val incoming = df(10L -> "aa", 11L -> "zz", 12L -> "bb", 13L -> "qq")
    val out = Dedup.incrementalNew(hist, incoming, fpp = 0.5)
      .as[Long].collect().toSeq
    assert(out == Seq(11L, 13L), "dups dropped, novel kept, despite Bloom noise")
  }

  test("agrees with the plain anti-join on real documents") {
    val docs = graft.Tables.load(spark, sf, "documents")
    val norm = graft.pipeline.TextFunctions.normalize(col("text"))
    val hist = docs.filter(col("doc_id") % 3 =!= 0).select(norm.as("norm"))
    val incoming = docs.filter(col("doc_id") % 3 === 0)
      .select(col("doc_id"), norm.as("norm"))
    val bloomed = Dedup.incrementalNew(hist, incoming).as[Long].collect().toSeq
    val plain = incoming.join(hist, Seq("norm"), "left_anti")
      .select(col("doc_id")).orderBy(col("doc_id")).as[Long].collect().toSeq
    assert(bloomed == plain)
    assert(bloomed.nonEmpty)
  }

  test("bloom-negative rows never reach the anti-join") {
    // all-novel incoming: at 1% fpp over 3 history keys, candidates ≈ 0,
    // so the join side is empty — the property that saves the shuffle at
    // crawl scale. (Probabilistic but overwhelmingly safe at these sizes.)
    val hist = df(1L -> "aa", 2L -> "bb", 3L -> "cc").select("norm")
    val incoming = (100L to 199L).map(i => i -> s"novel-$i").toDF("doc_id", "norm")
    val bloom = hist.stat.bloomFilter("norm", 3, 0.01)
    val candidates = incoming.collect().count(r => bloom.mightContainString(r.getString(1)))
    assert(candidates <= 2, s"expected ~1% false positives, got $candidates/100")
  }
}
