package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Leakage-safe split assignment: the property that matters is that no
  * verified near-dup cluster straddles a split boundary — hashing raw
  * doc_ids would put ~36% of 2-doc clusters across train/test. */
class SplitLeakageSpec extends SparkSpec {

  private lazy val split =
    graft.SparkEntry.queries("dedup_split_leakage")(spark, sf).cache()
  private lazy val clusters =
    graft.SparkEntry.queries("dedup_clusters")(spark, sf)

  test("every near-dup cluster lands in exactly one split") {
    val straddling = clusters.join(split, "doc_id")
      .groupBy(col("keep_id"))
      .agg(countDistinct(col("split")).as("n_splits"))
      .filter(col("n_splits") > 1)
      .count()
    assert(straddling == 0L, "a cluster crossing splits is train/test leakage")
  }

  test("covers every document exactly once, deterministically") {
    val docs = graft.Tables.load(spark, sf, "documents")
    assert(split.count() == docs.count())
    assert(split.select(col("doc_id")).distinct().count() == docs.count())
    val again = graft.SparkEntry.queries("dedup_split_leakage")(spark, sf)
    assert(split.exceptAll(again).count() == 0L && again.exceptAll(split).count() == 0L)
  }

  test("split proportions are hash-bucket 80/10/10") {
    val byS = split.groupBy(col("split")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = byS.values.sum.toDouble
    assert(byS("train") / n > 0.65 && byS("train") / n < 0.95)
    assert(byS.keySet == Set("train", "val", "test"))
  }

  test("plan broadcasts the label map — no shuffle on the corpus side") {
    val plan = graft.SparkEntry.queries("dedup_split_leakage")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.toLowerCase.contains("cartesian"))
  }
}
