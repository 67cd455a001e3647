package graft.graph

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphsSpec extends SparkSpec {

  test("connected components: min-label propagation on a known graph") {
    val s = spark
    import s.implicits._
    // two components: {1,2,3} and {10,11}; plus isolated self-loop 20
    val e0 = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 20L)).toDF("src", "dst")
    val e = e0.union(e0.select($"dst".as("src"), $"src".as("dst")))
    // run the propagation inline (same loop as connectedComponents, local edges)
    var labels = e.select($"src".as("node")).distinct().withColumn("label", $"node")
    (1 to 5).foreach { _ =>
      val msgs = e.join(labels, e("dst") === labels("node")).select(e("src").as("node"), $"label")
      labels = labels.union(msgs).groupBy("node").agg(min("label").as("label"))
    }
    val comp = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp(1L) == 1L && comp(2L) == 1L && comp(3L) == 1L)
    assert(comp(10L) == 10L && comp(11L) == 10L)
    assert(comp(20L) == 20L)
  }

  test("sssp: hop distances from the min vertex") {
    val rows = Graphs.sssp(spark, sf).collect()
    assert(rows.nonEmpty)
    val dist = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    val source = dist.keys.min
    assert(dist(source) == 0L, "source at distance 0")
    // bipartite customer↔supplier graph: odd distances land in supplier id
    // space, even in customer space
    assert(dist.forall { case (n, d) =>
      if (d % 2 == 1) n >= 1000000L else n < 1000000L || d == 0L })
  }

  test("label propagation: labels converge toward dominant components") {
    val rows = Graphs.labelPropagation(spark, sf, iters = 5).collect()
    assert(rows.nonEmpty)
    // every node ends with SOME neighbor-derived label; far fewer distinct
    // labels than nodes after 5 rounds on a dense bipartite graph
    val labels = rows.map(_.getLong(1)).distinct
    assert(labels.length < rows.length / 10)
  }

  test("pagerank: star center dominates, mass conserved") {
    val df = Graphs.pageRank(spark, sf, iters = 5)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // scaled ranks average ≈ 1 (mass conservation up to dangling-node loss)
    val mean = rows.map(_.getDouble(1)).sum / rows.length
    assert(mean > 0.5 && mean < 1.5, s"mean scaled rank $mean out of range")
  }

  test("session caches evict on session end and never survive eviction") {
    val s = spark
    // populate both caches (edges + coNeighbors via jaccard)
    val e = Graphs.edges(s, sf)
    e.count()
    Graphs.jaccardIndex(s, sf).limit(1).collect()
    assert(Graphs.cachedEntryCount(s) >= 2, "both caches should be populated")
    assert(e.storageLevel != org.apache.spark.storage.StorageLevel.NONE)
    // same path the registered onApplicationEnd listener runs at stop —
    // exercised directly because stopping the suite-shared SparkContext
    // would take down every later suite in this JVM
    Graphs.evictSession(s)
    assert(Graphs.cachedEntryCount(s) == 0, "eviction must clear the session's entries")
    assert(e.storageLevel == org.apache.spark.storage.StorageLevel.NONE,
      "evicted edge lists must be unpersisted")
    // the cache refills (and re-hooks) cleanly after eviction
    assert(Graphs.edges(s, sf).count() == e.count())
    Graphs.evictSession(s)
  }
}
