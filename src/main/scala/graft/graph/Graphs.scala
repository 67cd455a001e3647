package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.Tables

/** Graph algorithms over DataFrames (SURVEY.md §2.11 — Gelly's library:
  * ConnectedComponents, PageRank in flink-gelly library/; both are
  * vertex-centric iterations there). Spark-first: a driver-side Pregel loop
  * of declarative joins — each superstep is `messages = edges ⋈ labels` then
  * `labels' = min/sum per vertex`, all shuffle-partitioned on vertex id.
  *
  * Scale notes: the per-iteration state is persisted and the lineage is cut
  * every iteration (localCheckpoint), otherwise the plan doubles per
  * superstep and the 20th iteration replans 2^20 joins. Convergence is
  * checked with a count on the changed set — one extra job per superstep,
  * negligible against the join itself.
  *
  * Test graph: the customer–supplier bipartite graph induced by orders
  * (customer —order→ lineitem→ supplier); supplier ids offset into their own
  * space. */
object Graphs {
  type QFn = (SparkSession, String) => DataFrame

  private val SuppOffset = 1000000L

  /** The edge build (orders ⋈ lineitem + distinct) costs more than a whole
    * superstep; every algorithm in this module reads the SAME list, so it is
    * materialized once per (session, dir) — the library equivalent of a
    * session-scoped materialized view. Keyed on the session identity so a
    * stale DataFrame from a stopped test session can never leak across.
    *
    * Lifecycle: the first cache fill for a session registers a
    * SparkListener whose onApplicationEnd evicts every entry of that
    * session — in a long-lived JVM cycling sessions (test harnesses,
    * notebook kernels) the persisted DataFrames would otherwise accumulate
    * per session identity forever. */
  private val edgeCache = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  /** (undirected co-occurrence neighbors, per-vertex degree) per
    * (session, dir) — shared by Jaccard / AdamicAdar / LocalClustering,
    * which previously re-built and re-persisted it on every call. */
  private val coCache =
    new java.util.concurrent.ConcurrentHashMap[String, (DataFrame, DataFrame)]()

  private val hooked = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Drop every cached DataFrame belonging to `s` (unpersist is best-effort:
    * during a stop the block store may already be gone — removing the map
    * entries is what frees the references). Called by the stop listener;
    * package-visible so the spec can exercise the eviction path directly. */
  private[graph] def evictSession(s: SparkSession): Unit = {
    val prefix = s"${System.identityHashCode(s)}:"
    import scala.jdk.CollectionConverters._
    edgeCache.keySet.asScala.filter(_.startsWith(prefix)).toList.foreach { k =>
      Option(edgeCache.remove(k))
        .foreach(df => scala.util.Try(df.unpersist(blocking = false)))
    }
    coCache.keySet.asScala.filter(_.startsWith(prefix)).toList.foreach { k =>
      Option(coCache.remove(k)).foreach { case (und, _) =>
        scala.util.Try(und.unpersist(blocking = false))
      }
    }
    hooked.remove(prefix)
  }

  private[graph] def cachedEntryCount(s: SparkSession): Int = {
    val prefix = s"${System.identityHashCode(s)}:"
    import scala.jdk.CollectionConverters._
    edgeCache.keySet.asScala.count(_.startsWith(prefix)) +
      coCache.keySet.asScala.count(_.startsWith(prefix))
  }

  private def hookEviction(s: SparkSession): Unit = {
    val prefix = s"${System.identityHashCode(s)}:"
    if (hooked.add(prefix)) {
      s.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onApplicationEnd(
            e: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit =
          evictSession(s)
      })
    }
  }

  /** Undirected bipartite edge list: customer ↔ supplier-of-their-order.
    *
    * Cached hash-partitioned on `src`: every superstep loop in this module
    * broadcasts its per-vertex state and aggregates messages keyed by one
    * edge endpoint — and because the list is symmetric, each loop can phrase
    * its join so that endpoint is `src`. A broadcast join preserves the
    * streamed side's partitioning, so the per-superstep aggregate then needs
    * NO exchange at all: the only data movement left in a superstep is the
    * state-vector broadcast. (The alternative — keying the cache on the
    * *join* key — is worthless, since the join is a broadcast.) */
  def edges(s: SparkSession, dir: String): DataFrame = {
    hookEviction(s)
    edgeCache.computeIfAbsent(s"${System.identityHashCode(s)}:$dir", _ => {
      val e = Tables.load(s, dir, "orders")
        .join(Tables.load(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("src"), (col("l_suppkey") + SuppOffset).as("dst"))
        .distinct()
      e.union(e.select(col("dst").as("src"), col("src").as("dst")))
        .repartition(col("src"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    })
  }

  /** Connected components by min-label propagation (Gelly
    * library/ConnectedComponents.java semantics: component id = min vertex
    * id in the component).
    *
    * Per-superstep cost discipline: the edge list is hash-partitioned on the
    * join key ONCE and cached with that partitioning (InMemoryRelation keeps
    * outputPartitioning, so every superstep's join reuses it — only the tiny
    * label side shuffles); the lineage cut (localCheckpoint) is LAZY and the
    * convergence aggregate doubles as its materializing action, so each
    * superstep is a single Spark job. */
  def connectedComponents(s: SparkSession, dir: String, maxIter: Int = 50): DataFrame = withoutAqe(s) {
    val e = edges(s, dir)
    var labels = e.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
      .localCheckpoint(eager = true)
    // labels only ever decrease under min-propagation, so the label sum is
    // strictly monotone until the fixpoint — a one-stage agg per superstep
    // replaces a join-based change detector
    def labelSum(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(sum(col("label"))).head.getLong(0)
    var prevSum = labelSum(labels)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      // candidate label per node = min(own, min over neighbors' labels).
      // The neighbor-min pre-aggregates on the edge cache's own hash(src)
      // layout (broadcast join preserves it → no exchange); only the
      // per-vertex pre-aggregated result — not the message stream — meets
      // `labels` in the final tiny union-agg.
      val msgs = e.join(broadcast(labels), e("dst") === labels("node"))
        .select(e("src").as("node"), col("label"))
        .groupBy(col("node")).agg(min(col("label")).as("label"))
      val next = labels.select(col("node"), col("label"))
        .union(msgs)
        .groupBy(col("node")).agg(min(col("label")).as("label"))
        .localCheckpoint(eager = false)
      val curSum = labelSum(next) // materializes the checkpoint — one job
      labels = next
      converged = curSum == prevSum
      prevSum = curSum
      i += 1
    }
    labels.select(col("node"), col("label").as("component")).orderBy(col("node"))
  }

  /** Superstep loops re-plan a near-identical tiny query 10–50 times; AQE's
    * per-stage re-optimization is pure driver overhead there (partitioning
    * is pinned by the cached edge list). Toggled off around the loop only —
    * the one-shot queries keep AQE's skew/coalesce benefits. */
  private def withoutAqe[T](s: SparkSession)(body: => T): T = {
    val key = "spark.sql.adaptive.enabled"
    val prev = s.conf.get(key, "true")
    s.conf.set(key, "false")
    try body finally s.conf.set(key, prev)
  }

  /** PageRank, fixed iterations with damping 0.85 (Gelly
    * library/linkanalysis/PageRank.java). Out-degree-normalized push.
    * The rank vector is one row per vertex — orders of magnitude smaller
    * than the edge list at any scale — so it broadcasts; each superstep is
    * then map-side join + one partial-aggregated shuffle of contributions.
    * (At 10^9+ vertices the broadcast would swap back to a shuffled join on
    * the cached edge partitioning — the loop shape is unchanged.) */
  def pageRank(s: SparkSession, dir: String, iters: Int = 10): DataFrame = withoutAqe(s) {
    val e = edges(s, dir)
    val outDeg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    // cached partitioned on the AGGREGATION key (dst): the superstep join
    // broadcasts ranks, so the contribution aggregate below is the only
    // consumer of this layout — with hash(dst) it runs without any exchange
    val linked = e.join(outDeg, "src").repartition(col("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = e.select(col("src")).distinct().count()
    var ranks = e.select(col("src").as("node")).distinct()
      .withColumn("rank", lit(1.0 / n)).localCheckpoint(eager = true)
    // the eager per-superstep lineage cut is measurably the right call:
    // fusing all 10 supersteps into one job (no checkpoint) was tried and
    // DOUBLED the runtime — planning/AQE cost over the 10-deep nested join
    // dwarfs the per-job scheduling the cut costs
    for (_ <- 1 to iters) {
      val contribs = linked.join(broadcast(ranks), linked("src") === ranks("node"))
        .select(col("dst").as("node"), (col("rank") / col("deg")).as("c"))
      ranks = contribs.groupBy("node")
        .agg(((lit(0.15) / n) + lit(0.85) * sum(col("c"))).as("rank"))
        .localCheckpoint(eager = true)
    }
    linked.unpersist() // e is the shared module cache — leave it materialized
    // round so output is stable against sum-order jitter across runs
    ranks.select(col("node"), round(col("rank") * n, 6).as("rank_scaled"))
      .orderBy(col("rank_scaled").desc, col("node"))
  }

  /** Single-source shortest paths (Gelly library/SingleSourceShortestPaths
    * .java — scatter-gather min-distance). Unit edge weights here (hop
    * count); the fold is `min(dist + w)` so a weighted edge list drops in
    * unchanged. Source = min vertex id (deterministic). Frontier
    * representation: only reached nodes carry state, so early supersteps
    * shuffle the frontier, not the whole vertex set. Convergence: the
    * (reached-count, dist-sum) pair is monotone (count up, sum down) —
    * fixpoint when both stall, same one-agg-per-superstep discipline as CC. */
  def sssp(s: SparkSession, dir: String, maxIter: Int = 30): DataFrame = withoutAqe(s) {
    val e = edges(s, dir)
    val source = e.agg(min(col("src"))).head.getLong(0)
    var dist = e.sparkSession.range(1)
      .select(lit(source).as("node"), lit(0L).as("dist"))
      .localCheckpoint(eager = true)
    def signature(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)), sum(col("dist"))).head
      (r.getLong(0), r.getLong(1))
    }
    var prev = signature(dist)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      // the edge list is symmetric, so relax over the dst→src direction:
      // the candidate-distance pre-aggregate then lands on the cache's own
      // hash(src) layout (broadcast join preserves it → no exchange), and
      // only the per-vertex minimum meets `dist` in the tiny union-agg
      val msgs = e.join(broadcast(dist), e("dst") === dist("node"))
        .select(e("src").as("node"), (col("dist") + 1L).as("dist"))
        .groupBy(col("node")).agg(min(col("dist")).as("dist"))
      val next = dist.union(msgs)
        .groupBy(col("node")).agg(min(col("dist")).as("dist"))
        .localCheckpoint(eager = false)
      val cur = signature(next) // materializes the checkpoint — one job
      dist = next
      converged = cur == prev
      prev = cur
      i += 1
    }
    dist.orderBy(col("node"))
  }

  /** Label propagation (Gelly library/LabelPropagation.java): each vertex
    * adopts the most frequent label among its neighbors, ties to the
    * smallest label; synchronous supersteps, fixed iteration count so the
    * result is deterministic and oracle-reproducible. The per-superstep
    * argmax is a two-stage aggregation — `max(struct(count, -label))` picks
    * (max count, min label) without a window shuffle. */
  def labelPropagation(s: SparkSession, dir: String, iters: Int = 5): DataFrame = withoutAqe(s) {
    val e = edges(s, dir)
    var labels = e.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
      .localCheckpoint(eager = true)
    for (_ <- 1 to iters) {
      // zero exchanges per superstep: the broadcast join preserves the edge
      // cache's hash(src) layout, which satisfies BOTH the (n2,label)
      // clustering of the count and the n2 clustering of the argmax
      val freq = e.join(broadcast(labels), e("dst") === labels("node"))
        .select(e("src").as("n2"), col("label"))
        .groupBy(col("n2"), col("label")).agg(count(lit(1)).as("c"))
      labels = freq.groupBy(col("n2").as("node"))
        .agg(max(struct(col("c"), (-col("label")).as("nl"))).as("m"))
        .select(col("node"), (-col("m.nl")).as("label"))
        .localCheckpoint(eager = true)
    }
    labels.orderBy(col("node"))
  }

  /** Triangle enumeration (Gelly library/TriangleEnumerator.java — Schank's
    * edge-orientation algorithm). The customer–supplier graph is bipartite
    * (triangle-free), so the test graph here is supplier co-occurrence:
    * suppliers sharing an order's high-quantity lines (l_quantity >= 48
    * keeps it sparse). Every edge is oriented low-id → high-id, so each
    * triangle is enumerated exactly once by two equi-joins — no undirected
    * double-count blowup; at scale the orientation would be by degree
    * (Schank's trick bounds the join fan-out by arboricity), id order is the
    * deterministic stand-in. */
  def triangles(s: SparkSession, dir: String): DataFrame = {
    val e = coEdges(s, dir)
    val out = e.as("e1")
      .join(e.as("e2"), col("e1.dst") === col("e2.src"))
      .join(e.as("e3"),
        col("e3.src") === col("e1.src") && col("e3.dst") === col("e2.dst"))
      .select(col("e1.src").as("a"), col("e1.dst").as("b"), col("e2.dst").as("c"))
      .orderBy(col("a"), col("b"), col("c"))
    out
  }

  /** Oriented (low-id → high-id) supplier co-occurrence edge list — the
    * sparse test graph shared by triangles / similarity / clustering
    * queries. Suppliers co-occur when they share an order's high-quantity
    * lines (l_quantity >= 48 keeps it sparse — the similarity algorithms
    * are inherently Σ deg² in pair generation, so they belong on sparse
    * graphs at any scale). */
  private def coEdges(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(s, dir, "lineitem")
      .filter(col("l_quantity") >= 48)
      .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk")).distinct()
    li.as("a").join(li.as("b"),
        col("a.ok") === col("b.ok") && col("a.sk") < col("b.sk"))
      .select(col("a.sk").as("src"), col("b.sk").as("dst")).distinct()
  }

  /** Both-direction neighbor relation over the co-occurrence graph, plus
    * per-vertex degree — the generate-pairs-per-neighbor input both
    * similarity scores consume (Gelly generates the same pair stream from
    * grouped neighbor lists, JaccardIndex.java GenerateGroupPairs). */
  private def coNeighbors(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    hookEviction(s)
    coCache.computeIfAbsent(s"${System.identityHashCode(s)}:$dir", _ => {
      val e = coEdges(s, dir)
      // cached hash-partitioned on src: the z-centric pair join reads BOTH
      // of its sides from this one layout (z = src on each), so neither side
      // re-shuffles — and the degree aggregate reuses it too. Cached per
      // (session, dir): Jaccard / AdamicAdar / LocalClustering all consume
      // it, and rebuilding re-persisted a fresh copy on every call.
      val und = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
        .repartition(col("src"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val deg = und.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      (und, deg)
    })
  }

  /** Jaccard similarity (Gelly library/similarity/JaccardIndex.java:50-65 —
    * "number of shared neighbors divided by the number of distinct
    * neighbors", one row per vertex pair with ≥1 shared neighbor).
    * Pair generation is the z-centric two-path join — each shared neighbor
    * z contributes one (a,b) candidate, counted per pair; |union| then comes
    * from the degree table, never from re-scanning neighbor lists. One
    * shuffle per side of the pair join, aggregation partial map-side. */
  def jaccardIndex(s: SparkSession, dir: String): DataFrame = {
    val (und, deg) = coNeighbors(s, dir)
    val x = und.select(col("src").as("z"), col("dst").as("a"))
    val y = und.select(col("src").as("z"), col("dst").as("b"))
    val shared = x.join(y, x("z") === y("z") && col("a") < col("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("shared"))
    val out = shared
      .join(broadcast(deg.select(col("src").as("a"), col("deg").as("deg_a"))), "a")
      .join(broadcast(deg.select(col("src").as("b"), col("deg").as("deg_b"))), "b")
      .select(col("a"), col("b"), col("shared"),
        (col("deg_a") + col("deg_b") - col("shared")).as("distinct_n"),
        round(col("shared") / (col("deg_a") + col("deg_b") - col("shared")), 6)
          .as("jaccard"))
      .orderBy(col("a"), col("b"))
    out
  }

  /** Adamic-Adar similarity (Gelly library/similarity/AdamicAdar.java:59-74 —
    * "sum of the inverse logarithm of degree over shared neighbors"). Same
    * two-path pair stream as Jaccard, but each z contributes 1/ln(deg(z))
    * (deg(z) >= 2 whenever z produces a pair, so the log never vanishes);
    * the per-pair sum is a partial-aggregated shuffle. */
  def adamicAdar(s: SparkSession, dir: String): DataFrame = {
    val (und, deg) = coNeighbors(s, dir)
    val x = und.select(col("src").as("z"), col("dst").as("a"))
    val y = und.select(col("src").as("z"), col("dst").as("b"))
    val out = x.join(y, x("z") === y("z") && col("a") < col("b"))
      .join(broadcast(deg.select(col("src").as("z2"), col("deg"))), x("z") === col("z2"))
      .groupBy(col("a"), col("b"))
      .agg(round(sum(lit(1.0) / log(col("deg").cast("double"))), 6).as("aa_score"))
      .orderBy(col("a"), col("b"))
    out
  }

  /** Local clustering coefficient (Gelly library/clustering/undirected/
    * LocalClusteringCoefficient.java — per vertex: degree, triangle count,
    * score = fraction of neighbor pairs that are connected). Triangle counts
    * come from the oriented enumeration (each triangle credits all three
    * corners); vertices in no triangle surface with count 0, matching the
    * reference's zero-degree-inclusive default. */
  def localClustering(s: SparkSession, dir: String): DataFrame = {
    val (_, deg) = coNeighbors(s, dir)
    val tri = triangles(s, dir)
      .select(explode(array(col("a"), col("b"), col("c"))).as("src"))
      .groupBy(col("src")).agg(count(lit(1)).as("tri"))
    val out = deg.join(tri, Seq("src"), "left")
      .select(col("src").as("node"), col("deg").as("degree"),
        coalesce(col("tri"), lit(0L)).as("tri_count"),
        when(col("deg") >= 2,
          round(lit(2.0) * coalesce(col("tri"), lit(0L)) /
            (col("deg") * (col("deg") - 1)), 6)).otherwise(lit(0.0)).as("lcc"))
      .orderBy(col("node"))
    out
  }

  /** HITS hubs-and-authorities (Gelly library/linkanalysis/HITS.java:198 —
    * "ID, normalized hubbiness, normalized authority"; fixed iteration
    * count, scores L2-normalized every half-step). Directed edges =
    * customer → supplier-of-their-order (the directed restriction of the
    * shared edge list, so the cache is reused); the bipartite split means
    * customers carry hub mass and suppliers authority mass. The score
    * vector is per-vertex (broadcastable at any realistic vertex count);
    * each half-step is a map-side join + one partial-aggregated shuffle +
    * a scalar L2 norm. */
  def hits(s: SparkSession, dir: String, iters: Int = 5): DataFrame = withoutAqe(s) {
    // hub half-step aggregates on src (the shared cache's own layout);
    // the authority half-step needs a dst-keyed copy of the directed list —
    // one extra build shuffle traded against one per-half-step forever
    val d = edges(s, dir).filter(col("src") < SuppOffset)
    val dDst = d.repartition(col("dst")).persist(StorageLevel.MEMORY_AND_DISK)
    var hub = d.select(col("src").as("node")).distinct()
      .withColumn("h", lit(1.0)).localCheckpoint(eager = true)
    var auth: DataFrame = null
    for (_ <- 1 to iters) {
      // two jobs per iteration: each half-step's checkpoint is LAZY and the
      // L2-norm aggregate doubles as its materializing action; the
      // normalized vector is a projection over the checkpointed raw sums
      val araw = dDst.join(broadcast(hub), dDst("src") === hub("node"))
        .groupBy(dDst("dst").as("anode")).agg(sum(col("h")).as("a"))
        .localCheckpoint(eager = false)
      val an = math.sqrt(araw.agg(sum(col("a") * col("a"))).head.getDouble(0))
      auth = araw.select(col("anode").as("node"), (col("a") / an).as("a"))
      val hraw = d.join(broadcast(auth), d("dst") === auth("node"))
        .groupBy(d("src").as("hnode")).agg(sum(col("a")).as("h"))
        .localCheckpoint(eager = false)
      val hn = math.sqrt(hraw.agg(sum(col("h") * col("h"))).head.getDouble(0))
      hub = hraw.select(col("hnode").as("node"), (col("h") / hn).as("h"))
    }
    val out = hub.select(col("node"), round(col("h"), 6).as("hub_score"),
        lit(0.0).as("auth_score"))
      .union(auth.select(col("node"), lit(0.0), round(col("a"), 6)))
      .orderBy(col("node"))
      .localCheckpoint(eager = true)
    dDst.unpersist(blocking = false)
    out
  }

  /** Vertex metrics (Gelly library/metric/undirected/VertexMetrics.java —
    * vertex count, edge count, average degree, triplet count Σ C(deg,2),
    * maximum degree). One aggregate over the degree table — the whole
    * summary is a two-stage agg regardless of graph size. */
  def vertexMetrics(s: SparkSession, dir: String): DataFrame = {
    val und = edges(s, dir)
    val deg = und.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    deg.agg(
      count(lit(1)).as("n_vertices"),
      (sum(col("deg")) / 2).cast("long").as("n_edges"),
      round(avg(col("deg")), 6).as("avg_degree"),
      sum(col("deg") * (col("deg") - 1) / 2).cast("long").as("n_triplets"),
      max(col("deg")).as("max_degree"))
  }

  /** Community detection (Gelly library/CommunityDetection.java — Leung et
    * al.'s score-attenuated label propagation): each vertex sends
    * (label, score) to its neighbors; a vertex adopts the label with the
    * highest summed score (ties to the smallest label, the reference's
    * TreeMap-ascending + strict-greater scan), re-scored to that label's
    * highest single received score minus delta/superstep when the label
    * changed. delta = 0.5 (the reference default), 3 supersteps — the
    * attenuation stays dyadic wherever it feeds a later sum, so the double
    * arithmetic is order-independent and the oracle exact. */
  def communityDetection(s: SparkSession, dir: String, iters: Int = 3,
                         delta: Double = 0.5): DataFrame = withoutAqe(s) {
    val e = edges(s, dir)
    var st = e.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("label"), lit(1.0).as("score"))
      .localCheckpoint(eager = true)
    for (k <- 1 to iters) {
      // zero exchanges per superstep: the broadcast join preserves the edge
      // cache's hash(src) layout, which satisfies the clustering of BOTH
      // downstream aggregates (node,label ⊇ node) and the final per-node
      // join's other side broadcasts
      val msgs = e.join(broadcast(st), e("dst") === st("node"))
        .select(e("src").as("node"), col("label"), col("score"))
      val perLabel = msgs.groupBy(col("node"), col("label"))
        .agg(sum(col("score")).as("ssum"), max(col("score")).as("smax"))
      // argmax by (sum, min label), carrying that label's max single score
      val winner = perLabel.groupBy(col("node"))
        .agg(max(struct(col("ssum"), (-col("label")).as("nl"), col("smax"))).as("m"))
        .select(col("node"), (-col("m.nl")).as("new_label"), col("m.smax").as("wmax"))
      st = winner.join(broadcast(st.select(col("node"), col("label").as("old_label"))), "node")
        .select(col("node"), col("new_label").as("label"),
          when(col("new_label") === col("old_label"), col("wmax"))
            .otherwise(col("wmax") - lit(delta / k)).as("score"))
        .localCheckpoint(eager = true)
    }
    st.select(col("node"), col("label")).orderBy(col("node"))
  }

  /** Summarization (Gelly library/Summarization.java): condense the graph
    * by grouping vertices on their value — here the nation of each
    * customer/supplier, the natural "vertex value" of the test graph. Output
    * = one row per (source group, target group) with the edge count plus
    * both groups' vertex counts (the reference's VertexValue/EdgeValue
    * group counts, keyed by group VALUE rather than a representative id so
    * the result is deterministic). */
  def summarize(s: SparkSession, dir: String): DataFrame = {
    val labels = Tables.load(s, dir, "customer")
      .select(col("c_custkey").as("node"), concat(lit("C"), col("c_nationkey")).as("label"))
      .union(Tables.load(s, dir, "supplier")
        .select((col("s_suppkey") + SuppOffset).as("node"),
          concat(lit("S"), col("s_nationkey")).as("label")))
    val e = edges(s, dir)
    // vertex labels are per-vertex metadata — broadcast both probes so the
    // edge list never re-shuffles; the only exchange left is the tiny
    // (src_group, dst_group) aggregate
    val grouped = e
      .join(broadcast(labels.as("ls")), e("src") === col("ls.node"))
      .join(broadcast(labels.as("ld")), e("dst") === col("ld.node"))
      .groupBy(col("ls.label").as("src_group"), col("ld.label").as("dst_group"))
      .agg(count(lit(1)).as("n_edges"))
    val sizes = labels.groupBy(col("label")).agg(count(lit(1)).as("n_vertices"))
    grouped
      .join(sizes.select(col("label").as("src_group"), col("n_vertices").as("src_vertices")),
        "src_group")
      .join(sizes.select(col("label").as("dst_group"), col("n_vertices").as("dst_vertices")),
        "dst_group")
      .select(col("src_group"), col("dst_group"), col("n_edges"),
        col("src_vertices"), col("dst_vertices"))
      .orderBy(col("src_group"), col("dst_group"))
  }

  def queries: Map[String, QFn] = Map(
    "graph_connected_components" -> ((s, d) => connectedComponents(s, d)),
    "graph_pagerank" -> ((s, d) => pageRank(s, d)),
    "graph_sssp" -> ((s, d) => sssp(s, d)),
    "graph_label_propagation" -> ((s, d) => labelPropagation(s, d)),
    "graph_triangles" -> ((s, d) => triangles(s, d)),
    "graph_community" -> ((s, d) => communityDetection(s, d)),
    "graph_summarize" -> ((s, d) => summarize(s, d)),
    "graph_jaccard" -> ((s, d) => jaccardIndex(s, d)),
    "graph_adamic_adar" -> ((s, d) => adamicAdar(s, d)),
    "graph_local_clustering" -> ((s, d) => localClustering(s, d)),
    "graph_hits" -> ((s, d) => hits(s, d)),
    "graph_vertex_metrics" -> ((s, d) => vertexMetrics(s, d))
  )

  /** CC is exactly reproducible in DuckDB with a recursive CTE. PageRank's
    * 10 fixed damped iterations are 10 chained CTEs of the same double
    * arithmetic; sum-order jitter between engines stays ~1e-12 relative,
    * absorbed by the shared round(·, 6). */
  private def pageRankOracle: String = {
    val iters = (1 to 10).map { k =>
      s"""r$k AS (
         SELECT u.dst AS node,
                0.15::DOUBLE / (SELECT n FROM nn) + 0.85::DOUBLE * sum(r.rank / d.deg) AS rank
         FROM und u JOIN deg d ON u.src = d.src JOIN r${k - 1} r ON u.src = r.node
         GROUP BY u.dst)"""
    }.mkString(",\n")
    s"""WITH e0 AS (SELECT DISTINCT o_custkey AS src, l_suppkey + 1000000 AS dst
              FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       und AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
       deg AS (SELECT src, count(*) AS deg FROM und GROUP BY src),
       nn AS (SELECT count(DISTINCT src) AS n FROM und),
       r0 AS (SELECT DISTINCT src AS node, 1.0::DOUBLE / (SELECT n FROM nn) AS rank FROM und),
       $iters
       SELECT node, round(rank * (SELECT n FROM nn), 6) AS rank_scaled
       FROM r10 ORDER BY rank_scaled DESC, node"""
  }

  /** Three chained supersteps of the scatter-gather update; the QUALIFY
    * row_number picks (max summed score, min label) exactly as the Spark
    * struct-argmax does. */
  private def communityOracle: String = {
    val steps = (1 to 3).map { k =>
      s"""m$k AS (SELECT u.src AS node, c.label, c.score
             FROM und u JOIN c${k - 1} c ON u.dst = c.node),
         g$k AS (SELECT node, label, sum(score) AS ssum, max(score) AS smax
             FROM m$k GROUP BY node, label),
         w$k AS (SELECT node, label, smax FROM (
               SELECT *, row_number() OVER (PARTITION BY node
                         ORDER BY ssum DESC, label) AS rn FROM g$k) WHERE rn = 1),
         c$k AS (SELECT w.node, w.label,
                CASE WHEN w.label = p.label THEN w.smax
                     ELSE w.smax - 0.5 / $k END AS score
             FROM w$k w JOIN c${k - 1} p ON w.node = p.node)"""
    }.mkString(",\n")
    s"""WITH e0 AS (SELECT DISTINCT o_custkey AS src, l_suppkey + 1000000 AS dst
              FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       und AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
       c0 AS (SELECT DISTINCT src AS node, src AS label, 1.0::DOUBLE AS score FROM und),
       $steps
       SELECT node, label FROM c3 ORDER BY node"""
  }

  /** Shared oracle CTE prefix for the supplier co-occurrence graph (same
    * construction as [[coEdges]]/[[coNeighbors]]). */
  private val coGraphCtes =
    """li AS (SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk
              FROM lineitem WHERE l_quantity >= 48),
       ce AS (SELECT DISTINCT a.sk AS src, b.sk AS dst
              FROM li a JOIN li b ON a.ok = b.ok AND a.sk < b.sk),
       cund AS (SELECT src, dst FROM ce UNION ALL SELECT dst, src FROM ce),
       cdeg AS (SELECT src, count(*) AS deg FROM cund GROUP BY src)"""

  /** Five chained half-step pairs of the HITS update with per-half-step L2
    * normalization — the same scalar-norm-divide the Spark loop performs. */
  private def hitsOracle: String = {
    // norm via a window sum keeps each CTE referenced exactly once — a
    // scalar-subquery spelling doubles references per half-step and DuckDB
    // re-inlines the chain exponentially (measured: hangs at 5 iterations)
    val steps = (1 to 5).map { k =>
      s"""ar$k AS (SELECT d.dst AS node, sum(h.h) AS a
              FROM d JOIN h${k - 1} h ON d.src = h.node GROUP BY d.dst),
         a$k AS (SELECT node, a / sqrt(sum(a * a) OVER ()) AS a FROM ar$k),
         hr$k AS (SELECT d.src AS node, sum(a.a) AS h
              FROM d JOIN a$k a ON d.dst = a.node GROUP BY d.src),
         h$k AS (SELECT node, h / sqrt(sum(h * h) OVER ()) AS h FROM hr$k)"""
    }.mkString(",\n")
    s"""WITH d AS MATERIALIZED (
              SELECT DISTINCT o_custkey AS src, l_suppkey + 1000000 AS dst
              FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       h0 AS (SELECT DISTINCT src AS node, 1.0::DOUBLE AS h FROM d),
       $steps
       SELECT node, round(h, 6) AS hub_score, 0.0::DOUBLE AS auth_score FROM h5
       UNION ALL
       SELECT node, 0.0::DOUBLE, round(a, 6) FROM a5
       ORDER BY node"""
  }

  def oracles: Map[String, String] = Map(
    "graph_community" -> communityOracle,
    "graph_jaccard" ->
      s"""WITH $coGraphCtes,
         pairs AS (SELECT x.dst AS a, y.dst AS b, count(*) AS shared
               FROM cund x JOIN cund y ON x.src = y.src AND x.dst < y.dst
               GROUP BY x.dst, y.dst)
         SELECT p.a, p.b, p.shared,
                da.deg + db.deg - p.shared AS distinct_n,
                round(p.shared / (da.deg + db.deg - p.shared), 6) AS jaccard
         FROM pairs p JOIN cdeg da ON p.a = da.src JOIN cdeg db ON p.b = db.src
         ORDER BY a, b""",
    "graph_adamic_adar" ->
      s"""WITH $coGraphCtes
         SELECT x.dst AS a, y.dst AS b,
                round(sum(1.0 / ln(d.deg)), 6) AS aa_score
         FROM cund x JOIN cund y ON x.src = y.src AND x.dst < y.dst
         JOIN cdeg d ON x.src = d.src
         GROUP BY x.dst, y.dst
         ORDER BY a, b""",
    "graph_local_clustering" ->
      s"""WITH $coGraphCtes,
         tri AS (SELECT v, count(*) AS tri FROM (
               SELECT unnest([e1.src, e1.dst, e2.dst]) AS v
               FROM ce e1
               JOIN ce e2 ON e1.dst = e2.src
               JOIN ce e3 ON e3.src = e1.src AND e3.dst = e2.dst)
             GROUP BY v)
         SELECT d.src AS node, d.deg AS degree,
                coalesce(t.tri, 0) AS tri_count,
                CASE WHEN d.deg >= 2
                     THEN round(2.0 * coalesce(t.tri, 0) / (d.deg * (d.deg - 1)), 6)
                     ELSE 0.0::DOUBLE END AS lcc
         FROM cdeg d LEFT JOIN tri t ON d.src = t.v
         ORDER BY node""",
    "graph_hits" -> hitsOracle,
    "graph_vertex_metrics" ->
      """WITH e0 AS (SELECT DISTINCT o_custkey AS src, l_suppkey + 1000000 AS dst
              FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         und AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
         deg AS (SELECT src, count(*) AS deg FROM und GROUP BY src)
         SELECT count(*) AS n_vertices,
                CAST(sum(deg) / 2 AS BIGINT) AS n_edges,
                round(avg(deg), 6) AS avg_degree,
                CAST(sum(deg * (deg - 1) / 2) AS BIGINT) AS n_triplets,
                max(deg) AS max_degree
         FROM deg""",
    "graph_summarize" ->
      """WITH e0 AS (SELECT DISTINCT o_custkey AS src, l_suppkey + 1000000 AS dst
              FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         und AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
         lab AS (SELECT c_custkey AS node, 'C' || c_nationkey AS label FROM customer
                 UNION ALL
                 SELECT s_suppkey + 1000000, 'S' || s_nationkey FROM supplier),
         sizes AS (SELECT label, count(*) AS n_vertices FROM lab GROUP BY label),
         ge AS (SELECT ls.label AS src_group, ld.label AS dst_group, count(*) AS n_edges
                FROM und u JOIN lab ls ON u.src = ls.node JOIN lab ld ON u.dst = ld.node
                GROUP BY ls.label, ld.label)
         SELECT g.src_group, g.dst_group, g.n_edges,
                ss.n_vertices AS src_vertices, sd.n_vertices AS dst_vertices
         FROM ge g JOIN sizes ss ON g.src_group = ss.label
                   JOIN sizes sd ON g.dst_group = sd.label
         ORDER BY g.src_group, g.dst_group""",
    "graph_connected_components" ->
      """WITH RECURSIVE
           e0 AS (SELECT DISTINCT o_custkey AS src, l_suppkey + 1000000 AS dst
                  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
           und AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
           reach AS (
             SELECT src AS node, src AS r FROM und
             UNION
             SELECT u.src, reach.r FROM und u JOIN reach ON u.dst = reach.node)
         SELECT node, min(r) AS component FROM reach GROUP BY node ORDER BY node""",
    "graph_pagerank" -> pageRankOracle,
    "graph_triangles" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk
                FROM lineitem WHERE l_quantity >= 48),
         e AS (SELECT DISTINCT a.sk AS src, b.sk AS dst
               FROM li a JOIN li b ON a.ok = b.ok AND a.sk < b.sk)
         SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
         FROM e e1
         JOIN e e2 ON e1.dst = e2.src
         JOIN e e3 ON e3.src = e1.src AND e3.dst = e2.dst
         ORDER BY a, b, c""",
    // min-hop distances: bounded recursive walk (the d < 30 cap only bounds
    // the CTE; the graph's diameter is far smaller, so min(d) is exact)
    "graph_sssp" ->
      """WITH RECURSIVE
           e0 AS (SELECT DISTINCT o_custkey AS src, l_suppkey + 1000000 AS dst
                  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
           und AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
           srcn AS (SELECT min(src) AS s FROM und),
           walk(node, d) AS (
             SELECT s, CAST(0 AS BIGINT) FROM srcn
             UNION
             SELECT u.dst, w.d + 1 FROM und u JOIN walk w ON u.src = w.node
             WHERE w.d < 30)
         SELECT node, min(d) AS dist FROM walk GROUP BY node ORDER BY node""",
    "graph_label_propagation" -> {
      val iters = (1 to 5).map { k =>
        s"""l$k AS (SELECT node, label FROM (
             SELECT u.src AS node, l.label, count(*) AS c,
                    row_number() OVER (PARTITION BY u.src
                                       ORDER BY count(*) DESC, l.label) AS rn
             FROM und u JOIN l${k - 1} l ON u.dst = l.node
             GROUP BY u.src, l.label) WHERE rn = 1)"""
      }.mkString(",\n")
      s"""WITH e0 AS (SELECT DISTINCT o_custkey AS src, l_suppkey + 1000000 AS dst
                FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         und AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
         l0 AS (SELECT DISTINCT src AS node, src AS label FROM und),
         $iters
         SELECT node, label FROM l5 ORDER BY node"""
    }
  )
}
