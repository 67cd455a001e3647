package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Similarity search over an embedding column (`embeddings.embedding`,
  * Array[Float] ×64).
  *
  * Two paths, mirroring a production ANN stack:
  *  - `cosineTopK`: exact brute-force top-k — the correctness baseline.
  *    O(Q×N) with Q kept small; at 100 TB this is only for oracle checks.
  *  - `annIvf`: IVF search — coarse-quantize the corpus into GEOMETRIC
  *    cells (nearest-seed L2 assignment, the same deterministic quantizer
  *    `kmeansStep` scores) and probe each query's 2 nearest cells. The
  *    candidate set drops by ~k/nprobe× while the big side never shuffles;
  *    at scale you'd grow k ~ √N and bucket-partition the table by cell so
  *    probes are partition-pruned scans.
  *
  * Dot products run as sequential left folds in double precision — the
  * same order and arithmetic the DuckDB oracle uses, so results are
  * bit-identical; ranking ties are broken by vec_id.
  */
object Similarity {
  type QFn = (SparkSession, String) => DataFrame

  private def withNorm(df: DataFrame): DataFrame =
    df.select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("v"))
      .withColumn("norm", sqrt(call_function("dot_f64", col("v"), col("v"))))

  private def cosine(a: Column, b: Column, na: Column, nb: Column): Column =
    call_function("dot_f64", a, b) / (na * nb)

  /** Exact brute-force cosine top-3 for a fixed query subset.
    *
    * The query set (`vec_id % 50 = 0 AND vec_id < 1500`, here and in the
    * LSH/IVF/PQ variants) is BOUNDED at ≤30 ids: a query workload does not
    * grow with the corpus, and the round-8 sf1 probe showed the unbounded
    * `% 50` version turning every top-k scan quadratic (N queries × N
    * codes — 27× wall-clock for 10× data on the PQ row). At sf0.01 every
    * id is < 1500, so the oracle gate is unchanged. */
  private def cosineTopK(s: SparkSession, dir: String): DataFrame = {
    val e = withNorm(Tables.load(s, dir, "embeddings"))
    val q = e.filter(col("vec_id") % 50 === 0 && col("vec_id") < 1500)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("norm").as("qn"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    q.join(e, col("vec_id") =!= col("q_id"))
      .withColumn("cos", cosine(col("qv"), col("v"), col("qn"), col("norm")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("q_id"), col("rn").as("rank"), col("vec_id").as("neighbor"),
              round(col("cos"), 6).as("cosine"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** IVF-probed ANN — geometry-derived coarse cells, nprobe = 2.
    *
    * Round 9 replaced the earlier `label`-as-cell probe: the fixture's
    * label is UNCORRELATED with vector geometry (measured at sf0.01: 2/30
    * of the true top-3 neighbors share the query's label — label-probing
    * is filtered search, not approximate-nearest-neighbor). A real IVF
    * derives its cells from the data: here every vector lands in its
    * L2-argmin cell over the 8 deterministic seed centroids (ties to the
    * smaller cid, exactly [[kmeansStep]]'s assignment), and each query
    * scans only its 2 nearest cells' vectors. Measured at sf0.01:
    * recall@3 = 0.50 for a 0.25 scan fraction — the corpus is
    * near-isotropic, and geometry still doubles the random-probe baseline
    * (SimilaritySpec pins the recall floor against the brute-force run).
    *
    * Scale shape: assignment is broadcast(k) × scan + one shuffle on
    * vec_id to attach cells; the probe side BROADCASTS the bounded
    * (query × nprobe) table (≤ 60 rows) onto the assigned corpus — the
    * big side never shuffles on the 8-value cell key, so parallelism
    * stays the scan's, not k's. */
  private def annIvf(s: SparkSession, dir: String): DataFrame = {
    val e = withNorm(Tables.load(s, dir, "embeddings"))
      .select(col("vec_id"), col("v"), col("norm"))
    val cent = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("v").as("cv"), col("norm").as("cn"))
    val d2 = col("norm") * col("norm") + col("cn") * col("cn") -
      lit(2.0) * call_function("dot_f64", col("v"), col("cv"))
    val dist = e.crossJoin(broadcast(cent))
      .select(col("vec_id"), col("cid"), d2.as("d2"))
    val asn = dist.groupBy(col("vec_id"))
      .agg(min(struct(col("d2"), col("cid"))).as("m"))
      .select(col("vec_id"), col("m.cid").as("cell"))
    val pw = Window.partitionBy(col("vec_id")).orderBy(col("d2"), col("cid"))
    val probes = dist.filter(col("vec_id") % 50 === 0 && col("vec_id") < 1500)
      .withColumn("pr", row_number().over(pw)).filter(col("pr") <= 2)
      .select(col("vec_id").as("q_id"), col("cid").as("qcell"))
    val q = e.filter(col("vec_id") % 50 === 0 && col("vec_id") < 1500)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("norm").as("qn"))
      .join(probes, "q_id")
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    e.join(asn, "vec_id")
      .join(broadcast(q),
        col("cell") === col("qcell") && col("vec_id") =!= col("q_id"))
      .withColumn("cos", cosine(col("qv"), col("v"), col("qn"), col("norm")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("q_id"), col("rn").as("rank"), col("vec_id").as("neighbor"),
              round(col("cos"), 6).as("cosine"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** One distributed Lloyd (k-means) assignment+update step — the batch ML
    * primitive an embedding pipeline runs to BUILD the IVF clustering that
    * `annIvf` probes. Seeds = the first 8 vectors (deterministic, the
    * k-means|| stand-in); each vector joins the broadcast centroid table,
    * takes the L2-argmin (ties to the smaller centroid id via min(struct)),
    * and the update is one partial-aggregated shuffle per centroid: count +
    * within-cluster inertia. Scale shape: broadcast(k rows) × scan, no
    * all-pairs, no driver loop. */
  private def kmeansStep(s: SparkSession, dir: String): DataFrame = {
    val e = withNorm(Tables.load(s, dir, "embeddings"))
      .select(col("vec_id"), col("v"), col("norm"))
    val cent = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("v").as("cv"), col("norm").as("cn"))
    val d2 = col("norm") * col("norm") + col("cn") * col("cn") -
      lit(2.0) * call_function("dot_f64", col("v"), col("cv"))
    val assigned = e.crossJoin(broadcast(cent))
      .select(col("vec_id"), col("cid"), d2.as("d2"))
      .groupBy(col("vec_id"))
      .agg(min(struct(col("d2"), col("cid"))).as("m"))
      .select(col("vec_id"), col("m.cid").as("cid"), col("m.d2").as("d2"))
    assigned.groupBy(col("cid"))
      .agg(count(lit(1)).as("n_assigned"),
        round(sum(col("d2")), 6).as("inertia"))
      .orderBy(col("cid"))
  }

  /** Int8 scalar quantization — the embedding-storage compression step
    * (4× smaller vectors for ANN recall at scale). Per-dimension max-abs
    * over the corpus (one posexplode + 64-group aggregate, broadcast back),
    * then each vector quantizes per-row: q_d = round(127·x_d / absmax_d).
    * Output per vector: L2 reconstruction error — the quality metric a
    * pipeline monitors when deciding the quantization level. The per-dim
    * stats table is 64 rows at ANY corpus size (broadcast by construction);
    * the quantize pass is a pure projection over the scan. */
  private def quantizeInt8(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val dimStats = e.select(posexplode(col("v")).as(Seq("d", "x")))
      .groupBy(col("d")).agg(max(abs(col("x"))).as("absmax"))
      .groupBy().agg(map_from_arrays(
        collect_list(col("d")), collect_list(col("absmax"))).as("mx"))
    val errSq = aggregate(
      transform(col("v"), (x, i) => {
        // clamp the divisor: an all-zero dimension has absmax 0, and x/0 is
        // NULL under non-ANSI division — with the epsilon both engines
        // quantize a degenerate dimension to exactly 0 error
        val m = greatest(element_at(col("mx"), i), lit(1e-12))
        val r = x - round(x * 127.0 / m) * m / 127.0
        r * r
      }),
      lit(0.0), (acc, y) => acc + y)
    e.crossJoin(broadcast(dimStats))
      .select(col("vec_id"), round(sqrt(errSq), 6).as("l2_err"))
      .orderBy(col("vec_id"))
  }

  /** Product-quantization ANN (Jégou et al., "Product Quantization for
    * Nearest Neighbor Search"): split the 64-dim embedding into m=4
    * 16-dim subspaces, quantize each subvector to its nearest of k=8
    * codebook centroids, and answer queries by Asymmetric Distance
    * Computation — per DB vector the distance is m map lookups into the
    * query's precomputed (subspace × centroid) table instead of a d-dim
    * dot product.
    *
    * Why this is THE 100 TB similarity path: codes are m bytes per vector
    * (16× compression here, 64× at production m/k), the scan over codes is
    * a pure projection + 4 map probes (no raw vectors read — column
    * pruning drops `v`), and the query table is Q×m×k doubles broadcast to
    * every executor. Codebooks come from the same deterministic seeding as
    * [[kmeansStep]] (first k vectors; a real pipeline runs Lloyd rounds on
    * a sample first — that training is exactly kmeansStep per subspace).
    * Exact re-ranking of the ADC top-N (compose with [[cosineTopK]] over
    * the candidate set) is the standard recall patch; the oracle row
    * checks the pure-PQ ranking. */
  private def pqTopK(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val cent = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("v").as("cv"))
    // subspace sp ⊂ dims [sp*16+1, sp*16+16]; same fold order as the oracle
    def sdot(a: Column, b: Column, sp: Int): Column =
      call_function("dot_f64", slice(a, sp * 16 + 1, 16), slice(b, sp * 16 + 1, 16))
    def subD2(x: Column, sp: Int): Column =
      sdot(x, x, sp) + sdot(col("cv"), col("cv"), sp) -
        lit(2.0) * sdot(x, col("cv"), sp)

    // encode: per (vector, centroid) subspace distances — broadcast(k) ×
    // scan — then per-subspace argmin (ties → smaller cid) = the PQ code
    val pd = e.crossJoin(broadcast(cent))
      .select(Seq(col("vec_id"), col("cid")) ++
        (0 until 4).map(sp => subD2(col("v"), sp).as(s"d$sp")): _*)
    val codes = pd.groupBy(col("vec_id")).agg(
        min(struct(col("d0"), col("cid"))).as("m0"),
        min(struct(col("d1"), col("cid"))).as("m1"),
        min(struct(col("d2"), col("cid"))).as("m2"),
        min(struct(col("d3"), col("cid"))).as("m3"))
      .select(col("vec_id"), col("m0.cid").as("c0"), col("m1.cid").as("c1"),
        col("m2.cid").as("c2"), col("m3.cid").as("c3"))

    // per-query ADC lookup table: cid → (qd0..qd3), one 8-entry map per query
    val q = e.filter(col("vec_id") % 50 === 0 && col("vec_id") < 1500)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val qd = q.crossJoin(broadcast(cent))
      .select(Seq(col("q_id"), col("cid")) ++
        (0 until 4).map(sp => subD2(col("qv"), sp).as(s"qd$sp")): _*)
    val qmap = qd.groupBy(col("q_id")).agg(
      map_from_arrays(collect_list(col("cid")),
        collect_list(struct(col("qd0"), col("qd1"), col("qd2"), col("qd3")))).as("qm"))

    // ADC scan: O(m) probes per (vector, query) pair, codes only — no `v`
    val w = Window.partitionBy(col("q_id")).orderBy(col("adc"), col("vec_id"))
    codes.crossJoin(broadcast(qmap))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("adc",
        col("qm")(col("c0"))("qd0") + col("qm")(col("c1"))("qd1") +
          col("qm")(col("c2"))("qd2") + col("qm")(col("c3"))("qd3"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("q_id"), col("rn").as("rank"), col("vec_id").as("neighbor"),
        round(col("adc"), 6).as("adc"))
      .orderBy(col("q_id"), col("rank"))
  }

  def queries: Map[String, QFn] = Map(
    "sim_pq_adc_topk" -> (pqTopK _),
    "sim_cosine_topk" -> (cosineTopK _),
    "sim_ann_ivf" -> (annIvf _),
    "sim_kmeans_step" -> (kmeansStep _),
    "sim_quantize_int8" -> (quantizeInt8 _)
  )

  private val normSql =
    """SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v,
       sqrt(list_reduce(list_prepend(0.0, list_transform(CAST(embedding AS DOUBLE[]), x -> x*x)), (a,x) -> a + x)) AS nrm
       FROM embeddings"""
  private val dotSql =
    "list_reduce(list_prepend(0.0, list_transform(range(1, 65), k -> q.v[k] * e.v[k])), (a,x) -> a + x)"

  /** subspace dot over dims [sp*16+1, sp*16+16], same fold order as Spark */
  private def sdotSql(a: String, b: String, sp: Int): String =
    s"list_reduce(list_prepend(0.0, list_transform(range(${sp * 16 + 1}, ${sp * 16 + 17}), k -> $a[k] * $b[k])), (a,x) -> a + x)"
  private def subD2Sql(x: String, c: String, sp: Int): String =
    s"${sdotSql(x, x, sp)} + ${sdotSql(c, c, sp)} - 2.0 * ${sdotSql(x, c, sp)}"

  def oracles: Map[String, String] = Map(
    "sim_pq_adc_topk" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
          cent AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
          pd AS (SELECT e.vec_id, c.cid,
                   ${(0 until 4).map(sp => subD2Sql("e.v", "c.cv", sp) + s" AS d$sp").mkString(", ")}
                 FROM e CROSS JOIN cent c),
          codes AS (SELECT vec_id,
                   ${(0 until 4).map(sp => s"(list(cid ORDER BY d$sp, cid))[1] AS c$sp").mkString(", ")}
                 FROM pd GROUP BY vec_id),
          qd AS (SELECT vec_id AS q_id, cid, d0, d1, d2, d3
                 FROM pd WHERE vec_id % 50 = 0 AND vec_id < 1500),
          adc AS (SELECT qd0.q_id, x.vec_id AS neighbor,
                    qd0.d0 + qd1.d1 + qd2.d2 + qd3.d3 AS adc
                  FROM codes x
                  JOIN qd qd0 ON qd0.cid = x.c0
                  JOIN qd qd1 ON qd1.cid = x.c1 AND qd1.q_id = qd0.q_id
                  JOIN qd qd2 ON qd2.cid = x.c2 AND qd2.q_id = qd0.q_id
                  JOIN qd qd3 ON qd3.cid = x.c3 AND qd3.q_id = qd0.q_id
                  WHERE x.vec_id <> qd0.q_id),
          ranked AS (SELECT q_id, neighbor, adc,
                       row_number() OVER (PARTITION BY q_id ORDER BY adc, neighbor) AS rn
                     FROM adc)
          SELECT q_id, rn AS rank, neighbor, round(adc, 6) AS adc
          FROM ranked WHERE rn <= 3 ORDER BY q_id, rank""",
    "sim_quantize_int8" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         dims AS (SELECT k FROM range(1, 65) t(k)),
         stats AS (SELECT k, greatest(max(abs(v[k])), 1e-12) AS mx FROM e CROSS JOIN dims GROUP BY k),
         arr AS (SELECT list(mx ORDER BY k) AS mxa FROM stats)
         SELECT vec_id,
                round(sqrt(list_reduce(list_prepend(0.0, list_transform(range(1, 65),
                  k -> pow(v[k] - round(127 * v[k] / mxa[k]) * mxa[k] / 127, 2))),
                  (a, x) -> a + x)), 6) AS l2_err
         FROM e CROSS JOIN arr ORDER BY vec_id""",
    "sim_kmeans_step" ->
      s"""WITH n AS ($normSql),
          cent AS (SELECT vec_id AS cid, v AS cv, nrm AS cn FROM n WHERE vec_id < 8),
          d AS (SELECT e.vec_id, c.cid,
                  e.nrm * e.nrm + c.cn * c.cn
                    - 2.0 * list_reduce(list_prepend(0.0, list_transform(range(1, 65), k -> e.v[k] * c.cv[k])), (a,x) -> a + x)
                    AS d2
                FROM n e CROSS JOIN cent c),
          a AS (SELECT vec_id, cid, d2 FROM (
                  SELECT vec_id, cid, d2,
                         row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
                  FROM d) WHERE rn = 1)
          SELECT cid, count(*) AS n_assigned, round(sum(d2), 6) AS inertia
          FROM a GROUP BY cid ORDER BY cid""",
    "sim_cosine_topk" ->
      s"""WITH n AS ($normSql),
          scored AS (
            SELECT q.vec_id AS q_id, e.vec_id AS neighbor,
                   $dotSql / (q.nrm * e.nrm) AS cos
            FROM n q JOIN n e ON e.vec_id <> q.vec_id
            WHERE q.vec_id % 50 = 0 AND q.vec_id < 1500),
          ranked AS (
            SELECT q_id, neighbor, cos,
                   row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor) AS rn
            FROM scored)
          SELECT q_id, rn AS rank, neighbor, round(cos, 6) AS cosine
          FROM ranked WHERE rn <= 3 ORDER BY q_id, rank""",
    "sim_ann_ivf" ->
      s"""WITH n AS ($normSql),
          cent AS (SELECT vec_id AS cid, v AS cv, nrm AS cn FROM n WHERE vec_id < 8),
          d AS (SELECT e.vec_id, c.cid,
                  e.nrm * e.nrm + c.cn * c.cn
                    - 2.0 * list_reduce(list_prepend(0.0, list_transform(range(1, 65), k -> e.v[k] * c.cv[k])), (a,x) -> a + x)
                    AS d2
                FROM n e CROSS JOIN cent c),
          asn AS (SELECT vec_id, cid AS cell FROM (
                    SELECT vec_id, cid,
                           row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
                    FROM d) WHERE rn = 1),
          probes AS (SELECT vec_id AS q_id, cid AS cell FROM (
                    SELECT vec_id, cid,
                           row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
                    FROM d WHERE vec_id % 50 = 0 AND vec_id < 1500) WHERE rn <= 2),
          scored AS (
            SELECT q.vec_id AS q_id, e.vec_id AS neighbor,
                   $dotSql / (q.nrm * e.nrm) AS cos
            FROM n q
            JOIN probes p ON p.q_id = q.vec_id
            JOIN asn a ON a.cell = p.cell AND a.vec_id <> q.vec_id
            JOIN n e ON e.vec_id = a.vec_id),
          ranked AS (
            SELECT q_id, neighbor, cos,
                   row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor) AS rn
            FROM scored)
          SELECT q_id, rn AS rank, neighbor, round(cos, 6) AS cosine
          FROM ranked WHERE rn <= 3 ORDER BY q_id, rank"""
  )
}
