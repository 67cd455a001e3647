package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.pipeline.TextFunctions._

/** Deterministic distinct-count sketching — HyperLogLog built from plain
  * codegen'd expressions over the engine-agnostic poly_hash, so the sketch
  * is bit-reproducible in any engine (the DuckDB oracle recomputes it
  * exactly; stock approx_count_distinct could never be oracle-gated).
  *
  * Why it matters at 100 TB: the register array is MERGEABLE state — the
  * groupBy(key, register) → max(rho) pass partial-aggregates map-side, so
  * a corpus-wide NDV costs one shuffle of at most |keys|×256 rows, versus
  * countDistinct's shuffle of every distinct value. The estimator math
  * stays exact across engines because every summand is a power of two
  * (sums of ≤256 such terms are exact in IEEE doubles, order-free).
  */
object Sketches {
  type QFn = (SparkSession, String) => DataFrame

  private val M = 256 // registers (2^8); standard error ≈ 1.04/√m ≈ 6.5%
  private val MaxRho = 30

  /** Per-language distinct-token NDV: HLL estimate next to the exact count
    * (the spec asserts the estimate lands inside the sketch's error bound). */
  private def hllNdv(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.load(s, dir, "documents")
      .select(col("lang"), explode(tokens(col("text"))).as("term"))
    val rho = when(col("rest") === 0, lit(MaxRho))
      .otherwise(log2(col("rest").bitwiseAND(-col("rest"))).cast("int") + 1)
    val regs = toks
      .withColumn("h", polyHash(col("term")))
      .withColumn("reg", col("h").bitwiseAND(lit(255L)))
      .withColumn("rest", shiftright(col("h"), 8))
      .withColumn("rho", rho)
      .groupBy(col("lang"), col("reg"))
      .agg(max(col("rho")).as("mx"))
    val alpha = lit(0.7213) / (lit(1.0) + lit(1.079) / M)
    val perLang = regs.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_hit"),
        sum(pow(lit(2.0), -col("mx"))).as("sp"))
      .withColumn("zeros", lit(M) - col("n_hit"))
      .withColumn("raw", alpha * M * M / (col("sp") + col("zeros").cast("double")))
    val est = when(col("raw") <= 2.5 * M && col("zeros") > 0,
      lit(M.toDouble) * log(lit(M.toDouble) / col("zeros").cast("double")))
      .otherwise(col("raw"))
    val exact = toks.groupBy(col("lang")).agg(countDistinct(col("term")).as("ndv_exact"))
    perLang.join(exact, "lang")
      .select(col("lang"), col("ndv_exact"), col("n_hit").as("registers_hit"),
        round(est, 4).as("ndv_est"))
      .orderBy(col("lang"))
  }

  private val CmsW = 512 // buckets per row; ε ≈ e/512 of total mass
  private val CmsD = 4 // hash rows; failure prob ≈ e^-4
  /** Fixed probe mix over the synthetic corpus vocabulary: frequent terms,
    * the rare tail ('dup'), and a token absent from the corpus (its
    * estimate is pure collision mass — CMS never underestimates, so
    * exact ≤ est always holds). */
  private val CmsProbes: Seq[String] =
    Seq("join", "hash", "scan", "table", "stream", "the", "dup", "zzz_absent_zzz")

  /** Count-min sketch term-frequency estimation next to the exact counts —
    * the frequency companion to [[hllNdv]]'s NDV sketch, on the same
    * engine-agnostic poly_hash so the DuckDB oracle recomputes it exactly.
    *
    * Why it matters at 100 TB: the d×w counter grid is MERGEABLE state —
    * the groupBy(row, bucket) count partial-aggregates map-side, so the
    * corpus-wide sketch costs one shuffle of ≤ d·w = 2048 rows regardless
    * of corpus size, versus the full term-frequency table's shuffle of
    * every distinct term. Estimates then come from a broadcast of the tiny
    * grid onto the probe list. Overestimate-only by construction
    * (Cormode–Muthukrishnan); the spec asserts est ≥ exact and the ε·N
    * error bound. */
  private def cmsFreq(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.load(s, dir, "documents")
      .select(explode(tokens(col("text"))).as("term"))
    val hashed = toks.withColumn("h", polyHash(col("term")))
    def buckets(h: org.apache.spark.sql.Column) = array((0 until CmsD).map(j =>
      struct(lit(j).as("j"), (rehash(h, j) % CmsW).as("bucket"))): _*)
    val sketch = hashed
      .select(explode(buckets(col("h"))).as("jb"))
      .groupBy(col("jb.j").as("j"), col("jb.bucket").as("bucket"))
      .agg(count(lit(1)).as("c"))
    val probes = s.createDataFrame(
      CmsProbes.map(Tuple1.apply)).toDF("term")
      .withColumn("h", polyHash(col("term")))
      .select(col("term"), explode(buckets(col("h"))).as("jb"))
      .select(col("term"), col("jb.j").as("j"), col("jb.bucket").as("bucket"))
    val est = probes
      .join(broadcast(sketch), Seq("j", "bucket"), "left")
      .groupBy(col("term"))
      .agg(min(coalesce(col("c"), lit(0L))).as("freq_est"))
    // exact counts only for the probe list (a pushed-down IN filter — the
    // full term-frequency table never materializes, let alone broadcasts)
    val exact = toks.filter(col("term").isin(CmsProbes: _*))
      .groupBy(col("term")).agg(count(lit(1)).as("freq_exact"))
    est.join(broadcast(exact), Seq("term"), "left")
      .select(col("term"), coalesce(col("freq_exact"), lit(0L)).as("freq_exact"),
        col("freq_est"))
      .orderBy(col("term"))
  }

  def queries: Map[String, QFn] = Map(
    "agg_hll_ndv" -> (hllNdv _),
    "agg_cms_freq" -> (cmsFreq _)
  )

  private def polyHashSqlOf(v: String): String =
    s"list_reduce(list_prepend(0, list_transform(string_split($v, ''), c -> CAST(ascii(c) AS BIGINT))), (a, x) -> (a * 31 + x) % 1000000007)"

  def oracles: Map[String, String] = Map(
    "agg_hll_ndv" ->
      s"""WITH toks AS (SELECT lang, unnest(string_split(trim(text), ' ')) AS term FROM documents),
          hs AS (SELECT lang, term, ${polyHashSqlOf("term")} AS h FROM toks),
          r AS (SELECT lang, h & 255 AS reg, h >> 8 AS rest FROM hs),
          rr AS (SELECT lang, reg,
                   CASE WHEN rest = 0 THEN $MaxRho
                        ELSE CAST(log2(rest & -rest) AS INT) + 1 END AS rho
                 FROM r),
          regs AS (SELECT lang, reg, max(rho) AS mx FROM rr GROUP BY 1, 2),
          pl AS (SELECT lang, count(*) AS n_hit,
                   sum(pow(2.0, -mx)) AS sp
                 FROM regs GROUP BY 1),
          est AS (SELECT lang, n_hit, $M - n_hit AS zeros,
                   (0.7213 / (1.0 + 1.079 / $M)) * $M * $M
                     / (sp + CAST($M - n_hit AS DOUBLE)) AS raw
                 FROM pl),
          ex AS (SELECT lang, count(DISTINCT term) AS ndv_exact FROM toks GROUP BY 1)
          SELECT est.lang, ndv_exact, n_hit AS registers_hit,
                 round(CASE WHEN raw <= 2.5 * $M AND zeros > 0
                       THEN $M.0 * ln($M.0 / zeros) ELSE raw END, 4) AS ndv_est
          FROM est JOIN ex ON est.lang = ex.lang ORDER BY est.lang""",
    "agg_cms_freq" -> {
      val probeList = CmsProbes.map(t => s"'$t'").mkString("[", ", ", "]")
      s"""WITH toks AS (SELECT unnest(string_split(trim(text), ' ')) AS term FROM documents),
          hs AS (SELECT ${polyHashSqlOf("term")} AS h FROM toks),
          jb AS (SELECT j.j AS j,
                   ((h * (2*j.j + 1) + (7919*j.j + 1)) % 1000000007) % $CmsW AS bucket
                 FROM hs, range(0, $CmsD) j(j)),
          sk AS (SELECT j, bucket, count(*) AS c FROM jb GROUP BY 1, 2),
          probes AS (SELECT unnest($probeList) AS term),
          ph AS (SELECT term, ${polyHashSqlOf("term")} AS h FROM probes),
          pb AS (SELECT term, j.j AS j,
                   ((h * (2*j.j + 1) + (7919*j.j + 1)) % 1000000007) % $CmsW AS bucket
                 FROM ph, range(0, $CmsD) j(j)),
          est AS (SELECT term, min(coalesce(c, 0)) AS freq_est
                  FROM pb LEFT JOIN sk USING (j, bucket) GROUP BY term),
          ex AS (SELECT term, count(*) AS freq_exact FROM toks
                 WHERE term IN (SELECT term FROM probes) GROUP BY term)
          SELECT est.term, coalesce(freq_exact, 0) AS freq_exact,
                 CAST(freq_est AS BIGINT) AS freq_est
          FROM est LEFT JOIN ex ON est.term = ex.term ORDER BY est.term"""
    }
  )
}
