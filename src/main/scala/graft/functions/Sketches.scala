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

  def queries: Map[String, QFn] = Map(
    "agg_hll_ndv" -> (hllNdv _)
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
          FROM est JOIN ex ON est.lang = ex.lang ORDER BY est.lang"""
  )
}
