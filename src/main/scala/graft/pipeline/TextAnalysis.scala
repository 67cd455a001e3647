package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import TextFunctions._

/** Text-analysis operators for a training-data pipeline: token counting,
  * quality scoring, language id, document fingerprinting.
  *
  * Pure per-row projections (one WholeStageCodegen span over the scan —
  * embarrassingly parallel at any scale; the only shuffle is the final
  * presentation sort, which a real pipeline wouldn't have).
  */
object TextAnalysis {
  type QFn = (SparkSession, String) => DataFrame

  private val Stopwords = Seq("the", "a", "of", "and", "to", "in", "is")

  /** Token & subword counting: whitespace tokens plus a BPE-ish subword
    * estimate (⌈len/4⌉ per token — the standard chars/4 heuristic). */
  private def tokenCount(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .withColumn("toks", tokens(col("text")))
      .select(
        col("doc_id"),
        size(col("toks")).as("n_tokens"),
        length(trim(col("text"))).as("n_chars"),
        aggregate(col("toks"), lit(0L),
          (acc, t) => acc + ceil(length(t) / 4.0)).as("n_subwords"),
        size(array_distinct(col("toks"))).as("n_distinct"))
      .orderBy(col("doc_id"))

  /** Quality scoring: length/stopword/diversity ratios combined into a
    * single score (all exact integer ratios → deterministic doubles). */
  private def quality(s: SparkSession, dir: String): DataFrame = {
    val toks = tokens(col("text"))
    val nTok = size(toks).cast("double")
    val stopRatio = size(filter(toks, t => t.isin(Stopwords: _*))).cast("double") / nTok
    val diversity = size(array_distinct(toks)).cast("double") / nTok
    val lenScore = least(nTok / 50.0, lit(1.0))
    Tables.load(s, dir, "documents")
      .select(
        col("doc_id"),
        round(stopRatio, 6).as("stopword_ratio"),
        round(diversity, 6).as("diversity"),
        round(lenScore, 6).as("len_score"),
        round(lenScore * 0.4 + stopRatio * 0.2 + diversity * 0.4, 6).as("quality"))
      .orderBy(col("doc_id"))
  }

  /** Language id, n-gram/marker-word heuristic: score each candidate
    * language by its marker-token hits, argmax with a fixed tiebreak order.
    * (The text corpus is synthetic, so this exercises the *machinery* —
    * deterministic scoring + argmax — not linguistic accuracy.) */
  private def langId(s: SparkSession, dir: String): DataFrame = {
    val markers: Seq[(String, Seq[String])] = Seq(
      "de" -> Seq("der", "die", "das", "und", "ist"),
      "en" -> Seq("the", "a", "of", "and", "is"),
      "es" -> Seq("el", "la", "de", "y", "es"),
      "fr" -> Seq("le", "la", "de", "et", "est"),
      "zh" -> Seq("de", "shi", "le", "he", "zai"))
    val toks = tokens(col("text"))
    val scores = markers.map { case (lang, ws) =>
      lang -> size(filter(toks, t => t.isin(ws: _*)))
    }
    // argmax with alphabetical tiebreak: fold over (score, lang) keeping max
    val predicted = scores.foldLeft[(Column, Column)]((lit(-1), lit(""))) {
      case ((bs, bl), (lang, sc)) =>
        (when(sc > bs, sc).otherwise(bs), when(sc > bs, lit(lang)).otherwise(bl))
    }._2
    Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("lang").as("labeled_lang"),
              predicted.as("predicted_lang"))
      .orderBy(col("doc_id"))
  }

  /** Document fingerprint: rolling polynomial hash of the normalized text
    * (mod 1e9+7) — the classic content-defined fingerprint. */
  private def fingerprint(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .select(col("doc_id"), polyHash(normalize(col("text"))).as("fingerprint"))
      .orderBy(col("doc_id"))

  def queries: Map[String, QFn] = Map(
    "text_token_count" -> (tokenCount _),
    "text_quality" -> (quality _),
    "text_langid" -> (langId _),
    "text_fingerprint" -> (fingerprint _)
  )

  private val tokensSql = "string_split(trim(text), ' ')"

  def oracles: Map[String, String] = Map(
    "text_token_count" ->
      s"""SELECT doc_id,
          CAST(len($tokensSql) AS INT) AS n_tokens,
          CAST(length(trim(text)) AS INT) AS n_chars,
          CAST(list_sum(list_transform($tokensSql, t -> CAST(ceil(length(t) / 4.0) AS BIGINT))) AS BIGINT) AS n_subwords,
          CAST(len(list_distinct($tokensSql)) AS INT) AS n_distinct
          FROM documents ORDER BY doc_id""",
    "text_quality" ->
      s"""WITH t AS (SELECT doc_id, $tokensSql AS toks FROM documents),
          r AS (SELECT doc_id,
            CAST(len(list_filter(toks, x -> x IN ('the','a','of','and','to','in','is'))) AS DOUBLE) / len(toks) AS stop_r,
            CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS div_r,
            least(len(toks) / 50.0, 1.0) AS len_s
          FROM t)
          SELECT doc_id, round(stop_r, 6) AS stopword_ratio,
            round(div_r, 6) AS diversity, round(len_s, 6) AS len_score,
            round(len_s * 0.4 + stop_r * 0.2 + div_r * 0.4, 6) AS quality
          FROM r ORDER BY doc_id""",
    "text_langid" ->
      s"""WITH t AS (SELECT doc_id, lang, $tokensSql AS toks FROM documents),
          sc AS (SELECT doc_id, lang,
            len(list_filter(toks, x -> x IN ('der','die','das','und','ist'))) AS s_de,
            len(list_filter(toks, x -> x IN ('the','a','of','and','is'))) AS s_en,
            len(list_filter(toks, x -> x IN ('el','la','de','y','es'))) AS s_es,
            len(list_filter(toks, x -> x IN ('le','la','de','et','est'))) AS s_fr,
            len(list_filter(toks, x -> x IN ('de','shi','le','he','zai'))) AS s_zh
          FROM t)
          SELECT doc_id, lang AS labeled_lang,
            CASE greatest(s_de, s_en, s_es, s_fr, s_zh)
              WHEN s_de THEN 'de' WHEN s_en THEN 'en' WHEN s_es THEN 'es'
              WHEN s_fr THEN 'fr' ELSE 'zh' END AS predicted_lang
          FROM sc ORDER BY doc_id""",
    "text_fingerprint" ->
      """SELECT doc_id,
         list_reduce(list_prepend(0, list_transform(string_split(
           trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')),
           '' ), c -> CAST(ascii(c) AS BIGINT))), (a, x) -> (a * 31 + x) % 1000000007) AS fingerprint
         FROM documents ORDER BY doc_id"""
  )
}
