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
    // nullif guard: for a zero-token document Spark's non-ANSI x/0 yields
    // NULL while DuckDB float division yields inf/NaN — nullif makes both
    // engines agree (NULL) by construction (round-7 ADVICE; same as q75).
    // lenScore divides by the literal 50, not by the count — unguarded.
    val nTok = nullif(size(toks), lit(0)).cast("double")
    val stopRatio = size(filter(toks, t => t.isin(Stopwords: _*))).cast("double") / nTok
    val diversity = size(array_distinct(toks)).cast("double") / nTok
    val lenScore = least(size(toks).cast("double") / 50.0, lit(1.0))
    Tables.load(s, dir, "documents")
      .select(
        col("doc_id"),
        round(stopRatio, 6).as("stopword_ratio"),
        round(diversity, 6).as("diversity"),
        round(lenScore, 6).as("len_score"),
        round(lenScore * 0.4 + stopRatio * 0.2 + diversity * 0.4, 6).as("quality"))
      .orderBy(col("doc_id"))
  }

  /** Model-based quality filter — the fastText-style hashed linear
    * classifier shape every modern curation pipeline runs (DCLM's fastText
    * filter, FineWeb-Edu's scorer): hashing-trick features (poly_hash mod
    * 64 buckets), a fixed weight vector, mean-pooled bag-of-words logit,
    * keep-if-positive. The WEIGHTS here are a deterministic stand-in
    * (w_b = ((b·37) mod 21 − 10)/10 — the sandbox trains no model), but
    * the execution shape is the real one: a pure per-row codegen
    * projection over the scan, no shuffle, model broadcast-free because
    * it is an expression. The squash is algebraic (z/(1+|z|)) rather than
    * the logistic exp — bit-identical across engines where libm exp is
    * not. Sequential fold over the token list keeps the double sum
    * order-identical in both engines. */
  private def qualityModel(s: SparkSession, dir: String): DataFrame = {
    val toks = tokens(col("text"))
    val z = aggregate(toks, lit(0.0), (acc, t) =>
        acc + (call_function("poly_hash", t) % 64 * 37 % 21 - 10)
          .cast("double") / 10.0) /
      nullif(size(toks), lit(0)) - 0.05
    Tables.load(s, dir, "documents")
      .withColumn("zt", z)
      .select(col("doc_id"),
        round(col("zt"), 6).as("logit"),
        round(col("zt") / (lit(1.0) + abs(col("zt"))), 6).as("score"),
        (col("zt") >= 0).cast("int").as("kept"))
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

  /** TF-IDF top-3 terms per document. Classic inverted-index weighting:
    * tf = term count in doc, idf = ln(N / df). Shuffle budget: one shuffle
    * to (doc, term), one tiny term→df aggregate (broadcast back), one
    * window shuffle for the per-doc top-k — df and N are per-*vocabulary*
    * aggregates, millions of rows where the corpus is billions, so both
    * broadcast at any realistic scale. */
  private def tfidf(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = Tables.load(s, dir, "documents")
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
    val tf = toks.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = toks.select(countDistinct(col("doc_id")).as("n_docs"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("score").desc, col("term"))
    tf.join(broadcast(df), "term")
      .crossJoin(broadcast(n))
      .withColumn("score", col("tf") * log(col("n_docs").cast("double") / col("df")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("doc_id"), col("term"), round(col("score"), 6).as("tfidf"))
      .orderBy(col("doc_id"), col("term"))
  }

  /** Benchmark decontamination: flag training documents sharing any word
    * 8-gram with the benchmark split (here: source = 'src0' stands in for
    * the eval set). The benchmark's distinct-gram set is small at any
    * corpus scale (benchmarks are fixed-size), so it broadcasts and the
    * training side streams through a map-side semi join — the scan never
    * reshuffles. Output: contaminated doc ids with their overlap count. */
  private def decontaminate(s: SparkSession, dir: String): DataFrame = {
    val grams = Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        explode(array_distinct(shinglesOf(col("text"), 8))).as("g"))
    val bench = grams.filter(col("source") === "src0").select(col("g")).distinct()
    grams.filter(col("source") =!= "src0")
      .join(broadcast(bench), "g")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_contaminated_grams"))
      .orderBy(col("doc_id"))
  }

  // PII patterns kept to the Java∩RE2 common regex subset (character
  // classes, bounded repeats, \b, \d — no lookaround) so the DuckDB oracle
  // runs the IDENTICAL patterns. Redaction order matters: URLs first (their
  // paths contain digits), then emails, IPs, phone numbers.
  private val UrlRe = "https?://[^ ]+"
  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  private val PhoneRe = "\\+\\d{1,3} \\d{3}-\\d{4}"

  /** PII redaction + URL stripping — the scrub pass every training-data
    * pipeline runs before tokenization. The synthetic corpus carries no
    * PII, so the query deterministically INJECTS one URL/email/IP/phone
    * per document (a pure function of doc_id, reproduced verbatim by the
    * oracle) and then redacts: counts per category from the pre-redaction
    * text, plus the fully scrubbed string. Pure per-row projection —
    * regexp_replace/regexp_count are codegen'd, one WholeStageCodegen span
    * over the scan, no shuffle but the presentation sort. */
  private def piiRedact(s: SparkSession, dir: String): DataFrame = {
    val injected = concat(
      col("text"),
      lit(" see https://ex.example/p/"), col("doc_id").cast("string"),
      lit(" mail user"), col("doc_id").cast("string"), lit("@mail.example.com"),
      lit(" host 192.168."), (col("doc_id") % 256).cast("string"),
      lit("."), ((col("doc_id") * 7) % 256).cast("string"),
      lit(" call +1 555-"), (col("doc_id") % 9000 + 1000).cast("string"))
    Tables.load(s, dir, "documents")
      .withColumn("t2", injected)
      .select(
        col("doc_id"),
        regexp_count(col("t2"), lit(UrlRe)).as("n_urls"),
        regexp_count(col("t2"), lit(EmailRe)).as("n_emails"),
        regexp_count(col("t2"), lit(Ipv4Re)).as("n_ips"),
        regexp_count(col("t2"), lit(PhoneRe)).as("n_phones"),
        regexp_replace(
          regexp_replace(
            regexp_replace(
              regexp_replace(col("t2"), UrlRe, "<URL>"),
              EmailRe, "<EMAIL>"),
            Ipv4Re, "<IP>"),
          PhoneRe, "<PHONE>").as("redacted"))
      .orderBy(col("doc_id"))
  }

  /** Self-trained unigram-LM scoring — the CCNet-style "perplexity filter"
    * with the LM estimated from the corpus itself (no external model in the
    * sandbox; the real pipeline swaps in a held-out KenLM the same way).
    * Laplace-smoothed: p(w) = (c(w)+1)/(T+V); per-doc score = mean −ln p.
    * Shuffle budget: one (doc,term) tf shuffle + one tiny term→count
    * aggregate. The unigram table is vocabulary-sized (millions of rows
    * where the corpus is billions), so it broadcasts at any realistic
    * scale and the scoring join never reshuffles the corpus. */
  private def unigramPpl(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.load(s, dir, "documents")
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
    val tf = toks.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val lm = toks.groupBy(col("term")).agg(count(lit(1)).as("c"))
    val tot = toks.agg(count(lit(1)).as("t"), countDistinct(col("term")).as("v"))
    // Per-(doc,term) nll quantized to integer nano-nats BEFORE the per-doc
    // sum: a double sum over terms is partial-aggregation-order-dependent
    // (Spark's partition order ≠ DuckDB's), while an integer sum is
    // associative — the comparison gate never rides on last-ulp luck.
    val nll = -col("tf") * log((col("c") + 1).cast("double") / (col("t") + col("v")))
    val nllQ = round(nll * 1e9, 0).cast("long")
    tf.join(broadcast(lm), "term")
      .crossJoin(broadcast(tot))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("tf")).cast("long").as("n_tokens"),
        sum(nllQ).as("nll_q"))
      .withColumn("avg_nll", col("nll_q").cast("double") / 1e9 / col("n_tokens"))
      .select(
        col("doc_id"), col("n_tokens"),
        round(col("avg_nll"), 6).as("unigram_nll"),
        round(exp(col("avg_nll")), 4).as("unigram_ppl"))
      .orderBy(col("doc_id"))
  }

  /** Bigram-LM scoring — one rung up from [[unigramPpl]] toward the KenLM
    * the real CCNet pass uses: p(w2|w1) = (c(w1 w2)+1)/(c(w1)+V), per-doc
    * mean −ln p over the document's bigrams. The bigram table is bounded by
    * observed-vocabulary², and in practice by corpus size with a count
    * cutoff, so it stays broadcastable; the corpus-sized side only ever
    * shuffles once on (doc, bigram). Documents shorter than 2 tokens have
    * no bigrams and drop out (same in the oracle). */
  private def bigramPpl(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
    val bi = docs.select(col("doc_id"), explode(shinglesOf(col("text"), 2)).as("bg"))
    val uni = docs.select(explode(tokens(col("text"))).as("term"))
    val c1 = uni.groupBy(col("term")).agg(count(lit(1)).as("c1"))
    val v = uni.agg(countDistinct(col("term")).as("v"))
    val c2 = bi.groupBy(col("bg")).agg(count(lit(1)).as("c2"))
    val tf = bi.groupBy(col("doc_id"), col("bg")).agg(count(lit(1)).as("tf"))
    // Same integer nano-nat quantization as [[unigramPpl]] — see there.
    val nll = -col("tf") * log((col("c2") + 1).cast("double") / (col("c1") + col("v")))
    val nllQ = round(nll * 1e9, 0).cast("long")
    tf.join(broadcast(c2), "bg")
      .withColumn("w1", substring_index(col("bg"), " ", 1))
      .join(broadcast(c1), col("w1") === col("term"))
      .crossJoin(broadcast(v))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("tf")).cast("long").as("n_bigrams"),
        sum(nllQ).as("nll_q"))
      .withColumn("avg_nll", col("nll_q").cast("double") / 1e9 / col("n_bigrams"))
      .select(
        col("doc_id"), col("n_bigrams"),
        round(col("avg_nll"), 6).as("bigram_nll"),
        round(exp(col("avg_nll")), 4).as("bigram_ppl"))
      .orderBy(col("doc_id"))
  }

  def queries: Map[String, QFn] = Map(
    "text_token_count" -> (tokenCount _),
    "text_quality" -> (quality _),
    "text_quality_model" -> (qualityModel _),
    "text_langid" -> (langId _),
    "text_fingerprint" -> (fingerprint _),
    "text_tfidf" -> (tfidf _),
    "text_decontaminate" -> (decontaminate _),
    "text_pii_redact" -> (piiRedact _),
    "text_unigram_ppl" -> (unigramPpl _),
    "text_bigram_ppl" -> (bigramPpl _)
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
            CAST(len(list_filter(toks, x -> x IN ('the','a','of','and','to','in','is'))) AS DOUBLE) / nullif(len(toks), 0) AS stop_r,
            CAST(len(list_distinct(toks)) AS DOUBLE) / nullif(len(toks), 0) AS div_r,
            least(len(toks) / 50.0, 1.0) AS len_s
          FROM t)
          SELECT doc_id, round(stop_r, 6) AS stopword_ratio,
            round(div_r, 6) AS diversity, round(len_s, 6) AS len_score,
            round(len_s * 0.4 + stop_r * 0.2 + div_r * 0.4, 6) AS quality
          FROM r ORDER BY doc_id""",
    "text_quality_model" ->
      s"""WITH t AS (SELECT doc_id, $tokensSql AS toks FROM documents),
          z AS (SELECT doc_id,
            list_reduce(list_prepend(0.0, list_transform(toks, w ->
              CAST((list_reduce(list_prepend(0, list_transform(string_split(w, ''), c -> CAST(ascii(c) AS BIGINT))), (a, x) -> (a * 31 + x) % 1000000007) % 64 * 37) % 21 - 10 AS DOUBLE) / 10.0)),
              (a, x) -> a + x) / nullif(len(toks), 0) - 0.05 AS zt
          FROM t)
          SELECT doc_id, round(zt, 6) AS logit,
            round(zt / (1.0 + abs(zt)), 6) AS score,
            CAST(zt >= 0 AS INT) AS kept
          FROM z ORDER BY doc_id""",
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
         FROM documents ORDER BY doc_id""",
    "text_tfidf" ->
      s"""WITH toks AS (SELECT doc_id, unnest($tokensSql) AS term FROM documents),
          tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
          df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
          n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM toks),
          scored AS (SELECT doc_id, term,
                       tf * ln(CAST((SELECT n_docs FROM n) AS DOUBLE) / df) AS score
                     FROM tf JOIN df USING (term))
          SELECT doc_id, term, round(score, 6) AS tfidf FROM (
            SELECT *, row_number() OVER (PARTITION BY doc_id
                        ORDER BY score DESC, term) AS rn FROM scored)
          WHERE rn <= 3
          ORDER BY doc_id, term""",
    "text_decontaminate" ->
      s"""WITH t AS (SELECT doc_id, source, $tokensSql AS tk FROM documents),
          g AS (SELECT doc_id, source,
                  unnest(list_distinct(list_transform(
                    range(1, greatest(len(tk) - 6, 1)),
                    i -> array_to_string(tk[i:i+7], ' ')))) AS g
                FROM t),
          bench AS (SELECT DISTINCT g FROM g WHERE source = 'src0')
          SELECT doc_id, count(*) AS n_contaminated_grams
          FROM g JOIN bench USING (g)
          WHERE source <> 'src0'
          GROUP BY doc_id
          ORDER BY doc_id""",
    "text_pii_redact" ->
      s"""WITH t AS (SELECT doc_id,
            concat(text, ' see https://ex.example/p/', CAST(doc_id AS VARCHAR),
                   ' mail user', CAST(doc_id AS VARCHAR), '@mail.example.com',
                   ' host 192.168.', CAST(doc_id % 256 AS VARCHAR),
                   '.', CAST((doc_id * 7) % 256 AS VARCHAR),
                   ' call +1 555-', CAST(doc_id % 9000 + 1000 AS VARCHAR)) AS t2
          FROM documents)
          SELECT doc_id,
            CAST(len(regexp_extract_all(t2, '$UrlRe')) AS INT) AS n_urls,
            CAST(len(regexp_extract_all(t2, '$EmailRe')) AS INT) AS n_emails,
            CAST(len(regexp_extract_all(t2, '$Ipv4Re')) AS INT) AS n_ips,
            CAST(len(regexp_extract_all(t2, '$PhoneRe')) AS INT) AS n_phones,
            regexp_replace(regexp_replace(regexp_replace(regexp_replace(t2,
              '$UrlRe', '<URL>', 'g'),
              '$EmailRe', '<EMAIL>', 'g'),
              '$Ipv4Re', '<IP>', 'g'),
              '$PhoneRe', '<PHONE>', 'g') AS redacted
          FROM t ORDER BY doc_id""",
    "text_unigram_ppl" ->
      s"""WITH toks AS (SELECT doc_id, unnest($tokensSql) AS term FROM documents),
          tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
          lm AS (SELECT term, count(*) AS c FROM toks GROUP BY 1),
          tot AS (SELECT count(*) AS t, count(DISTINCT term) AS v FROM toks),
          d0 AS (SELECT doc_id,
                  CAST(sum(tf) AS BIGINT) AS n_tokens,
                  sum(CAST(round(-tf * ln(CAST(c + 1 AS DOUBLE) / (t + v)) * 1e9, 0) AS BIGINT)) AS nll_q
                FROM tf JOIN lm USING (term) CROSS JOIN tot
                GROUP BY doc_id),
          d AS (SELECT doc_id, n_tokens,
                  CAST(nll_q AS DOUBLE) / 1e9 / n_tokens AS avg_nll
                FROM d0)
          SELECT doc_id, n_tokens,
                 round(avg_nll, 6) AS unigram_nll,
                 round(exp(avg_nll), 4) AS unigram_ppl
          FROM d ORDER BY doc_id""",
    "text_bigram_ppl" ->
      s"""WITH tk AS (SELECT doc_id, $tokensSql AS tk FROM documents),
          bi AS (SELECT doc_id,
                   unnest(list_transform(range(1, greatest(len(tk), 1)),
                     i -> array_to_string(tk[i:i+1], ' '))) AS bg
                 FROM tk),
          uni AS (SELECT unnest(tk) AS term FROM tk),
          c1 AS (SELECT term, count(*) AS c1 FROM uni GROUP BY 1),
          v AS (SELECT count(DISTINCT term) AS v FROM uni),
          c2 AS (SELECT bg, count(*) AS c2 FROM bi GROUP BY 1),
          tf AS (SELECT doc_id, bg, count(*) AS tf FROM bi GROUP BY 1, 2),
          d0 AS (SELECT doc_id,
                  CAST(sum(tf) AS BIGINT) AS n_bigrams,
                  sum(CAST(round(-tf * ln(CAST(c2 + 1 AS DOUBLE) / (c1 + v)) * 1e9, 0) AS BIGINT)) AS nll_q
                FROM tf JOIN c2 USING (bg)
                     JOIN c1 ON split_part(bg, ' ', 1) = c1.term
                     CROSS JOIN v
                GROUP BY doc_id),
          d AS (SELECT doc_id, n_bigrams,
                  CAST(nll_q AS DOUBLE) / 1e9 / n_bigrams AS avg_nll
                FROM d0)
          SELECT doc_id, n_bigrams,
                 round(avg_nll, 6) AS bigram_nll,
                 round(exp(avg_nll), 4) AS bigram_ppl
          FROM d ORDER BY doc_id"""
  )
}
