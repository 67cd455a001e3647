package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text primitives shared by the training-data pipeline
  * operators (dedup, quality scoring, language id, fingerprinting).
  *
  * Everything is a composition of codegen'd Spark expressions — no UDFs —
  * so these run inside WholeStageCodegen and scale with the scan. All
  * hashing is engine-agnostic integer math (not JVM hashCode / xxhash) so
  * results are reproducible anywhere, including the DuckDB oracle.
  */
object TextFunctions {

  /** Prime modulus for polynomial hashes (fits comfortably in 64-bit
    * arithmetic: p*31 + 127 < 2^35). */
  val HashMod: Long = 1000000007L

  /** Whitespace tokens of a trimmed document. */
  def tokens(text: Column): Column = split(trim(text), " +")

  /** Word n-gram shingles straight off the raw text: ["a b c", "b c d", ...].
    * Documents shorter than n tokens yield an empty array. Native single-pass
    * expression (NativeExpressions.WordShingles) — the HOF formulation
    * (transform∘sequence∘slice∘concat_ws) interpreted a lambda per token and
    * dominated the dedup bench. */
  def shinglesOf(text: Column, n: Int): Column =
    call_function("word_shingles", trim(text), lit(n))

  /** Deterministic polynomial string hash: fold(acc*31 + char) mod p.
    * Mirrors the rolling-hash document fingerprint of classic dedup
    * pipelines; reproducible in any engine with 64-bit ints. Runs as the
    * native codegen'd expression graft.functions.NativeExpressions.PolyHash
    * (registered in GraftSession) — the interpreted HOF version
    * (aggregate∘transform∘split) was the bench hotspot. */
  def polyHash(str: Column): Column = call_function("poly_hash", str)

  /** k-th universal hash over an already-hashed value:
    * h_k(x) = ((2k+1)*x + 7919k + 1) mod p. */
  def rehash(h: Column, k: Int): Column =
    (h * (2L * k + 1L) + (7919L * k + 1L)) % HashMod

  /** MinHash signature entry k: min over the shingle-hash array. */
  def minhash(shingleHashes: Column, k: Int): Column =
    array_min(transform(shingleHashes, h => rehash(h, k)))

  /** Normalized text: lowercase, collapse whitespace, strip punctuation.
    * Native single-pass expression (NativeExpressions.NormText) — the
    * regexp_replace chain ran interpreted-regex per row and dominated the
    * normalized-dedup bench (java.util.regex never reaches the JIT compile
    * threshold when a scan fans out over 32 tasks). */
  def normalize(text: Column): Column = call_function("norm_text", text)
}
