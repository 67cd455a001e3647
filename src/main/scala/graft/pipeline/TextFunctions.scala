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

  /** Word n-gram shingles: ["a b c", "b c d", ...]. Documents shorter than
    * n tokens yield an empty array. */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
      .otherwise(array().cast("array<string>"))

  /** Deterministic polynomial string hash: fold(acc*31 + ascii(ch)) mod p.
    * Mirrors the rolling-hash document fingerprint of classic dedup
    * pipelines; reproducible in any engine with 64-bit ints. */
  def polyHash(str: Column): Column =
    aggregate(
      transform(split(str, ""), ch => ascii(ch).cast("long")),
      lit(0L),
      (acc, x) => (acc * 31L + x) % HashMod)

  /** k-th universal hash over an already-hashed value:
    * h_k(x) = ((2k+1)*x + 7919k + 1) mod p. */
  def rehash(h: Column, k: Int): Column =
    (h * (2L * k + 1L) + (7919L * k + 1L)) % HashMod

  /** MinHash signature entry k: min over the shingle-hash array. */
  def minhash(shingleHashes: Column, k: Int): Column =
    array_min(transform(shingleHashes, h => rehash(h, k)))

  /** Normalized text: lowercase, collapse whitespace, strip punctuation. */
  def normalize(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", ""), " +", " "))
}
