package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import TextFunctions._

/** Document deduplication operators for a training-data pipeline:
  * exact, normalized-exact, n-gram Jaccard, MinHash+LSH, SimHash.
  *
  * Scale design (the actual point — sf0.01 is just the correctness gate):
  *  - exact/normalized dedup is one hash-shuffle on the text (or its hash).
  *    At 100 TB you group by a 64-bit+128-bit hash pair, never the raw text.
  *  - n-gram Jaccard joins docs on *shared shingles*; random text shares
  *    almost no shingles, so the join output stays near-linear. The shuffle
  *    key is the shingle string (hash it at scale).
  *  - MinHash+LSH is the sub-quadratic path: k=16 permutation-min hashes,
  *    banded 4×4; candidate pairs = docs sharing a band key — a groupBy-join
  *    on band keys, never all-pairs. Verification re-checks true Jaccard on
  *    candidates only. This is the standard web-scale near-dup pipeline
  *    (Broder MinHash / LSH banding) expressed as three shuffles.
  *  - SimHash packs token hashes into a 63-bit signature per doc; near-dups
  *    have small Hamming distance. Pairing is blocked by 7 disjoint 9-bit
  *    signature bands (lossless for Hamming ≤ 6 by pigeonhole) — an
  *    equi-join on (band, bits), never all-pairs.
  *  - Embedding near-dup buckets by a 16-bit random-hyperplane signature
  *    (Charikar), banded 4×4, verifying true cosine on candidates only.
  *
  * All hashing is engine-agnostic integer math (TextFunctions.polyHash),
  * so every stage is reproducible bit-for-bit in the DuckDB oracle.
  */
object Dedup {
  type QFn = (SparkSession, String) => DataFrame

  private val MinTokens = 3 // shingle width; shorter docs are skipped

  /** Exact dedup: one representative (min doc_id) per identical text. */
  private def exact(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .groupBy(col("text"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .select(col("keep_id"), col("n_copies"))
      .orderBy(col("keep_id"))

  /** Exact dedup after normalization (lower/strip punct/collapse ws). */
  private def exactNormalized(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .groupBy(normalize(col("text")).as("norm"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .select(col("keep_id"), col("n_copies"))
      .orderBy(col("keep_id"))

  /** Distinct word-trigram shingles per doc, with per-doc set size. Not
    * cached here: both consumers immediately derive the rep-tagged frame
    * `all` from it and materialize THAT (shingle once, join many — the
    * 100 TB discipline); a second cache of the same rows was pure extra
    * storage (r16). */
  private def docShingles(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .select(col("doc_id"), array_distinct(shinglesOf(col("text"), MinTokens)).as("sh"))
      .filter(size(col("sh")) > 0)

  /** Materialize the (small) pair result while the upstream caches are
    * alive, then release them — otherwise every dedup query leaves its
    * shingle/signature cache pinned for the rest of the session, and 100+
    * queries later the accumulated storage pressure slows unrelated
    * operators (measured: a 5× swing on a simple groupBy late in a bench
    * run). */
  private def releasing(caches: org.apache.spark.sql.DataFrame*)(result: DataFrame): DataFrame = {
    val out = result.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count()
    caches.foreach(_.unpersist(blocking = false))
    // registered so Bench can drop it between samples — a plan-identical
    // re-invocation would otherwise hit this cache and time the warm run
    graft.ResultCaches.register(out)
  }

  /** Exact n-gram (trigram) Jaccard near-dup pairs, join on shared shingle.
    * jaccard = |A∩B| / (|A|+|B|-|A∩B|) — exact integer ratio.
    *
    * Docs with identical shingle arrays are collapsed to one representative
    * before the shared-shingle self-join (the same discipline as
    * [[embeddingCosine]]): on a replicated corpus every shingle of a base
    * doc recurs once per copy, so the member-level self-join emits
    * copies² × |shingles| rows per base pair — the sf10 probe (500 k docs,
    * ~100 copies each) spilled 57 GB of sort data and filled the disk on
    * exactly that. Representative pairs expand back through membership;
    * within-group pairs share the full shingle set, so their jaccard is
    * sz/sz = 1.0 by the identical fp expression both engines evaluate. */
  private def ngramJaccard(s: SparkSession, dir: String): DataFrame = {
    // eager localCheckpoint, not persist: `all` feeds members/d/sizes/ex and
    // each re-appears several times in the final plan (both self-join sides,
    // both expansion joins) — truncating to a LogicalRDD leaf keeps the one
    // planning pass linear in the plan, not in subtree copies (guide §3.3)
    val all = docShingles(s, dir)
      .withColumn("rep", min(col("doc_id")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("sh"))))
      .localCheckpoint()
    val members = all.select(col("doc_id"), col("rep"))
    val d = all.filter(col("doc_id") === col("rep"))
      .select(col("doc_id"), col("sh"))
    val sizes = d.select(col("doc_id"), size(col("sh")).as("sz"))
    val ex0 = d.select(col("doc_id"), explode(col("sh")).as("s"))
    // shingles appearing in a single distinct doc can never form a
    // representative pair — dropping them first shrinks the self-join input
    // by the unique-shingle mass (the dominant fraction for natural text),
    // without changing results. The count rides a window over the SAME hash
    // partitioning the self-join needs (one shuffle of the exploded
    // shingles total), instead of a separate groupBy + join-back (which
    // re-shuffled ex0 twice and cost +76% at sf0.1 without changing the
    // asymptotics)
    val ex = ex0
      .withColumn("cnt", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("s"))))
      .filter(col("cnt") > 1).drop("cnt")
    val shared = ex.as("a").join(ex.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("ri"), col("b.doc_id").as("rj"))
      .agg(count(lit(1)).as("shared"))
    val repPairs = shared
      .join(sizes.as("sa"), col("ri") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("rj") === col("sb.doc_id"))
      .withColumn("jaccard",
        col("shared").cast("double") / (col("sa.sz") + col("sb.sz") - col("shared")))
      .filter(col("jaccard") >= 0.5)
      .select(col("ri"), col("rj"), col("jaccard"))
    // Pin the expansion fan-out on BOTH sides. Whichever side the planner
    // broadcasts, the join output inherits the OTHER (stream) side's
    // partitioning — and both unpinned lineages can be tiny-partitioned:
    // the member table's parquet scan may be a single split (the sf10
    // probe's 100× corpus compresses to one 5 MB file — 11+ CPU-minutes in
    // ONE task), and the pair list's distinct() coalesces to a handful of
    // AQE partitions (the sf10 cold re-run found the 2.3 B-row expansion
    // running in FOUR tasks because the 8 MB member side fit the broadcast
    // threshold, flipping the roles the original member-only pin assumed).
    // repartition(P, key) is REPARTITION_BY_NUM — never coalesced — so the
    // expansion spreads across the cluster whichever side broadcasts, and
    // each pin doubles as that side's join-key distribution for a
    // sort-merge fallback.
    val p = s.sessionState.conf.numShufflePartitions
    val mem = members.repartition(p, col("rep"))
    val cross = repPairs.repartition(p, col("ri"))
      .join(mem.select(col("rep").as("ri"), col("doc_id").as("mi")), "ri")
      .join(mem.select(col("rep").as("rj"), col("doc_id").as("mj")), "rj")
      .select(least(col("mi"), col("mj")).as("i"),
              greatest(col("mi"), col("mj")).as("j"), col("jaccard"))
    // identical shingle sets: shared == sz, so jaccard == sz/sz == 1.0 with
    // the exact expression shape the oracle evaluates per pair
    val within = mem.select(col("rep"), col("doc_id").as("mi"))
      .join(mem.select(col("rep"), col("doc_id").as("mj")), "rep")
      .filter(col("mi") < col("mj"))
      .join(sizes.select(col("doc_id").as("rep"), col("sz")), "rep")
      .withColumn("jaccard",
        col("sz").cast("double") / (col("sz") + col("sz") - col("sz")))
      .select(col("mi").as("i"), col("mj").as("j"), col("jaccard"))
    releasing() {
      cross.unionByName(within)
        .select(col("i"), col("j"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy(col("i"), col("j"))
    }
  }

  private val NumHashes = 16
  private val BandSize = 4 // → 4 bands

  /** Rep-level MinHash-LSH core shared by [[minhashLsh]] (which expands
    * pairs back to the member level) and [[closureLabels]] (which clusters
    * — membership expansion distributes over transitive closure, so the
    * closure never needs the expanded pair set at all).
    *
    * Returns (verified rep pairs (ri, rj, jaccard), members (doc_id, rep),
    * sizes (rep, sz), caches for the caller to release). */
  private def minhashVerified(s: SparkSession, dir: String)
      : (DataFrame, DataFrame, DataFrame, Seq[DataFrame]) = {
    // Docs with identical shingle arrays collapse to one representative
    // before the band self-join (the [[ngramJaccard]] discipline): the
    // minhash signature is a function of the shingle array alone, so every
    // copy lands in every band bucket of its original and the doc-level
    // candidate join goes copies²-dense on a replicated corpus — worse, the
    // verify step then shuffles a KB-scale shingle ARRAY per candidate pair
    // (tens of GB at the sf10 probe). Rep-level candidates + verify touch
    // each distinct array once; member expansion restores the exact
    // doc-level pair set (identical arrays ⇒ identical bands ⇒ within-group
    // pairs are always candidates, jaccard sz/(2sz−sz) = 1.0 in the same fp
    // shape the oracle evaluates).
    // eager localCheckpoint, not persist (guide §3.3): `all` re-appears in
    // the final plan through members/d/sizes several times and `bands0`
    // three times (hot-key filter + both self-join sides) — truncation keeps
    // the single planning pass linear in the plan, not in subtree copies
    val all = docShingles(s, dir)
      .withColumn("rep", min(col("doc_id")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("sh"))))
      .localCheckpoint()
    val members = all.select(col("doc_id"), col("rep"))
    val d = all.filter(col("doc_id") === col("rep"))
      .select(col("doc_id"), col("sh"))
      .withColumn("hs", transform(col("sh"), sh => polyHash(sh)))
    // one-pass k=16 signature (native MinhashSig); band key = 4 consecutive
    val sig = d.select(
      col("doc_id"), col("sh"),
      call_function("minhash_sig", col("hs"), lit(NumHashes)).as("sig"))
    val bands0 = sig.select(col("doc_id"),
        explode(array((0 until NumHashes / BandSize).map { b =>
          struct(lit(b).as("band"),
            concat_ws("_", (0 until BandSize).map(r => col("sig")(b * BandSize + r)): _*).as("key"))
        }: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band"), col("bk.key"))
      .localCheckpoint()
    // band keys hit by a single rep produce no cross-cluster candidates —
    // prefilter them (within-cluster pairs never ride the band join at all)
    val hot = bands0.groupBy(col("band"), col("key"))
      .agg(count(lit(1)).as("cnt")).filter(col("cnt") > 1)
      .select(col("band").as("hb"), col("key").as("hk"))
    val bands = bands0.join(hot,
      col("band") === col("hb") && col("key") === col("hk"))
      .select(col("doc_id"), col("band"), col("key"))
    val candidates = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("i"), col("y.doc_id").as("j"))
      .distinct()
    // verify: true Jaccard on candidate representative pairs only
    val verified = candidates
      .join(d.select(col("doc_id").as("i"), col("sh").as("sh_i")), "i")
      .join(d.select(col("doc_id").as("j"), col("sh").as("sh_j")), "j")
      .withColumn("shared", size(array_intersect(col("sh_i"), col("sh_j"))))
      .withColumn("jaccard", col("shared").cast("double") /
        (size(col("sh_i")) + size(col("sh_j")) - col("shared")))
      .filter(col("jaccard") >= 0.5)
      .select(col("i").as("ri"), col("j").as("rj"), col("jaccard"))
    val sizes = d.select(col("doc_id").as("rep"), size(col("sh")).as("sz"))
    (verified, members, sizes, Seq.empty)
  }

  /** MinHash + LSH banding: sub-quadratic candidate generation, then exact
    * Jaccard verification of candidates only. */
  private def minhashLsh(s: SparkSession, dir: String): DataFrame = {
    val (verified, members, sizes, caches) = minhashVerified(s, dir)
    // member expansion, hash-pinned on BOTH sides (see ngramJaccard: the
    // unpinned side becomes the stream side when the other broadcasts, and
    // both lineages can be tiny-partitioned at scale)
    val p = s.sessionState.conf.numShufflePartitions
    val mem = members.repartition(p, col("rep"))
    val cross = verified.repartition(p, col("ri"))
      .join(mem.select(col("rep").as("ri"), col("doc_id").as("mi")), "ri")
      .join(mem.select(col("rep").as("rj"), col("doc_id").as("mj")), "rj")
      .select(least(col("mi"), col("mj")).as("i"),
              greatest(col("mi"), col("mj")).as("j"), col("jaccard"))
    // identical shingle sets: shared == sz, so jaccard == sz/(2sz−sz) == 1.0
    // with the exact expression shape the oracle evaluates per pair
    val within = mem.select(col("rep"), col("doc_id").as("mi"))
      .join(mem.select(col("rep"), col("doc_id").as("mj")), "rep")
      .filter(col("mi") < col("mj"))
      .join(sizes, "rep")
      .withColumn("jaccard",
        col("sz").cast("double") / (col("sz") + col("sz") - col("sz")))
      .select(col("mi").as("i"), col("mj").as("j"), col("jaccard"))
    releasing(caches: _*) {
      cross.unionByName(within)
        .select(col("i"), col("j"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy(col("i"), col("j"))
    }
  }

  /** 7-way split of the 63-bit signature: by pigeonhole, two signatures at
    * Hamming distance ≤ 6 agree exactly on at least one of 7 disjoint 9-bit
    * bands — so banding is a lossless candidate generator for d ≤ 6, and a
    * 9-bit band key (512 buckets) keeps per-bucket populations — and hence
    * the candidate join output — near-linear. (A 32-bit signature's 4-5-bit
    * bands were measured 6× slower at sf0.1: 16-32 buckets per band is
    * still quadratic-ish. Wider signature = finer bands = fewer false
    * candidates; at larger corpora widen again, same shape.) */
  private val SimBandWidths = Seq.fill(7)(9)
  private val SimBandOffsets = SimBandWidths.scanLeft(0)(_ + _).init

  /** SimHash: 63-bit signature from per-token hashes; near-dup pairs =
    * Hamming distance ≤ 6, found via signature-band blocking (never
    * all-pairs).
    *
    * The band join runs over DISTINCT signatures, not documents. A real
    * crawl carries duplicate clusters (many docs, one signature), and
    * identical signatures collide in every band — banding per document
    * made the candidate join quadratic in cluster size (the sf1 scale
    * probe measured 101 s where sf0.1 took 2 s, with 10-deep clusters).
    * Pigeonhole losslessness is a property of the signatures alone:
    * Hamming ≤ 6 ⇒ the two 63-bit signatures agree on ≥1 of the 7
    * disjoint 9-bit bands — so banding distinct signatures finds every
    * qualifying signature PAIR, and the doc-level pairs come back from two
    * cheap hash joins against the sig→docs table plus the within-cluster
    * expansion (equal signatures, Hamming 0). The emitted pair set is
    * EXACTLY the per-document formulation's; only the join cardinality
    * changed — cluster-count-linear instead of cluster-size-quadratic. */
  private def simhash(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(s, dir, "documents")
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= MinTokens)
      .withColumn("th", transform(col("toks"), t => polyHash(t)))
    // bit j of the signature: majority vote of a per-bit rehash — one native
    // pass (SimHash63) instead of 63 interpreted aggregate() sweeps
    // eager localCheckpoint (guide §3.3): sig re-appears in the final plan
    // five times (distinct → bands ×2, both expansion sides, the
    // within-cluster self-join ×2) — truncate once instead of replanning
    val sig = d.select(col("doc_id"), call_function("simhash63", col("th")).as("sig"))
      .localCheckpoint()
    val sigs = sig.select(col("sig")).distinct()
    val bands = sigs.select(col("sig"),
        explode(array(SimBandOffsets.zip(SimBandWidths).zipWithIndex.map {
          case ((off, w), b) =>
            struct(lit(b).as("band"),
              shiftright(col("sig"), off).bitwiseAND(lit((1 << w) - 1)).as("bits"))
        }: _*)).as("bk"))
      .select(col("sig"), col("bk.band"), col("bk.bits"))
    val sigPairs = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bits") === col("y.bits") &&
        col("x.sig") < col("y.sig"))
      .select(col("x.sig").as("sa"), col("y.sig").as("sb"))
      .distinct() // a close signature pair may collide in several bands
      .withColumn("hamming", bit_count(col("sa").bitwiseXOR(col("sb"))))
      .filter(col("hamming") <= 6)
    // Pin the expansion fan-out on BOTH sides (see ngramJaccard). The
    // original member-only pin assumed sigPairs is the broadcast BUILD
    // side; at sf10 the 8 MB sig table fit the broadcast threshold
    // instead, making sigPairs — distinct()-coalesced to FOUR AQE
    // partitions — the stream side, and the 2.3 B-row expansion ran in
    // four tasks (20+ min where an honest 32-way run takes ~2 min).
    val p = s.sessionState.conf.numShufflePartitions
    val sigP = sig.repartition(p, col("sig"))
    // cross-cluster doc pairs: expand both signatures to their members
    val cross = sigPairs.repartition(p, col("sa"))
      .join(sigP.select(col("sig").as("sa"), col("doc_id").as("da")), "sa")
      .join(sigP.select(col("sig").as("sb"), col("doc_id").as("db")), "sb")
      .select(least(col("da"), col("db")).as("i"),
        greatest(col("da"), col("db")).as("j"), col("hamming"))
    // within-cluster pairs: equal signatures are Hamming 0 by definition
    val within = sigP.as("x").join(sigP.as("y"),
        col("x.sig") === col("y.sig") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("i"), col("y.doc_id").as("j"),
        lit(0).as("hamming"))
    releasing() {
      cross.unionAll(within).orderBy(col("i"), col("j"))
    }
  }

  private[pipeline] val NumBands = 4
  private[pipeline] val MaxBandBits = 16 // planes reserved per band
  private[pipeline] val NumPlanes = NumBands * MaxBandBits

  /** Bits per LSH band, derived from the corpus size: the smallest b in
    * [4, [[MaxBandBits]]] with 2^b · 32 ≥ N, so each band's bucket space
    * scales with the corpus and the expected bucket holds ~32 vectors. A
    * FIXED bucket space is the classic LSH scale landmine — 4 bits = 16
    * buckets per band turns the candidate join into N²/16 pairs (the sf10
    * probe measured 8.0e9 candidates at N=200 000 and stalled on the 64
    * skewed join keys); deriving b keeps candidates ~linear at any corpus,
    * the same auto-scaling discipline as [[SemTarget]]'s derived k.
    * Integer-exact (no float log) so Spark and the DuckDB oracle can never
    * disagree at a power-of-two boundary. */
  private[pipeline] def bandBitsFor(n: Long): Int =
    (4 to MaxBandBits).find(b => (1L << b) * 32L >= n).getOrElse(MaxBandBits)

  /** Deterministic ±1 random-hyperplane entries (LCG-mixed parity). The
    * exact same literals are embedded in the DuckDB oracle, so the
    * signature — and therefore the candidate set — is bit-identical on
    * both sides. */
  private def planeEntry(p: Int, k: Int): Double = {
    val y = ((p * 64L + k) * 2654435761L + 1013904223L) % 4294967296L
    if (((y >> 13) & 1L) == 1L) 1.0 else -1.0
  }
  private[pipeline] lazy val planes: IndexedSeq[IndexedSeq[Double]] =
    (0 until NumPlanes).map(p => (0 until 64).map(k => planeEntry(p, k)))

  /** Embedding near-dup: cosine ≥ 0.45 pairs via random-hyperplane LSH
    * (Charikar SimHash for angles): sign of ⟨v, rᵖ⟩ for 4·b fixed ±1
    * hyperplanes → b-bit signature per band over 4 bands, where b is
    * [[bandBitsFor]] the corpus count (bucket space grows with N, expected
    * bucket ~32 vectors); candidates = vectors sharing a band; true cosine
    * verified on candidates only. Same three-shuffle shape as minhashLsh —
    * no all-pairs join anywhere, and no fixed bucket space to saturate.
    * Approximate by construction (a far-apart band-collision-free pair is
    * never considered), which is the 100 TB trade: recall is tuned by adding
    * planes/bands, not by going quadratic — and a larger corpus narrows each
    * band (higher b), concentrating recall on the highest-cosine pairs,
    * exact duplicates always colliding in every band. Exact brute-force
    * search lives in Similarity.annBrute as the small-query-set baseline. */
  private def embeddingCosine(s: SparkSession, dir: String): DataFrame = {
    // Exact-duplicate vectors are collapsed to one representative BEFORE the
    // LSH (the r7 SimHash discipline): on a replicated corpus every copy of
    // a vector collides with every copy of its near-neighbors in every band,
    // so running the candidate/verify joins at the member level moves each
    // 64-dim vector once PER COPY PAIR — the sf10 probe spilled >75 GB of
    // sort data on exactly that. Representatives carry the vectors; members
    // are a two-column (vec_id, rep) frame; verified representative pairs
    // are expanded back through membership at the end. The result set is
    // bit-identical (a signature is a function of the vector alone), so the
    // DuckDB oracle is unchanged.
    // eager localCheckpoint (guide §3.3): tagged re-appears in the final
    // plan through members/d many times; the count below doubles as its
    // materializing read
    val tagged = Tables.load(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("rep", min(col("vec_id")).over(Window.partitionBy(col("v"))))
      .localCheckpoint()
    val bb = bandBitsFor(tagged.count()) // full-corpus N (oracle parity)
    val members = tagged.select(col("vec_id"), col("rep"))
    val d = tagged.filter(col("vec_id") === col("rep"))
      .select(col("vec_id"), col("v"))
      .withColumn("norm", sqrt(call_function("dot_f64", col("v"), col("v"))))
    val bits = for (band <- 0 until NumBands; r <- 0 until bb) yield
      (call_function("dot_f64", col("v"), typedLit(planes(band * MaxBandBits + r))) > 0)
        .cast("long").as(s"b_${band}_$r")
    val sig = d.select(col("vec_id") +: bits: _*)
    // checkpointed: both candidate self-join sides re-plan (and without a
    // cut re-EXECUTE) the 4·bb signature dot products otherwise
    val bands = sig.select(col("vec_id"),
        explode(array((0 until NumBands).map { band =>
          struct(lit(band).as("band"),
            (0 until bb).map(r => col(s"b_${band}_$r") * lit(1L << r))
              .reduce(_ + _).as("bits"))
        }: _*)).as("bk"))
      .select(col("vec_id"), col("bk.band"), col("bk.bits"))
      .localCheckpoint()
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bits") === col("y.bits") &&
        col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("ri"), col("y.vec_id").as("rj"))
      .distinct()
    // cosine verification touches representative vectors only
    val verified = cand
      .join(d.select(col("vec_id").as("ri"), col("v").as("vi"), col("norm").as("ni")), "ri")
      .join(d.select(col("vec_id").as("rj"), col("v").as("vj"), col("norm").as("nj")), "rj")
      .withColumn("cosine",
        call_function("dot_f64", col("vi"), col("vj")) / (col("ni") * col("nj")))
      .filter(col("cosine") >= 0.45)
      .select(col("ri"), col("rj"), col("cosine"))
    // every member pair of a verified representative pair is a result pair.
    // The member table is hash-pinned by its cluster key first — the pair
    // list is the broadcast build side, so without the pin the copies²
    // expansion runs in the member scan's partitioning, which can be a
    // single split (see simhash: one 5 MB file at the sf10 probe).
    val p = s.sessionState.conf.numShufflePartitions
    val mem = members.repartition(p, col("rep"))
    val cross = verified.repartition(p, col("ri"))
      .join(mem.select(col("rep").as("ri"), col("vec_id").as("mi")), "ri")
      .join(mem.select(col("rep").as("rj"), col("vec_id").as("mj")), "rj")
      .select(least(col("mi"), col("mj")).as("i"),
              greatest(col("mi"), col("mj")).as("j"), col("cosine"))
    // identical vectors collide in every band, so all within-group member
    // pairs are candidates; their cosine is evaluated with the exact same
    // fp expression the oracle uses (dot(v,v)/(norm·norm))
    val selfOk = d
      .withColumn("cosine",
        call_function("dot_f64", col("v"), col("v")) / (col("norm") * col("norm")))
      .filter(col("cosine") >= 0.45)
      .select(col("vec_id").as("rep"), col("cosine"))
    val within = mem.select(col("rep"), col("vec_id").as("mi"))
      .join(mem.select(col("rep"), col("vec_id").as("mj")), "rep")
      .filter(col("mi") < col("mj"))
      .join(selfOk, "rep")
      .select(col("mi").as("i"), col("mj").as("j"), col("cosine"))
    releasing() {
      cross.unionByName(within)
        .select(col("i"), col("j"), round(col("cosine"), 6).as("cosine"))
        .orderBy(col("i"), col("j"))
    }
  }

  /** Target average cluster size for [[semantic]]: k is DERIVED as
    * ceil(N / SemTarget), so the within-cluster pairwise work stays
    * O(SemTarget) per vector at ANY corpus size — 10× the data means 10×
    * the clusters, not 10× the cluster size. */
  private val SemTarget = 32L

  /** SemDeDup-shape semantic dedup (Abbas et al. 2023, arXiv:2303.09540):
    * k-means-cluster the embedding space, then search for near-duplicates
    * ONLY within a cluster and keep one representative per duplicate set.
    * This is the standard web-scale trade: the quadratic pairwise step is
    * bounded by cluster size, and cross-cluster pairs are never considered
    * by construction.
    *
    * k auto-scales: k = max(8, ceil(N / [[SemTarget]])) from one corpus
    * count, so cluster size — and the pairwise join's per-cluster cost —
    * is bounded as the corpus grows. Seeds are k vectors picked by a
    * deterministic LCG score (spread through id space, order-free), and
    * centroids are then refined with TWO Lloyd rounds over a 50%
    * deterministic sample (vec_id % 2 = 0) before the full-corpus
    * assignment — the SemDeDup recipe of train-on-sample, assign-all.
    *
    * Assignment is TWO-LEVEL (the IVF tree [[Similarity]] probes): a flat
    * argmin over k centroids costs N·k = O(N²/SemTarget) dots — quadratic
    * once k is derived — so the first ceil(√k) seeds form a frozen COARSE
    * layer, every fine centroid maps to one coarse cell (coarse seeds
    * self-map, so no cell is ever empty), and a vector takes the argmin
    * only over its coarse cell's fine centroids: N·2√k dots total.
    * Empty fine clusters keep their previous centroid (LEFT JOIN +
    * coalesce), so the centroid set stays exactly k and no vector can
    * lose its cell. The Lloyd update sums MICRO-QUANTIZED coordinates
    * (round(x·1e6) as long), making the mean an exact integer sum over
    * the count — order-proof, hence bit-identical between Spark and the
    * DuckDB oracle regardless of partitioning. All argmins tie to the
    * lower cid; the candidate join is keyed on the cluster id (one
    * shuffle, no all-pairs), and the greedy keep rule is "lowest vec_id
    * survives" — a vector is dropped iff a lower-id same-cluster vector
    * sits at cosine ≥ 0.45. */
  private def semantic(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.storage.StorageLevel
    // Distinct-vector collapse (the [[embeddingCosine]] discipline): every
    // copy of a vector shares its coarse cell, fine cluster, and all cosine
    // relations, so the assignment dots and the within-cluster pairwise
    // search run on DISTINCT vectors only — on the sf10 tiled corpus
    // (200 k vectors, 100 copies each) the member-level pairwise join was
    // ~10 M vector-carrying rows and measured 333 s; collapsed it is ~2 000.
    // Members re-enter only as pure id/weight arithmetic: (a) seed ids are
    // drawn from the full sampled id set, (b) Lloyd sums weight each
    // distinct vector by its sample multiplicity (sum of identical
    // quantized longs == long × count, so the integer sums — and the
    // centroids — are bit-identical to the oracle's member-level sums),
    // (c) the greedy keep rule becomes a per-group id threshold: rep(G) is
    // the group's min member id, a member y of G is dropped iff
    // y > rep(G) with G self-close, or some close same-cluster group H has
    // rep(H) < y (any member of H below y implies rep(H) < y).
    val tagged = Tables.load(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("rep", min(col("vec_id")).over(Window.partitionBy(col("v"))))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = tagged.count()
    val k = math.max(8L, (n + SemTarget - 1) / SemTarget)
    val k1 = math.max(1L, math.ceil(math.sqrt(k.toDouble)).toLong)
    val members = tagged.select(col("vec_id"), col("rep"))
    val dvec = tagged.filter(col("vec_id") === col("rep"))
      .select(col("rep"), col("v"))
      .withColumn("norm", sqrt(call_function("dot_f64", col("v"), col("v"))))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val dv = dvec.select(col("rep").as("vec_id"), col("v"))
    // per-distinct-vector multiplicity within the 50% Lloyd sample
    val sampleD = dv.join(
      members.filter(col("vec_id") % 2 === 0)
        .groupBy(col("rep")).agg(count(lit(1)).as("w"))
        .withColumnRenamed("rep", "vec_id"), "vec_id")
    // d2 via dot-products only, so both engines evaluate the identical
    // expression tree (no norm² vs dot asymmetry)
    def d2(v: org.apache.spark.sql.Column,
           c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      call_function("dot_f64", v, v) + call_function("dot_f64", c, c) -
        lit(2.0) * call_function("dot_f64", v, c)
    // k seeds by deterministic LCG score over the full sampled id set
    // (ids only — the vector is fetched through the group representative);
    // TakeOrdered top-k, then the rank window runs over k rows only
    // Intermediates below are cut with eager localCheckpoint, not persist:
    // the Lloyd chain REUSES each stage several times (c1 twice in c2, dAsg
    // three times in the pair search), so the composed logical tree grows
    // exponentially — persist caches the DATA but every action still
    // re-analyzes and canonicalizes the full tree, which measured 3-5 s of
    // pure driver planning PER ACTION at sf0.1 (guide §3.3: huge plans make
    // planning itself the bottleneck; truncate lineage). localCheckpoint
    // collapses each stage to a LogicalRDD leaf; the checkpointed rows are
    // per-stage O(k) or O(distinct vectors) — tiny at any scale relative to
    // the corpus — and are GC-reclaimed when the query's references die.
    val seeds = members.filter(col("vec_id") % 2 === 0)
      .withColumn("score", (col("vec_id") * lit(1103515245L) + lit(12345L)) %
        lit(2147483648L))
      .orderBy(col("score").asc, col("vec_id").asc).limit(k.toInt)
      .withColumn("rn", row_number().over(
        Window.orderBy(col("score"), col("vec_id"))))
      .join(dvec.select(col("rep"), col("v").as("cv")), "rep")
      .select(col("rn"), col("vec_id").as("cid"), col("cv"))
      .localCheckpoint()
    val coarse = seeds.filter(col("rn") <= k1)
      .select(col("cid").as("ccid"), col("cv").as("ccv"))
    // frozen fine→coarse cell map from ORIGINAL seed positions; coarse
    // seeds force-map to themselves so every coarse cell holds ≥1 fine
    // centroid at all times
    val cellmap = seeds.crossJoin(broadcast(coarse))
      .groupBy(col("cid"), col("rn"))
      .agg(min(struct(d2(col("cv"), col("ccv")), col("ccid"))).as("m"))
      .select(col("cid"),
        when(col("rn") <= k1, col("cid")).otherwise(col("m.ccid")).as("cell"))
      .localCheckpoint()
    def assignCoarse(vecs: DataFrame): DataFrame =
      vecs.crossJoin(broadcast(coarse))
        .groupBy(col("vec_id"))
        .agg(min(struct(d2(col("v"), col("ccv")), col("ccid"))).as("m"))
        .select(col("vec_id"), col("m.ccid").as("cell"))
    // fine argmin probes only the vector's coarse cell
    def assign(vecs: DataFrame, cent: DataFrame, ac: DataFrame): DataFrame = {
      val celled = cent.join(cellmap, "cid")
        .select(col("cell"), col("cid"), col("cv"))
      vecs.join(ac, "vec_id")
        .join(broadcast(celled), "cell")
        .groupBy(col("vec_id"))
        .agg(min(struct(d2(col("v"), col("cv")), col("cid"))).as("m"))
        .select(col("vec_id"), col("m.cid").as("cid"))
    }
    // Lloyd update: exact integer sums of micro-quantized coords → mean,
    // each distinct vector weighted by its sample multiplicity (identical
    // copies contribute identical quantized longs, so q·w == the oracle's
    // member-level sum exactly); an empty cluster keeps its previous
    // centroid
    def update(vecs: DataFrame, asg: DataFrame, prev: DataFrame): DataFrame = {
      val means = vecs.join(asg, "vec_id")
        .select(col("cid"), col("w"), posexplode(col("v")).as(Seq("d", "x")))
        .groupBy(col("cid"), col("d"))
        .agg(sum(round(col("x") * lit(1e6), 0).cast("long") * col("w")).as("sx"),
          sum(col("w")).as("cnt"))
        .groupBy(col("cid"))
        .agg(array_sort(collect_list(struct(col("d"),
          (col("sx").cast("double") / lit(1e6) / col("cnt")).as("m")))).as("dm"))
        .select(col("cid"), transform(col("dm"), t => t.getField("m")).as("mv"))
      prev.select(col("cid"), col("cv").as("pv"))
        .join(means, Seq("cid"), "left")
        .select(col("cid"), coalesce(col("mv"), col("pv")).as("cv"))
    }
    val seeds0 = seeds.select(col("cid"), col("cv"))
    val acS = assignCoarse(sampleD).localCheckpoint()
    val c1 = update(sampleD, assign(sampleD, seeds0, acS), seeds0)
      .localCheckpoint()
    // c2 is consumed once, but uncut it would carry c1's tree twice into
    // every downstream plan; dAsg is consumed THREE times (both pair-search
    // sides + the self-close bound) — uncut, the assignment pass also
    // EXECUTED three times
    val c2 = update(sampleD, assign(sampleD, c1, acS), c1).localCheckpoint()
    // full-corpus assignment on distinct vectors; (rep, v, norm, cid)
    val dAsg = dvec.join(
      assign(dv, c2, assignCoarse(dv)).withColumnRenamed("vec_id", "rep"), "rep")
      .localCheckpoint()
    // close DISTINCT-vector pairs within a fine cluster (both directions:
    // each group must see every close neighbor's rep)
    val crossBound = dAsg.as("x").join(dAsg.as("y"),
        col("x.cid") === col("y.cid") && col("x.rep") =!= col("y.rep"))
      .filter(call_function("dot_f64", col("x.v"), col("y.v")) /
        (col("x.norm") * col("y.norm")) >= 0.45)
      .groupBy(col("y.rep").as("rep"))
      .agg(min(col("x.rep")).as("cb"))
    // a group whose vector is self-close (cosine(v,v) >= 0.45 — false only
    // for zero vectors, where the ratio is NaN) drops every member above
    // its rep; the fp expression matches the oracle's pair evaluation
    val selfBound = dAsg
      .withColumn("sc", call_function("dot_f64", col("v"), col("v")) /
        (col("norm") * col("norm")))
      .select(col("rep"), col("cid"),
        when(col("sc") >= 0.45, col("rep")).otherwise(lit(Long.MaxValue)).as("sb"))
    val thr = selfBound.join(crossBound, Seq("rep"), "left")
      .select(col("rep"), col("cid"),
        least(col("sb"), coalesce(col("cb"), lit(Long.MaxValue))).as("thr"))
    releasing(tagged, dvec) {
      members.join(thr, "rep")
        .filter(col("vec_id") <= col("thr"))
        .select(col("vec_id"), col("cid"))
        .orderBy(col("vec_id"))
    }
  }

  /** Duplicate-cluster resolution: near-dup similarity is not transitive,
    * so the standard pipeline (Broder-style web dedup; the reference's
    * batch dedup keeps first-per-key the same way,
    * flink-table-planner-blink/.../stream/StreamExecDeduplicate.java is the
    * keyed analogue) unions verified pairs into connected clusters and
    * keeps one representative per cluster. Edges = the MinHash-LSH verified
    * pairs (already sub-quadratic); closure = min-label propagation with
    * the same bounded-superstep discipline as graph/Graphs — the pair list
    * is orders of magnitude smaller than the corpus at any scale, and each
    * superstep is one broadcast join + one partial-aggregated shuffle. */
  private def clusters(s: SparkSession, dir: String): DataFrame = {
    val labels = closureLabels(s, dir)
    val sizes = labels.groupBy(col("label").as("keep_id"))
      .agg(count(lit(1)).as("cluster_size"))
    labels.select(col("node").as("doc_id"), col("label").as("keep_id"))
      .join(broadcast(sizes), "keep_id")
      .select(col("doc_id"), col("keep_id"), col("cluster_size"))
      .orderBy(col("doc_id"))
  }

  /** Min-label transitive closure over the MinHash-LSH verified pair graph:
    * (node, label) with label = the cluster's minimum doc_id. Shared by
    * [[clusters]] (adds sizes) and [[splitAssign]] (leakage-safe split
    * keys). */
  private def closureLabels(s: SparkSession, dir: String): DataFrame = {
    // Closure runs on the REPRESENTATIVE pair graph, not the member-expanded
    // one: membership expansion distributes over transitive closure. Every
    // group (docs sharing one shingle array) is internally complete with
    // jaccard 1.0, so a member-level component is exactly a union of whole
    // groups; its min doc_id is the min rep over the connected groups
    // (rep(G) = min member of G by construction). Doc-level labels are
    // therefore the rep-graph closure joined back through membership — the
    // expansion join, the expanded pair materialization, and a closure loop
    // quadratic in duplication depth are all skipped (r16; same result,
    // proven by the unchanged dedup_clusters/split_leakage/audit oracles).
    val (verified, members, _, caches) = minhashVerified(s, dir)
    // eager checkpoint: the loop below takes many actions over this frame —
    // truncate the LSH lineage once (guide §3.3) and size the loop's
    // partitioning to the (tiny) edge count, not the session default
    val repPairs = verified.select(col("ri").as("i"), col("rj").as("j"))
      .localCheckpoint()
    val p = math.max(1, math.min(32, (repPairs.count() * 2 / 100000L).toInt))
    // hash(node) layout fixed once: the superstep join broadcasts labels,
    // so the neighbor-min pre-aggregate below runs with NO exchange (same
    // discipline as graph/Graphs after round 4); localCheckpoint keeps the
    // repartition's output partitioning in the LogicalRDD leaf
    val und = repPairs.union(repPairs.select(col("j"), col("i")))
      .toDF("node", "nbr")
      .repartition(p, col("node"))
      .localCheckpoint()
    var labels = und.select(col("node")).distinct()
      .withColumn("label", col("node"))
      .localCheckpoint(eager = true)
    // label sum is monotone non-increasing; fixpoint = converged
    var last = Long.MinValue
    var converged = false
    val aqeKey = "spark.sql.adaptive.enabled"
    val aqePrev = s.conf.get(aqeKey, "true")
    s.conf.set(aqeKey, "false") // no per-superstep re-planning in the loop
    try while (!converged) {
      val msgs = und.as("u").join(broadcast(labels.as("l")), col("u.nbr") === col("l.node"))
        .select(col("u.node").as("node"), col("l.label").as("label"))
        .groupBy(col("node")).agg(min(col("label")).as("label")) // exchange-free
      // lineage cut is LAZY; the convergence aggregate doubles as the
      // materializing action — one Spark job per superstep (same
      // discipline as graph/Graphs.connectedComponents)
      val next = labels.union(msgs)
        .repartition(p, col("node"))
        .groupBy(col("node")).agg(min(col("label")).as("label"))
        .localCheckpoint(eager = false)
      val sum2 = Option(next.agg(sum(col("label"))).head.get(0))
        .map(_.asInstanceOf[Long]).getOrElse(0L)
      converged = sum2 == last
      last = sum2
      labels = next
    } finally s.conf.set(aqeKey, aqePrev)
    // membership expansion: a group joins its rep's component when the rep
    // has a cross edge; a multi-member group with NO cross edge is still a
    // component of its own (its within pairs are jaccard 1.0), labeled by
    // its rep; a singleton group with no cross edge emits no pair and so
    // carries no label — exactly the member-level node set
    val gsz = members.groupBy(col("rep")).agg(count(lit(1)).as("gn"))
    releasing(caches: _*) {
      members.join(gsz, "rep")
        .join(labels.withColumnRenamed("node", "rep"), Seq("rep"), "left")
        .filter(col("label").isNotNull || col("gn") > 1)
        .select(col("doc_id").as("node"),
          coalesce(col("label"), col("rep")).as("label"))
    }
  }

  /** Leakage-safe train/val/test split assignment: hashing raw doc_ids
    * into splits leaks near-duplicates across the train/test boundary (the
    * classic contamination failure in LM training sets), so the split key
    * is the near-dup CLUSTER representative — every member of a verified
    * cluster lands in the same split by construction. Non-clustered docs
    * key on their own doc_id.
    *
    * Scale shape: the label map is only the clustered docs (orders of
    * magnitude smaller than the corpus — it is the verified near-dup set),
    * so it broadcasts; the corpus side is one scan + projection, no
    * shuffle. The split itself is the deterministic-hash-bucket discipline
    * of [[CorpusOps]] sampling (polyHash % 100 on the split key's decimal
    * string): reproducible under retries, re-partitioning and incremental
    * re-runs, and bit-identical in the DuckDB oracle. 80/10/10. */
  private def splitAssign(s: SparkSession, dir: String): DataFrame = {
    val labels = closureLabels(s, dir).toDF("doc_id", "keep_id")
    Tables.load(s, dir, "documents").select(col("doc_id"))
      .join(broadcast(labels), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("keep_id"), col("doc_id")).as("split_key"))
      .withColumn("bucket", polyHash(col("split_key").cast("string")) % 100)
      .withColumn("split",
        when(col("bucket") < 80, "train")
          .when(col("bucket") < 90, "val")
          .otherwise("test"))
      .orderBy(col("doc_id"))
  }

  /** Incremental dedup of an incoming batch against a historical corpus,
    * Bloom-prefiltered: the standard shape for continuous crawl ingestion,
    * where re-shuffling the full history against every new batch is the
    * scale killer.
    *
    *  1. Build a Bloom filter over the history's normalized-text keys
    *     (`df.stat.bloomFilter` — a distributed treeAggregate; ~9.6
    *     bits/item at 1% fpp).
    *  2. Broadcast it; incoming rows whose key the filter rejects are
    *     DEFINITELY new (Bloom has no false negatives) and skip the join
    *     entirely — for a mostly-novel crawl batch that is almost all rows.
    *  3. Only Bloom-positive rows (true dups + ~1% false positives) take
    *     the exact anti-join, so the join input is a tiny candidate set and
    *     the result is EXACT, not approximate.
    *
    * The `mightContain` probe is a broadcast-closure UDF deliberately:
    * Spark's BloomFilterMightContain expression is internal-only (runtime
    * filtering), and the probe is a bit-test — not the hot path the native
    * expressions optimize. At extreme history sizes (10B+ keys) a single
    * broadcast Bloom outgrows executors; shard the filter by key-hash range
    * and probe the matching shard — the per-row math is unchanged.
    *
    * Reference shape: Flink's dedup + the streaming "state as seen-set"
    * pattern (flink-table-planner-blink StreamExecDeduplicate.java:61);
    * the Bloom stage replaces unbounded keyed state with a compact
    * rebuildable sketch for the batch-incremental setting. */
  def incrementalNew(hist: DataFrame, incoming: DataFrame, fpp: Double = 0.01): DataFrame = {
    val s = hist.sparkSession
    val histN = math.max(hist.count(), 1L)
    val bloom = hist.stat.bloomFilter("norm", histN, fpp)
    val b = s.sparkContext.broadcast(bloom)
    val mightContain = udf((v: String) => v != null && b.value.mightContainString(v))
    val definitelyNew = incoming.filter(!mightContain(col("norm")))
    val verifiedNew = incoming.filter(mightContain(col("norm")))
      .join(hist, Seq("norm"), "left_anti")
    definitelyNew.select(col("doc_id")).union(verifiedNew.select(col("doc_id")))
      .orderBy(col("doc_id"))
  }

  /** Oracle split: docs with doc_id%3!=0 are the "historical corpus",
    * doc_id%3==0 the "incoming batch"; emit the genuinely-new doc_ids. */
  private def bloomIncremental(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
    val hist = docs.filter(col("doc_id") % 3 =!= 0)
      .select(normalize(col("text")).as("norm"))
    val incoming = docs.filter(col("doc_id") % 3 === 0)
      .select(col("doc_id"), normalize(col("text")).as("norm"))
    incrementalNew(hist, incoming)
  }

  // ------------------------------------------------ duplicated substrings

  private val SubGram = 8
  private[pipeline] val SharedPassage =
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu " +
      "nu xi omicron pi rho sigma tau upsilon phi chi psi omega"

  /** Exact duplicated-substring span detection — the Lee et al.
    * ("Deduplicating Training Data Makes Language Models Better") pass,
    * re-expressed distributed: instead of one monolithic suffix array,
    * index every overlapping 8-token gram with its start position, keep
    * grams occurring in ≥ 2 distinct documents, and merge each document's
    * duplicated positions into maximal spans with one lag/running-sum
    * window. The synthetic corpus has no natural cross-doc 8-gram repeats,
    * so every doc_id % 7 == 0 document gets a deterministic 24-token
    * passage appended (the oracle reproduces it verbatim — same injection
    * trick as text_pii_redact); that is exactly the template-contamination
    * shape the real pass exists to catch.
    *
    * Scale: one gram-keyed shuffle with map-side partial aggregation for
    * the frequency pass (hash the gram at 100 TB, never shuffle raw
    * strings); the position join-back reuses the same gram key; the span
    * merge windows over each doc's own duplicated grams only — state is
    * bounded by document length. */
  private def duplicatedSpans(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val grams = Tables.load(s, dir, "documents")
      .withColumn("t2",
        when(col("doc_id") % 7 === 0, concat(col("text"), lit(" " + SharedPassage)))
          .otherwise(col("text")))
      .select(col("doc_id"),
        posexplode(shinglesOf(col("t2"), SubGram)).as(Seq("pos", "g")))
    val dup = grams.groupBy(col("g"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2)
      .select(col("g"))
    grams.join(dup, "g")
      .select(col("doc_id"), col("pos").cast("long").as("pos"))
      .withColumn("brk",
        when(col("pos") - lag(col("pos"), 1).over(w) <= SubGram, 0L).otherwise(1L))
      .withColumn("span_id", sum(col("brk")).over(w))
      .groupBy(col("doc_id"), col("span_id"))
      .agg(min(col("pos")).as("start_pos"),
           (max(col("pos")) + SubGram - 1).as("end_pos"))
      .select(col("doc_id"), col("span_id"), col("start_pos"), col("end_pos"),
        (col("end_pos") - col("start_pos") + 1).as("span_tokens"))
      .orderBy(col("doc_id"), col("span_id"))
  }

  /** Dedup audit report: per-source near-duplication rates off the
    * verified cluster closure — the health dashboard a corpus team reads
    * BEFORE deciding dedup thresholds (which sources are internally
    * duplicated, how big the worst cluster is). Same broadcast-label shape
    * as [[splitAssign]]: the corpus side is one scan + one partial-
    * aggregated shuffle on the source key. */
  private def audit(s: SparkSession, dir: String): DataFrame = {
    val labels = closureLabels(s, dir).toDF("doc_id", "keep_id")
    Tables.load(s, dir, "documents").select(col("doc_id"), col("source"))
      .join(broadcast(labels), Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        count(col("keep_id")).as("n_clustered"),
        round(count(col("keep_id")).cast("double") / count(lit(1)), 6)
          .as("dup_rate"))
      .orderBy(col("source"))
  }

  def queries: Map[String, QFn] = Map(
    "dedup_bloom_incremental" -> (bloomIncremental _),
    "dedup_audit" -> (audit _),
    "dedup_exact" -> (exact _),
    "dedup_exact_norm" -> (exactNormalized _),
    "dedup_ngram_jaccard" -> (ngramJaccard _),
    "dedup_minhash_lsh" -> (minhashLsh _),
    "dedup_simhash" -> (simhash _),
    "dedup_embedding" -> (embeddingCosine _),
    "dedup_semantic" -> (semantic _),
    "dedup_clusters" -> (clusters _),
    "dedup_substring" -> (duplicatedSpans _),
    "dedup_split_leakage" -> (splitAssign _)
  )

  // ---- DuckDB oracles: same math, same hashes -------------------------

  private val tokensSql = "string_split(trim(text), ' ')"
  // distinct word-trigram shingles
  private def shinglesSql(t: String) =
    s"list_distinct(list_transform(range(1, greatest(len($t) - 1, 1)), i -> array_to_string($t[i:i+2], ' ')))"
  private def polyHashSqlOf(v: String): String =
    s"list_reduce(list_prepend(0, list_transform(string_split($v, ''), c -> CAST(ascii(c) AS BIGINT))), (a, x) -> (a * 31 + x) % 1000000007)"

  private val docShinglesSql =
    s"""SELECT doc_id, ${shinglesSql(tokensSql)} AS sh
        FROM documents WHERE len($tokensSql) >= 3"""

  /** Shared MinHash-LSH oracle chain: shingle → hash → k=16 signature →
    * 4×4 bands → candidate pairs → exact-Jaccard verification columns.
    * Consumed by dedup_minhash_lsh (threshold filter) and dedup_clusters
    * (transitive closure over the thresholded pairs). */
  private lazy val minhashCtes =
    s"""d AS ($docShinglesSql),
          hs AS (SELECT doc_id, sh,
                   list_transform(sh, s -> ${polyHashSqlOf("s")}) AS h
                 FROM d),
          sig AS (SELECT doc_id, sh,
                   list_transform(range(0, 16),
                     k -> list_min(list_transform(h, x -> (x * (2*k + 1) + (7919*k + 1)) % 1000000007))) AS sg
                  FROM hs),
          bands AS (SELECT doc_id, b.b AS band,
                      array_to_string(sg[b.b*4 + 1 : b.b*4 + 4], '_') AS key
                    FROM sig, range(0, 4) b(b)),
          cand AS (SELECT DISTINCT x.doc_id AS i, y.doc_id AS j
                   FROM bands x JOIN bands y
                     ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id),
          ver AS (SELECT i, j,
                    len(list_intersect(di.sh, dj.sh)) AS shared,
                    len(di.sh) AS szi, len(dj.sh) AS szj
                  FROM cand JOIN d di ON i = di.doc_id JOIN d dj ON j = dj.doc_id)"""

  def oracles: Map[String, String] = Map(
    "dedup_bloom_incremental" ->
      """WITH hist AS (SELECT trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS norm
                       FROM documents WHERE doc_id % 3 <> 0),
              inc AS (SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS norm
                      FROM documents WHERE doc_id % 3 = 0)
         SELECT doc_id FROM inc
         WHERE NOT EXISTS (SELECT 1 FROM hist WHERE hist.norm = inc.norm)
         ORDER BY doc_id""",
    "dedup_exact" ->
      """SELECT min(doc_id) AS keep_id, count(*) AS n_copies
         FROM documents GROUP BY text ORDER BY keep_id""",
    "dedup_exact_norm" ->
      """SELECT min(doc_id) AS keep_id, count(*) AS n_copies
         FROM documents
         GROUP BY trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))
         ORDER BY keep_id""",
    "dedup_ngram_jaccard" ->
      s"""WITH d AS ($docShinglesSql),
          ex AS (SELECT doc_id, unnest(sh) AS s FROM d),
          sizes AS (SELECT doc_id, len(sh) AS sz FROM d),
          shared AS (
            SELECT a.doc_id AS i, b.doc_id AS j, count(*) AS shared
            FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY 1, 2)
          SELECT i, j,
                 round(CAST(shared AS DOUBLE) / (sa.sz + sb.sz - shared), 6) AS jaccard
          FROM shared
          JOIN sizes sa ON i = sa.doc_id
          JOIN sizes sb ON j = sb.doc_id
          WHERE CAST(shared AS DOUBLE) / (sa.sz + sb.sz - shared) >= 0.5
          ORDER BY i, j""",
    "dedup_minhash_lsh" ->
      s"""WITH $minhashCtes
          SELECT i, j, round(CAST(shared AS DOUBLE) / (szi + szj - shared), 6) AS jaccard
          FROM ver
          WHERE CAST(shared AS DOUBLE) / (szi + szj - shared) >= 0.5
          ORDER BY i, j""",
    "dedup_clusters" ->
      s"""WITH RECURSIVE $minhashCtes,
          pairs AS (SELECT i, j FROM ver
                    WHERE CAST(shared AS DOUBLE) / (szi + szj - shared) >= 0.5),
          und AS (SELECT i AS node, j AS nbr FROM pairs
                  UNION SELECT j, i FROM pairs),
          reach AS (
            SELECT node, node AS r FROM und
            UNION
            SELECT u.node, reach.r FROM und u JOIN reach ON u.nbr = reach.node),
          comp AS (SELECT node, min(r) AS keep_id FROM reach GROUP BY node),
          sz AS (SELECT keep_id, count(*) AS cluster_size FROM comp GROUP BY keep_id)
          SELECT c.node AS doc_id, c.keep_id, s.cluster_size
          FROM comp c JOIN sz s USING (keep_id)
          ORDER BY doc_id""",
    "dedup_audit" ->
      s"""WITH RECURSIVE $minhashCtes,
          pairs AS (SELECT i, j FROM ver
                    WHERE CAST(shared AS DOUBLE) / (szi + szj - shared) >= 0.5),
          und AS (SELECT i AS node, j AS nbr FROM pairs
                  UNION SELECT j, i FROM pairs),
          reach AS (
            SELECT node, node AS r FROM und
            UNION
            SELECT u.node, reach.r FROM und u JOIN reach ON u.nbr = reach.node),
          comp AS (SELECT node, min(r) AS keep_id FROM reach GROUP BY node)
          SELECT dd.source,
                 count(*) AS n_docs,
                 count(c.keep_id) AS n_clustered,
                 round(CAST(count(c.keep_id) AS DOUBLE) / count(*), 6) AS dup_rate
          FROM documents dd LEFT JOIN comp c ON dd.doc_id = c.node
          GROUP BY dd.source ORDER BY dd.source""",
    "dedup_split_leakage" ->
      s"""WITH RECURSIVE $minhashCtes,
          pairs AS (SELECT i, j FROM ver
                    WHERE CAST(shared AS DOUBLE) / (szi + szj - shared) >= 0.5),
          und AS (SELECT i AS node, j AS nbr FROM pairs
                  UNION SELECT j, i FROM pairs),
          reach AS (
            SELECT node, node AS r FROM und
            UNION
            SELECT u.node, reach.r FROM und u JOIN reach ON u.nbr = reach.node),
          comp AS (SELECT node, min(r) AS keep_id FROM reach GROUP BY node),
          keyed AS (SELECT dd.doc_id,
                      coalesce(c.keep_id, dd.doc_id) AS split_key
                    FROM documents dd LEFT JOIN comp c ON dd.doc_id = c.node),
          b AS (SELECT doc_id, split_key,
                  ${polyHashSqlOf("CAST(split_key AS VARCHAR)")} % 100 AS bucket
                FROM keyed)
          SELECT doc_id, split_key, bucket,
                 CASE WHEN bucket < 80 THEN 'train'
                      WHEN bucket < 90 THEN 'val'
                      ELSE 'test' END AS split
          FROM b ORDER BY doc_id""",
    // banding is lossless for Hamming ≤ 6 (pigeonhole over 7 bands), so the
    // oracle is the straightforward all-pairs check — same result set. The
    // per-bit rehash mirrors SimHash63 exactly (no 64-bit overflow anywhere)
    "dedup_simhash" ->
      s"""WITH d AS (
            SELECT doc_id,
              list_transform($tokensSql, t -> ${polyHashSqlOf("t")}) AS th
            FROM documents WHERE len($tokensSql) >= 3),
          sig AS (
            SELECT doc_id,
              list_sum(list_transform(range(0, 63), j ->
                CASE WHEN list_sum(list_transform(th,
                       h -> CASE WHEN (h * (2*j + 3) + (7919*j + 1)) % 1000000007 & 1 = 1
                            THEN 1 ELSE -1 END)) > 0
                     THEN (1::BIGINT << j) ELSE 0 END)) AS sig
            FROM d)
          SELECT a.doc_id AS i, b.doc_id AS j,
                 CAST(bit_count(xor(a.sig, b.sig)) AS INT) AS hamming
          FROM sig a JOIN sig b ON a.doc_id < b.doc_id
          WHERE bit_count(xor(a.sig, b.sig)) <= 6
          ORDER BY i, j""",
    // replicates the hyperplane-LSH pipeline (same ±1 plane literals, same
    // sequential-fold dot, same integer-derived bits-per-band) so the
    // approximate candidate set is identical
    "dedup_embedding" -> {
      val planesLit = planes
        .map(_.map(x => if (x > 0) "1.0" else "-1.0").mkString("[", ",", "]"))
        .mkString("[", ",", "]")
      val dot = (a: String, b: String) =>
        s"list_reduce(list_prepend(0.0, list_transform(range(1, 65), k -> $a[k] * $b[k])), (acc,x) -> acc + x)"
      s"""WITH e AS (
           SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         p AS (SELECT COALESCE((SELECT min(c.b) FROM range(4, 17) c(b)
                                  WHERE (CAST(1 AS BIGINT) << CAST(c.b AS INT)) * 32 >= cnt), 16) AS bb
               FROM (SELECT count(*) AS cnt FROM e)),
         n AS (SELECT vec_id, v,
                 sqrt(list_reduce(list_prepend(0.0, list_transform(v, x -> x*x)), (a,x) -> a + x)) AS nrm
               FROM e),
         sig AS (SELECT vec_id, v, nrm,
                   list_transform($planesLit, pl ->
                     CASE WHEN ${dot("v", "pl")} > 0 THEN 1 ELSE 0 END) AS bs
                 FROM n),
         bands AS (SELECT vec_id, b.b AS band,
                     CAST(list_sum(list_transform(range(0, p.bb), r ->
                       CAST(bs[b.b*16 + r + 1] AS BIGINT) * (CAST(1 AS BIGINT) << CAST(r AS INT)))) AS BIGINT) AS bits
                   FROM sig, range(0, 4) b(b), p),
         cand AS (SELECT DISTINCT x.vec_id AS i, y.vec_id AS j
                  FROM bands x JOIN bands y
                    ON x.band = y.band AND x.bits = y.bits AND x.vec_id < y.vec_id)
         SELECT i, j, round(${dot("a.v", "b.v")} / (a.nrm * b.nrm), 6) AS cosine
         FROM cand JOIN n a ON i = a.vec_id JOIN n b ON j = b.vec_id
         WHERE ${dot("a.v", "b.v")} / (a.nrm * b.nrm) >= 0.45
         ORDER BY i, j"""
    },
    // replicates the SemDeDup pipeline: same derived k, same LCG seed
    // pick, same frozen coarse/fine two-level assignment, same two
    // integer-quantized Lloyd rounds on the 50% sample, same
    // sequential-fold dots, same lowest-id-survives greedy rule
    "dedup_semantic" -> {
      val dot = (a: String, b: String) =>
        s"list_reduce(list_prepend(0.0, list_transform(range(1, 65), k -> $a[k] * $b[k])), (acc,x) -> acc + x)"
      def d2 (a: String, b: String) =
        s"${dot(a, a)} + ${dot(b, b)} - 2.0 * ${dot(a, b)}"
      // coarse-cell argmin over the √k coarse seeds
      def acSql(vecs: String) =
        s"""SELECT vec_id, cell FROM (
              SELECT e2.vec_id, c.ccid AS cell,
                     row_number() OVER (PARTITION BY e2.vec_id ORDER BY
                       ${d2("e2.v", "c.ccv")}, c.ccid) AS rn2
              FROM $vecs e2 CROSS JOIN coarse c) WHERE rn2 = 1"""
      // fine argmin probes only the vector's coarse cell
      def assignSql(vecs: String, cent: String, ac: String) =
        s"""SELECT vec_id, cid FROM (
              SELECT e2.vec_id, f.cid,
                     row_number() OVER (PARTITION BY e2.vec_id ORDER BY
                       ${d2("e2.v", "f.cv")}, f.cid) AS rn2
              FROM $vecs e2 JOIN $ac a2 USING (vec_id)
              JOIN (SELECT m2.cell, c.cid, c.cv FROM $cent c
                    JOIN cellmap m2 USING (cid)) f ON f.cell = a2.cell)
            WHERE rn2 = 1"""
      // Lloyd update: exact integer-quantized means; empty cluster keeps
      // its previous centroid
      def updateSql(vecs: String, asg: String, prev: String) =
        s"""SELECT p.cid, coalesce(m3.mv, p.cv) AS cv FROM $prev p
            LEFT JOIN (
              SELECT cid, list(CAST(sx AS DOUBLE) / 1e6 / cnt ORDER BY d) AS mv
              FROM (SELECT a2.cid, gs.d AS d,
                           sum(CAST(round(e2.v[gs.d] * 1e6) AS BIGINT)) AS sx,
                           count(*) AS cnt
                    FROM $vecs e2 JOIN $asg a2 USING (vec_id), range(1, 65) gs(d)
                    GROUP BY a2.cid, gs.d)
              GROUP BY cid) m3 USING (cid)"""
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         n AS (SELECT vec_id, v,
                 sqrt(list_reduce(list_prepend(0.0, list_transform(v, x -> x*x)), (a,x) -> a + x)) AS nrm
               FROM e),
         kk AS (SELECT greatest(8, (count(*) + ${SemTarget - 1}) // $SemTarget) AS k FROM e),
         kk1 AS (SELECT greatest(1, CAST(ceil(sqrt(k)) AS BIGINT)) AS k1 FROM kk),
         smp AS (SELECT vec_id, v FROM e WHERE vec_id % 2 = 0),
         seeds AS (SELECT s.rn, vec_id AS cid, v AS cv FROM (
                     SELECT vec_id, v, row_number() OVER (ORDER BY
                       (vec_id * 1103515245 + 12345) % 2147483648, vec_id) AS rn
                     FROM smp) s, kk WHERE s.rn <= kk.k),
         seeds0 AS (SELECT cid, cv FROM seeds),
         coarse AS (SELECT cid AS ccid, cv AS ccv FROM seeds, kk1 WHERE rn <= kk1.k1),
         cellmap AS (SELECT cid,
                       CASE WHEN srn <= (SELECT k1 FROM kk1) THEN cid ELSE bcid END AS cell
                     FROM (SELECT s.cid, s.rn AS srn, c.ccid AS bcid,
                             row_number() OVER (PARTITION BY s.cid ORDER BY
                               ${d2("s.cv", "c.ccv")}, c.ccid) AS rn2
                           FROM seeds s CROSS JOIN coarse c) WHERE rn2 = 1),
         acs AS (${acSql("smp")}),
         a0 AS (${assignSql("smp", "seeds0", "acs")}),
         c1 AS (${updateSql("smp", "a0", "seeds0")}),
         a1 AS (${assignSql("smp", "c1", "acs")}),
         c2 AS (${updateSql("smp", "a1", "c1")}),
         ace AS (${acSql("e")}),
         a AS (${assignSql("e", "c2", "ace")}),
         m AS (SELECT n.vec_id, n.v, n.nrm, a.cid FROM n JOIN a USING (vec_id)),
         dup AS (SELECT DISTINCT y.vec_id AS dup_id
                 FROM m x JOIN m y ON x.cid = y.cid AND x.vec_id < y.vec_id
                 WHERE ${dot("x.v", "y.v")} / (x.nrm * y.nrm) >= 0.45)
         SELECT vec_id, cid FROM m
         WHERE vec_id NOT IN (SELECT dup_id FROM dup)
         ORDER BY vec_id"""
    },
    "dedup_substring" ->
      s"""WITH t AS (SELECT doc_id,
                   CASE WHEN doc_id % 7 = 0 THEN text || ' $SharedPassage'
                        ELSE text END AS t2
                 FROM documents),
          tk AS (SELECT doc_id, string_split(trim(t2), ' ') AS tk FROM t),
          g AS (SELECT doc_id,
                  unnest(range(0, greatest(len(tk) - ${SubGram - 1}, 0))) AS pos,
                  unnest(list_transform(
                    range(0, greatest(len(tk) - ${SubGram - 1}, 0)),
                    i -> array_to_string(tk[i+1 : i+$SubGram], ' '))) AS g
                FROM tk),
          d AS (SELECT g FROM g GROUP BY g HAVING count(DISTINCT doc_id) >= 2),
          m AS (SELECT doc_id, pos FROM g JOIN d USING (g)),
          s AS (SELECT doc_id, pos,
                  CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= $SubGram
                       THEN 0 ELSE 1 END AS brk
                FROM m),
          sp AS (SELECT doc_id, pos,
                   sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS span_id
                 FROM s)
          SELECT doc_id, CAST(span_id AS BIGINT) AS span_id,
                 min(pos) AS start_pos,
                 max(pos) + ${SubGram - 1} AS end_pos,
                 max(pos) + ${SubGram - 1} - min(pos) + 1 AS span_tokens
          FROM sp GROUP BY doc_id, span_id ORDER BY doc_id, span_id"""
  )
}
