package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column plumbing: opaque `binary` payloads + typed metadata,
  * with decode / feature-extraction as distributed per-partition passes.
  *
  * The container has no image/audio codecs, so the DECODE STEP IS A
  * DETERMINISTIC FAKE (clearly marked below); everything around it — the
  * binary column, the schema, partition-parallel batch processing with a
  * typed Encoder, and the metadata projection — is the real plumbing a
  * 100 TB multimodal pipeline needs. Swap `fakeDecode` for an actual codec
  * (or a Pandas UDF in PySpark) and nothing else changes.
  */
object Multimodal {
  type QFn = (SparkSession, String) => DataFrame

  final case class Blob(doc_id: Long, payload: Array[Byte])
  final case class BlobFeatures(doc_id: Long, byte_len: Int, first_byte: Int,
                                checksum: Long, width: Int, height: Int,
                                mean_byte: Double)

  /** STUB — stands in for a real image/audio decoder. Deterministic pure
    * function of the payload bytes so the pipeline is testable without
    * codecs: "dimensions" are derived from the checksum, the "feature" is
    * the mean byte value. */
  private def fakeDecode(b: Blob): BlobFeatures = {
    val len = b.payload.length
    var sum = 0L
    var i = 0
    while (i < len) { sum += b.payload(i) & 0xff; i += 1 }
    BlobFeatures(
      doc_id = b.doc_id,
      byte_len = len,
      first_byte = if (len > 0) b.payload(0) & 0xff else -1,
      checksum = sum % 1000000007L,
      width = (sum % 640).toInt,
      height = (sum % 480).toInt,
      mean_byte = if (len > 0) sum.toDouble / len else 0.0)
  }

  /** Binary ingestion + partition-parallel "decode" + metadata projection.
    * documents.text is encoded to UTF-8 bytes to stand in for a media blob
    * (same plumbing: binary column in, features out, no driver round-trip). */
  private def features(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.load(s, dir, "documents")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[Blob]
      // mapPartitions: the Scala analogue of mapInPandas — the decode runs
      // once per batch of rows inside each partition, no per-row setup.
      .mapPartitions(_.map(fakeDecode))
      .toDF()
      .select(col("doc_id"), col("byte_len"), col("first_byte"),
              col("checksum"), col("width"), col("height"),
              round(col("mean_byte"), 6).as("mean_byte"))
      .orderBy(col("doc_id"))
  }

  final case class ResizedBlob(doc_id: Long, src_w: Int, src_h: Int,
                               dst_w: Int, dst_h: Int, scale: Double,
                               out_bytes: Long)

  /** Aspect-preserving fit into a 224×224 box — the resize stage of an
    * image pipeline. The GEOMETRY (fit scale, clamped integer dims, output
    * byte estimate at 3 B/px) is real; only the pixel source is the fake
    * decode. Runs in the same partition-parallel pass as the decode — a
    * real pipeline fuses decode→resize exactly like this to avoid
    * materializing full-resolution frames. */
  private def fakeResize(f: BlobFeatures, box: Int = 224): ResizedBlob = {
    val w = math.max(f.width, 1)
    val h = math.max(f.height, 1)
    val sc = math.min(box.toDouble / w, box.toDouble / h)
    val dw = math.max(1, math.floor(w * sc).toInt)
    val dh = math.max(1, math.floor(h * sc).toInt)
    ResizedBlob(f.doc_id, w, h, dw, dh, sc, dw.toLong * dh * 3L)
  }

  /** decode → resize fused per partition; emits the resize plan per blob. */
  private def resize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.load(s, dir, "documents")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[Blob]
      .mapPartitions(_.map(b => fakeResize(fakeDecode(b))))
      .toDF()
      .select(col("doc_id"), col("src_w"), col("src_h"),
              col("dst_w"), col("dst_h"),
              round(col("scale"), 6).as("scale"), col("out_bytes"))
      .orderBy(col("doc_id"))
  }

  /** Frame/sample selection pattern: deterministic 1-in-N sampling by key
    * (the "frame-sample" stage of a video pipeline: cheap pushed-down
    * predicate, no data movement). */
  private def sample(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .filter(pmod(col("doc_id"), lit(10)) === 0)
      .select(col("doc_id"), octet_length(encode(col("text"), "UTF-8")).as("byte_len"))
      .orderBy(col("doc_id"))

  def queries: Map[String, QFn] = Map(
    "mm_blob_features" -> (features _),
    "mm_resize" -> (resize _),
    "mm_frame_sample" -> (sample _)
  )

  def oracles: Map[String, String] = Map(
    // ASCII corpus ⇒ UTF-8 bytes == char codes, so the fake decode is
    // reproducible in SQL exactly.
    "mm_blob_features" ->
      """WITH b AS (
           SELECT doc_id, text,
                  CAST(length(text) AS INT) AS byte_len,
                  list_sum(list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))) AS bsum
           FROM documents)
         SELECT doc_id, byte_len,
                CAST(ascii(substring(text, 1, 1)) AS INT) AS first_byte,
                CAST(bsum % 1000000007 AS BIGINT) AS checksum,
                CAST(bsum % 640 AS INT) AS width,
                CAST(bsum % 480 AS INT) AS height,
                round(CAST(bsum AS DOUBLE) / byte_len, 6) AS mean_byte
         FROM b ORDER BY doc_id""",
    "mm_resize" ->
      """WITH b AS (
           SELECT doc_id,
                  list_sum(list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))) AS bsum
           FROM documents),
         d AS (SELECT doc_id,
                 CAST(greatest(bsum % 640, 1) AS INT) AS src_w,
                 CAST(greatest(bsum % 480, 1) AS INT) AS src_h
               FROM b),
         r AS (SELECT doc_id, src_w, src_h,
                 least(224.0 / src_w, 224.0 / src_h) AS sc
               FROM d)
         SELECT doc_id, src_w, src_h,
                CAST(greatest(floor(src_w * sc), 1) AS INT) AS dst_w,
                CAST(greatest(floor(src_h * sc), 1) AS INT) AS dst_h,
                round(sc, 6) AS scale,
                CAST(CAST(greatest(floor(src_w * sc), 1) AS BIGINT)
                     * CAST(greatest(floor(src_h * sc), 1) AS BIGINT) * 3 AS BIGINT) AS out_bytes
         FROM r ORDER BY doc_id""",
    "mm_frame_sample" ->
      """SELECT doc_id, CAST(length(text) AS INT) AS byte_len
         FROM documents WHERE doc_id % 10 = 0 ORDER BY doc_id"""
  )
}
