package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Ingest

/** Multimodal-column plumbing (SURVEY §7.6): media as opaque `binary`
  * columns + typed metadata, with decode / feature-extract as
  * per-partition batch operators.
  *
  * The container has no image/audio codecs, so [[decodeStub]] is a
  * deterministic fake (byte stats standing in for pixels/samples); the
  * Spark-side shape — binary column, metadata struct, mapPartitions with
  * per-partition batching, explicit output schema — is the real, tested
  * contract a production decoder (JNI or Pandas-UDF-style vectorized
  * worker) would plug into.
  *
  * Scale notes: media bytes never shuffle — decode is a narrow
  * mapPartitions directly over the scan; only extracted features (small,
  * fixed-width) flow into joins/aggregations downstream. Partition sizing
  * is governed by `spark.sql.files.maxPartitionBytes` so a partition of
  * blobs fits executor memory.
  */
object Multimodal {

  /** A media row: payload + the typed metadata carried alongside it. */
  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte],
                      n_bytes: Long)

  /** Extracted features (the decoder's fixed-width output). */
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
                           checksum: Long, mean_byte: Double, frames: Int)

  /** Manufacture a binary media table from the documents corpus (UTF-8
    * payloads with synthetic kinds) — the testdata has no true media, so
    * this provides the binary-typed input for plumbing tests.
    */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Ingest.table(spark, dir, "documents")
      .select(col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        encode(col("text"), "UTF-8").as("payload"),
        octet_length(col("text")).cast("long").as("n_bytes"))
      .as[MediaRow]
  }

  /** Deterministic stand-in for the real media decoder: consumes the
    * payload bytes per partition and emits fixed-width features. A real
    * deployment swaps the body for the codec call; signature, batching,
    * and schema stay identical.
    */
  def decodeStub(rows: Iterator[MediaRow]): Iterator[MediaFeatures] =
    rows.map { r =>
      var sum = 0L
      var crc = 1L
      var i = 0
      while (i < r.payload.length) {
        sum += r.payload(i) & 0xff
        crc = crc * 31 + (r.payload(i) & 0xff)
        i += 1
      }
      val frames = r.kind match {
        case "video" => (r.n_bytes / 64 + 1).toInt // fake frame-sampling
        case "audio" => (r.n_bytes / 16 + 1).toInt
        case _       => 1
      }
      MediaFeatures(r.media_id, r.kind, r.n_bytes, crc,
        if (r.payload.isEmpty) 0.0 else sum.toDouble / r.payload.length,
        frames)
    }

  /** The decode pipeline: narrow mapPartitions over the binary scan. */
  def extractFeatures(spark: SparkSession, dir: String): Dataset[MediaFeatures] = {
    import spark.implicits._
    mediaTable(spark, dir).mapPartitions(decodeStub)
  }

  /** Resize stand-in: deterministic byte-strided decimation of the
    * payload to ≤ `maxBytes` (stride = ceil(n / maxBytes), keep bytes at
    * 0, stride, 2·stride, …) — a payload→payload transform with the same
    * shape a real thumbnail/downsample kernel has, so it composes with
    * [[decodeStub]] in one narrow pass (media bytes still never shuffle).
    */
  def resizeStub(maxBytes: Int)(rows: Iterator[MediaRow]): Iterator[MediaRow] =
    rows.map { r =>
      val n = r.payload.length
      val stride = math.max(1, (n + maxBytes - 1) / maxBytes)
      val out = new Array[Byte]((n + stride - 1) / stride)
      var i = 0
      var j = 0
      while (i < n) { out(j) = r.payload(i); j += 1; i += stride }
      MediaRow(r.media_id, r.kind, out, out.length.toLong)
    }

  /** The resize pipeline: narrow mapPartitions, binary in/binary out. */
  def resize(spark: SparkSession, dir: String, maxBytes: Int): Dataset[MediaRow] = {
    import spark.implicits._
    mediaTable(spark, dir).mapPartitions(resizeStub(maxBytes))
  }

  /** A hashed media row: the 16-hex-char perceptual fingerprint. */
  case class MediaHash(media_id: Long, kind: String, phash: String)

  /** Perceptual-hash stand-in (the LAION-style image-dedup move: pHash
    * buckets, then verify) over the opaque payload: 64 byte-buckets by
    * position mod 64, bit j = 1 iff bucket j's mean byte exceeds the
    * payload's overall mean — decided by EXACT integer cross-multiply
    * (`s_j·n_total > s_total·n_j`), so the DuckDB oracle reproduces
    * every bit. A real deployment swaps the bucket loop for a DCT over
    * decoded pixels; the signature (payload in, 16-hex fingerprint out,
    * per-partition batching) and everything downstream stay identical.
    * Hex packing is nibble-ordered MSB-first — the [[graft.ext.TextDedup.simhash]]
    * layout, so the SAME banded pairing machinery consumes it.
    */
  def phashStub(rows: Iterator[MediaRow]): Iterator[MediaHash] =
    rows.map { r =>
      val s = new Array[Long](64)
      val c = new Array[Long](64)
      var ts = 0L
      var i = 0
      while (i < r.payload.length) {
        val v = (r.payload(i) & 0xff).toLong
        s(i % 64) += v
        c(i % 64) += 1
        ts += v
        i += 1
      }
      val tc = r.payload.length.toLong
      val sb = new java.lang.StringBuilder(16)
      var ni = 0
      while (ni < 16) {
        var nv = 0
        var k = 0
        while (k < 4) {
          val j = 4 * ni + k
          if (s(j) * tc > ts * c(j)) nv |= 8 >> k
          k += 1
        }
        sb.append("0123456789abcdef".charAt(nv))
        ni += 1
      }
      MediaHash(r.media_id, r.kind, sb.toString)
    }

  /** The fingerprint pipeline: narrow mapPartitions over the binary
    * scan — payloads never shuffle; only (media_id, kind, 16-char hash)
    * rows leave the stage.
    */
  def phash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir).mapPartitions(phashStub).toDF()
      .orderBy(col("media_id"))
  }

  /** Perceptual near-duplicate media pairs: fingerprints pair through
    * the SAME banded chunk-bucket machinery as text simhash
    * ([[TextDedup.simhashPairsFromHashes]] — identical-hash classes
    * collapse first, 4-hex chunk buckets generate candidates, the
    * codegen'd Hamming kernel verifies, caps bound degenerate buckets).
    * At 100 TB the only shuffled rows are 24-byte (id, hash) tuples —
    * the media bytes stay in the scan stage.
    */
  def phashPairs(spark: SparkSession, dir: String,
                 maxDist: Int = 3): DataFrame = {
    import spark.implicits._
    val hashes = mediaTable(spark, dir).mapPartitions(phashStub).toDF()
      .select(col("media_id").as("doc_id"), col("phash").as("simhash"))
    TextDedup.simhashPairsFromHashes(hashes, maxDist, TextDedup.maxBucket)
      .select(col("d1").as("m1"), col("d2").as("m2"), col("hamming"))
      .orderBy(col("m1"), col("m2"))
  }

  /** SQL-visible metadata projection (oracle-checked): byte length and
    * sha256 of the payload, plus the synthetic kind.
    */
  def meta(spark: SparkSession, dir: String): DataFrame =
    Ingest.table(spark, dir, "documents")
      .select(col("doc_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        octet_length(col("text")).cast("long").as("n_bytes"),
        sha2(col("text"), 256).as("sha256"))
}
