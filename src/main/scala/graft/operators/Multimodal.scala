package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: treat image/audio/video payloads as
  * opaque `binary` columns plus typed metadata, with decode /
  * feature-extract implemented per-partition in batches.
  *
  * The decode step is REAL for PNG and JPEG payloads: magic-byte
  * sniffing plus a `javax.imageio` HEADER read (plain JDK, no native
  * codecs) yields true width/height without decoding pixel data — the
  * cheap metadata pass a media-curation pipeline runs corpus-wide.
  * Every other payload falls back to [[fakeDecode]]'s deterministic
  * stub (video/audio codecs are unavailable in this environment).
  * Equally real — and tested — is the Spark-side shape: binary column
  * in/out, typed `mapPartitions` batching (the Scala analog of
  * `mapInPandas` batch processing), schema declaration, and narrow
  * no-shuffle execution, which is the part that has to survive 100 TB
  * of media blobs (one partition = one batch of blobs; no driver-side
  * collection anywhere).
  */
object Multimodal {

  /** Decoded-media metadata record. `codec` is `png`/`jpeg` for real
    * header decodes, `stub` for the fallback.
    */
  case class MediaMeta(id: Long, n_bytes: Int, width: Int, height: Int, n_frames: Int, codec: String)

  /** STUB decode for payload types with no available codec: derive
    * metadata deterministically from payload size. Replace with a real
    * decoder (e.g. JavaCV for video) without touching the plan.
    */
  def fakeDecode(id: Long, payload: Array[Byte]): MediaMeta = {
    val n = payload.length
    MediaMeta(id, n, n % 640, n % 480, n % 16, "stub")
  }

  private def isPng(b: Array[Byte]): Boolean =
    b.length > 8 && b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N' && b(3) == 'G'

  private def isJpeg(b: Array[Byte]): Boolean =
    b.length > 3 && b(0) == 0xFF.toByte && b(1) == 0xD8.toByte && b(2) == 0xFF.toByte

  /** Decode one payload's metadata: a real `javax.imageio` header read
    * for PNG/JPEG (width/height parsed from the image header — pixel
    * data is never decoded, so cost is O(header) not O(image)), stub
    * fallback for everything else or on parse failure.
    */
  def decodeOne(id: Long, payload: Array[Byte]): MediaMeta = {
    // a missing blob is routine in a media corpus: stub metadata for an
    // empty payload, never a task-killing NPE
    if (payload == null) return fakeDecode(id, Array.emptyByteArray)
    if (isPng(payload) || isJpeg(payload)) {
      val in = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(in)
        if (readers.hasNext) {
          val r = readers.next()
          try {
            r.setInput(in)
            return MediaMeta(
              id, payload.length, r.getWidth(0), r.getHeight(0), 1,
              if (isPng(payload)) "png" else "jpeg")
          } finally r.dispose()
        }
      } catch {
        // a magic-bytes match with a malformed header makes ImageIO
        // throw unchecked exceptions too (IllegalArgument, index/array
        // errors on fuzzed input) — any parse failure means "not
        // decodable", which is the stub's job, never a task failure
        case scala.util.control.NonFatal(_) => ()
      } finally in.close()
    }
    fakeDecode(id, payload)
  }

  /** Per-partition batched decode over (id, binary payload) rows.
    * Batching amortizes per-record codec setup exactly like
    * `mapInPandas` batches arrow record-batches.
    */
  def decodeMeta(df: DataFrame, idCol: String, payloadCol: String, batchSize: Int = 256): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // per-batch decoder setup would go here (ImageIO readers are
          // created per payload since formats can vary within a batch)
          batch.iterator.map { case (id, bytes) => decodeOne(id, bytes) }
        }
      }
      .toDF()
  }

  /** Frame-sampling stub: emit every `stride`-th "frame index" for each
    * payload — the row-explosion shape of video frame extraction.
    */
  def sampleFrames(df: DataFrame, idCol: String, payloadCol: String, stride: Int): DataFrame = {
    val nFrames = (octet_length(col(payloadCol).cast("binary")) % 16).cast("int")
    df
      // zero-frame payloads emit NO rows — clamping -1 up to 0 would
      // fabricate a phantom frame 0 that disagrees with decodeMeta
      .where(nFrames > 0)
      .select(
        col(idCol).cast("long").as("id"),
        explode(sequence(lit(0), nFrames - 1, lit(stride))).as("frame_idx")
      )
  }

  /** Feature extraction over binary payloads: each blob becomes a
    * fixed-`dim` float vector (here a STUB: an L1-normalized folded
    * byte histogram — deterministic, so identical payloads map to
    * identical vectors; swap the body for a real model/encoder without
    * touching the plan). Batched per partition like [[decodeMeta]];
    * output (id, features array<float>) feeds straight into the
    * [[Similarity]] ANN/near-dup operators — the binary -> embedding ->
    * dedup composition a training-data pipeline runs at 100 TB.
    */
  def extractFeatures(
      df: DataFrame,
      idCol: String,
      payloadCol: String,
      dim: Int = 64,
      batchSize: Int = 256
  ): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // a real encoder would load model weights once per batch here
          batch.iterator.map { case (id, bytesOrNull) =>
            val bytes = if (bytesOrNull == null) Array.emptyByteArray else bytesOrNull
            val hist = new Array[Float](dim)
            var i = 0
            while (i < bytes.length) {
              hist((bytes(i) & 0xff) % dim) += 1.0f
              i += 1
            }
            val total = math.max(bytes.length, 1).toFloat
            var j = 0
            while (j < dim) { hist(j) /= total; j += 1 }
            (id, hist)
          }
        }
      }
      .toDF("id", "features")
  }

  /** Resize stub: computes the target dimensions of an aspect-preserving
    * fit into `maxW` x `maxH` from the decoded (fake) dimensions — the
    * metadata side of a resize pipeline; a real implementation would
    * also emit the resized payload from the same per-batch loop.
    */
  def resizeMeta(df: DataFrame, idCol: String, payloadCol: String, maxW: Int, maxH: Int): DataFrame = {
    val n = octet_length(col(payloadCol).cast("binary"))
    val w = greatest(n % 640, lit(1)).cast("double")
    val h = greatest(n % 480, lit(1)).cast("double")
    val scale = least(lit(maxW) / w, lit(maxH) / h, lit(1.0))
    df.select(
      col(idCol).cast("long").as("id"),
      w.cast("int").as("src_width"),
      h.cast("int").as("src_height"),
      floor(w * scale).cast("int").as("out_width"),
      floor(h * scale).cast("int").as("out_height")
    )
  }
}
