package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: treat image/audio/video payloads as
  * opaque `binary` columns plus typed metadata, with decode /
  * feature-extract implemented per-partition in batches.
  *
  * The decode step is a STUB (no image/audio codecs in this
  * environment): [[fakeDecode]] derives deterministic metadata from the
  * byte payload. What IS real — and tested — is the Spark-side shape:
  * binary column in/out, typed `mapPartitions` batching (the Scala
  * analog of `mapInPandas` batch processing), schema declaration, and
  * narrow no-shuffle execution, which is the part that has to survive
  * 100 TB of media blobs (one partition = one batch of blobs; no
  * driver-side collection anywhere).
  */
object Multimodal {

  /** Decoded-media metadata record. */
  case class MediaMeta(id: Long, n_bytes: Int, fake_width: Int, fake_height: Int, fake_frames: Int)

  /** STUB decode: real codecs are unavailable, so derive metadata
    * deterministically from payload size. Replace the body with a real
    * decoder (e.g. TwelveMonkeys/JavaCV) without touching the plan.
    */
  def fakeDecode(id: Long, payload: Array[Byte]): MediaMeta = {
    val n = payload.length
    MediaMeta(id, n, n % 640, n % 480, n % 16)
  }

  /** Per-partition batched "decode" over (id, binary payload) rows.
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
          // real decoders would initialize once per batch here
          batch.iterator.map { case (id, bytes) => fakeDecode(id, bytes) }
        }
      }
      .toDF()
  }

  /** Frame-sampling stub: emit every `stride`-th "frame index" for each
    * payload — the row-explosion shape of video frame extraction.
    */
  def sampleFrames(df: DataFrame, idCol: String, payloadCol: String, stride: Int): DataFrame = {
    val nFrames = (octet_length(col(payloadCol).cast("binary")) % 16).cast("int")
    df.select(
      col(idCol).cast("long").as("id"),
      explode(sequence(lit(0), greatest(nFrames - 1, lit(0)), lit(stride))).as("frame_idx")
    )
  }
}
