package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: opaque `binary` payloads + typed metadata.
  *
  * The pattern for image/audio/video at 100 TB: the payload travels as a
  * parquet binary column (or a (path, offset, length) pointer for very large
  * blobs), metadata travels as typed columns, and decode/feature-extract
  * runs as an iterator-to-iterator `mapPartitions` so one task streams one
  * partition of blobs without materializing them all (same shape the
  * reference uses for per-fastq md5/read-count work,
  * collect_seqrun_fastq_to_db.py:248-337).
  *
  * The codec itself is STUBBED — image/audio libraries are not in this
  * container — with a deterministic fake that derives pseudo-metadata from
  * the bytes. The Spark-side contract (schema, partitioning, batch shape,
  * typed Encoder) is real and tested; swapping [[DecodeStub.decode]] for a
  * real JNI/library call changes nothing in the plan.
  */
object Multimodal {

  /** Decoded media metadata — the typed output of the decode stage. */
  final case class MediaMeta(
      doc_id: Long,
      n_bytes: Int,
      width: Int,
      height: Int,
      channels: Int,
      features: Array[Float])

  /** Deterministic fake decoder standing in for the real codec. */
  object DecodeStub {
    def decode(id: Long, payload: Array[Byte]): MediaMeta = {
      val n = payload.length
      val w = (n % 1024) + 1
      val h = (n / 1024) + 1
      // "features": first 8 bytes, scaled — a stand-in for an embedding
      val feats = payload.take(8).padTo(8, 0.toByte).map(b => (b & 0xff) / 255.0f)
      MediaMeta(id, n, w, h, 3, feats)
    }
  }

  /** Attach a binary payload column (here: the UTF-8 bytes of `textCol`;
    * in production, the raw media bytes read via `binaryFile`). */
  def attachPayload(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), col(textCol).cast("binary").as("payload"))

  /** Decode stage: one task streams one partition of payloads through the
    * (stub) codec. Iterator-to-iterator — constant memory per task. */
  def decodePartitions(payloads: DataFrame, spark: SparkSession): Dataset[MediaMeta] = {
    import spark.implicits._
    payloads.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => DecodeStub.decode(id, bytes) })
  }

  /** Frame sampling: slice a "video" payload into fixed-size frames and
    * keep every `stride`-th one — pure column ops (substring on binary),
    * no UDF, explodable downstream. */
  def sampleFrames(payloads: DataFrame, frameBytes: Int, stride: Int): DataFrame =
    payloads.select(col("doc_id"),
      transform(
        sequence(lit(0),
          greatest(floor((length(col("payload")) - 1) / (frameBytes * stride)).cast("int"), lit(0))),
        i => col("payload").substr(i * (frameBytes * stride) + 1, lit(frameBytes)))
        .as("frames"))
}
