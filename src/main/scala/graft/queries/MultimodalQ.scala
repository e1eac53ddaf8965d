package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.multimodal.Multimodal

/** Multimodal-column queries. m01 is oracle-backed (byte-level metadata is
  * plain arithmetic both engines agree on); m02 exercises the mapPartitions
  * decode path (stub codec — rows-only check, covered by MultimodalSpec). */
object MultimodalQ {

  /** Binary payload metadata: byte length, checksum, pseudo format tag. */
  def binaryMeta(s: SparkSession, dir: String): DataFrame = {
    val payloads = Multimodal.attachPayload(Tables(s, dir).documents, "doc_id", "text")
    payloads.select(
      col("doc_id"),
      length(col("payload")).as("n_bytes"),
      md5(col("payload")).as("checksum"),
      element_at(typedLit(Seq("jpeg", "png", "wav")),
        (length(col("payload")) % 3 + 1).cast("int")).as("fmt"),
      // Spark base64 is MIME (CRLF every 76 chars); strip to RFC4648 basic
      regexp_replace(base64(col("payload")), "\r\n", "").as("b64"))
  }

  /** Decode-stub pipeline: payload → mapPartitions codec → typed metadata. */
  def decodeStub(s: SparkSession, dir: String): DataFrame = {
    val payloads = Multimodal.attachPayload(Tables(s, dir).documents, "doc_id", "text")
    Multimodal.decodePartitions(payloads, s).toDF()
      .select("doc_id", "n_bytes", "width", "height", "channels")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m01_binary_meta" -> (binaryMeta _),
    "m02_decode_stub" -> (decodeStub _))

  val oracles: Map[String, String] = Map(
    "m01_binary_meta" ->
      """SELECT doc_id,
        |       CAST(octet_length(encode(text)) AS INT) AS n_bytes,
        |       md5(text) AS checksum,
        |       (['jpeg', 'png', 'wav'])[octet_length(encode(text)) % 3 + 1] AS fmt,
        |       to_base64(encode(text)) AS b64
        |FROM documents""".stripMargin)
}
