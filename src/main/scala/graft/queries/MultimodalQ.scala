package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.multimodal.Multimodal

/** Multimodal-column queries. m01 is oracle-backed (byte-level metadata is
  * plain arithmetic both engines agree on). m02 runs the REAL ImageIO
  * codec end-to-end and is oracle-backed too: each document's byte length
  * seeds a deterministic pixel pattern that is PNG-encoded then DECODED
  * back through `javax.imageio`, and because PNG is lossless the decoded
  * integer channel sums must equal the closed-form sums DuckDB computes
  * without any image library. A wrong pixel anywhere in encode OR decode
  * breaks the hash match. */
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

  /** Real image decode: synth pattern → PNG bytes → `javax.imageio`
    * decode → exact integer channel sums. The PNG bytes stand in for
    * stored media payloads; dimensions derive from the document's byte
    * length so every row exercises a different shape. */
  def imageDecode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val seeded = Tables(s, dir).documents
      .select(col("doc_id"), length(col("text").cast("binary")).as("n"))
      .as[(Long, Long)]
    val decoded = seeded.mapPartitions(_.flatMap { case (id, n) =>
      val w = (n % 13).toInt + 4
      val h = ((n / 13) % 11).toInt + 4
      val png = Multimodal.CompressedImage.renderPattern(n, w, h)
      Multimodal.CompressedImage.decode(id, png)
    })
    decoded.toDF().select("doc_id", "width", "height", "sum_r", "sum_g", "sum_b")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m01_binary_meta" -> (binaryMeta _),
    "m02_image_decode" -> (imageDecode _))

  val oracles: Map[String, String] = Map(
    "m01_binary_meta" ->
      """SELECT doc_id,
        |       CAST(octet_length(encode(text)) AS INT) AS n_bytes,
        |       md5(text) AS checksum,
        |       (['jpeg', 'png', 'wav'])[octet_length(encode(text)) % 3 + 1] AS fmt,
        |       to_base64(encode(text)) AS b64
        |FROM documents""".stripMargin,
    "m02_image_decode" ->
      """WITH dims AS (
        |  SELECT doc_id, octet_length(encode(text)) AS n,
        |         (octet_length(encode(text)) % 13) + 4 AS w,
        |         ((octet_length(encode(text)) // 13) % 11) + 4 AS h
        |  FROM documents)
        |SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        |       CAST(SUM((3 * x + 7 * y + n) % 256) AS BIGINT) AS sum_r,
        |       CAST(SUM((3 * x + 7 * y + 11 + n) % 256) AS BIGINT) AS sum_g,
        |       CAST(SUM((3 * x + 7 * y + 22 + n) % 256) AS BIGINT) AS sum_b
        |FROM dims,
        |     UNNEST(generate_series(0, w - 1)) AS ux(x),
        |     UNNEST(generate_series(0, h - 1)) AS uy(y)
        |GROUP BY 1, 2, 3""".stripMargin)
}
