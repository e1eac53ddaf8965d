package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.UnicodeNormalize
import graft.text.Segments

/** Round-6 corpus-curation operators: C4-style segment-level dedup with
  * document reconstruction and boilerplate (heavy-hitter segment)
  * detection. Segments are 3-token windows because the synthetic corpus
  * has no newlines (the operator itself takes any segmentation — see
  * [[graft.text.Segments]]).
  */
object CurationQ {

  private val SegTokens = 3
  private val MinDocs = 3

  /** C4 line-dedup analog: drop every non-first occurrence of a segment
    * corpus-wide, rebuild each document from its survivors. */
  def segmentDedup(s: SparkSession, dir: String): DataFrame =
    Segments.segmentDedup(Tables(s, dir).documents, "doc_id", "text", SegTokens)

  /** Boilerplate list: segments present in >= 3 distinct documents. */
  def boilerplate(s: SparkSession, dir: String): DataFrame =
    Segments.boilerplate(Tables(s, dir).documents, "doc_id", "text",
      SegTokens, MinDocs)

  /** Unicode NFC normalization ([[graft.functions.UnicodeNormalize]]).
    * The corpus is ASCII, so the query first derives a decomposed variant
    * (combining acute after every 'e') IDENTICALLY in both engines, then
    * normalizes — composed codepoints shrink the character length, which
    * both outputs report. The oracle is DuckDB's own `nfc_normalize`:
    * two independent implementations of the Unicode standard must agree. */
  def nfcNormalize(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).documents
      .select(col("doc_id"),
        regexp_replace(col("text"), "e", "e\u0301").as("__dec"))
      .select(col("doc_id"),
        length(col("__dec")).as("len_decomposed"),
        UnicodeNormalize.nfc(col("__dec")).as("text_nfc"))
      .withColumn("len_nfc", length(col("text_nfc")))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d13_segment_dedup" -> (segmentDedup _),
    "d14_boilerplate"   -> (boilerplate _),
    "q56_nfc_normalize" -> (nfcNormalize _))

  /** Shared segment derivation: 3-token chunks of the whitespace token
    * stream, 1-based list slicing in DuckDB mirroring Spark's `slice`. */
  private def segsCte = s"""toks AS (
    |  SELECT doc_id, list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS t
    |  FROM documents),
    |segs AS (
    |  SELECT doc_id, CAST(i AS INT) AS seg_idx,
    |         array_to_string(t[(i*$SegTokens+1):(i*$SegTokens+$SegTokens)], ' ') AS seg
    |  FROM toks, UNNEST(generate_series(0, CAST(ceil(len(t) / $SegTokens.0) AS BIGINT) - 1)) AS u(i))""".stripMargin

  val oracles: Map[String, String] = Map(
    "d13_segment_dedup" ->
      s"""WITH $segsCte,
         |flagged AS (
         |  SELECT doc_id, seg_idx, seg,
         |         row_number() OVER (PARTITION BY seg ORDER BY doc_id, seg_idx) = 1 AS keep
         |  FROM segs),
         |rebuilt AS (
         |  SELECT doc_id,
         |         count(*) AS n_segs,
         |         count(CASE WHEN keep THEN 1 END) AS n_kept,
         |         coalesce(string_agg(CASE WHEN keep THEN seg END, ' ' ORDER BY seg_idx), '') AS text_clean
         |  FROM flagged GROUP BY doc_id)
         |SELECT d.doc_id,
         |       coalesce(r.n_segs, 0) AS n_segs,
         |       coalesce(r.n_kept, 0) AS n_kept,
         |       coalesce(r.text_clean, '') AS text_clean
         |FROM documents d LEFT JOIN rebuilt r USING (doc_id)""".stripMargin,
    "d14_boilerplate" ->
      s"""WITH $segsCte
         |SELECT seg, count(DISTINCT doc_id) AS n_docs, count(*) AS n_total
         |FROM segs GROUP BY seg HAVING count(DISTINCT doc_id) >= $MinDocs""".stripMargin,
    "q56_nfc_normalize" ->
      """WITH dec AS (
        |  SELECT doc_id, replace(text, 'e', 'e' || chr(769)) AS d FROM documents)
        |SELECT doc_id,
        |       CAST(length(d) AS INT) AS len_decomposed,
        |       nfc_normalize(d) AS text_nfc,
        |       CAST(length(nfc_normalize(d)) AS INT) AS len_nfc
        |FROM dec""".stripMargin)
}
