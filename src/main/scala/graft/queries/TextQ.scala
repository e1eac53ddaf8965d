package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.dedup.{MinHashLsh, Shingles, SimHash}
import graft.text.TextMetrics

/** Text-analysis + deduplication operators over the `documents` table.
  * d01–d05 are oracle-backed; d06/d07 (MinHash-LSH, SimHash) are sketch
  * operators whose hash families have no SQL twin — the driver records a
  * rows-only check, and their ground truth is d04's exact Jaccard (see
  * DedupSpec, which asserts the sketches recover the implanted near-dup
  * pairs d04 finds). */
object TextQ {

  /** Token statistics per document (token array materialized once). */
  def tokenStats(s: SparkSession, dir: String): DataFrame = {
    val lens = transform(col("__toks"), t => length(t))
    Tables(s, dir).documents
      .withColumn("__toks", TextMetrics.tokens(col("text")))
      .select(
        col("doc_id"),
        size(col("__toks")).as("n_tokens"),
        TextMetrics.bpeTokenCount(col("text")).as("n_bpe"),
        TextMetrics.punctCount(col("text")).as("n_punct"),
        round(aggregate(lens, lit(0), (acc, x) => acc + x).cast("double") /
          size(col("__toks")).cast("double"), 9).as("mean_tok_len"))
  }

  /** Language-ID + quality scoring (tokens materialized once — the
    * when-cascade would otherwise re-run the tokenizer per score). */
  def qualityLang(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).documents
      .withColumn("__toks", TextMetrics.tokens(col("text")))
      .select(
        col("doc_id"), col("lang"),
        TextMetrics.langIdFromTokens(col("__toks")).as("lang_id"),
        TextMetrics.qualityScoreFromTokens(col("__toks"), col("text")).as("quality"))

  /** Exact dedup via content fingerprint: one canonical doc per distinct
    * text, plus the duplicate count. */
  def exactDedup(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).documents
      .groupBy(TextMetrics.fingerprint(col("text")).as("fp"))
      .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("n_copies"))

  /** Exact n-gram Jaccard near-duplicate pairs (the sketch ground truth).
    * Shingles seen in > 64 documents are stop-shingles, removed as
    * preprocessing (mirrored in the oracle); jaccard runs over the
    * filtered shingle space — see [[Shingles.jaccardPairs]] for why sizes
    * must be post-cap too. Exact on this corpus (max DF 25 < 64). */
  def ngramJaccard(s: SparkSession, dir: String): DataFrame =
    Shingles.jaccardPairs(Tables(s, dir).documents, "doc_id", "text",
      n = 3, minJaccard = 0.5, maxShingleDf = Some(64))

  /** Per-source length census — the reporting rollup a curation pipeline
    * runs after filtering. */
  def sourceCensus(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).documents
      .groupBy("source", "lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"))

  /** Intra-document repetition: duplicate word-trigram ratio, the
    * Gopher-style quality signal that catches boilerplate/looping text a
    * cross-document dedup never sees. Shuffle-free scalar projection over
    * the one-pass ShingleHashes expression (distinct=false), so it runs at
    * scan speed; docs with no trigram (under 3 tokens) are excluded on
    * both sides. */
  def repetition(s: SparkSession, dir: String): DataFrame = {
    val grams = graft.functions.ShingleHashesFn.shingleHashes(
      col("text"), 3, distinct = false)
    Tables(s, dir).documents
      .select(col("doc_id"), grams.as("__g"))
      .filter(size(col("__g")) > 0)
      .select(col("doc_id"),
        size(col("__g")).cast("long").as("n_grams"),
        (size(col("__g")) - size(array_distinct(col("__g")))).cast("long").as("n_dup"))
      .withColumn("dup_ratio",
        round(col("n_dup").cast("double") / col("n_grams").cast("double"), 9))
  }

  /** MinHash+LSH near-dup candidates (sketch path; rows-only check). */
  def minhashDedup(s: SparkSession, dir: String): DataFrame =
    MinHashLsh.nearDuplicates(Tables(s, dir).documents, "doc_id", "text",
      minEstJaccard = 0.5)

  /** SimHash near-dup pairs (sketch path; rows-only check). Balanced
    * preset: hamming <= 6 over 8 chunks with the hot-chunk cap on. */
  def simhashDedup(s: SparkSession, dir: String): DataFrame =
    SimHash.nearDuplicates(Tables(s, dir).documents, "doc_id", "text",
      SimHash.Balanced)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d01_token_stats"   -> (tokenStats _),
    "d02_quality_lang"  -> (qualityLang _),
    "d03_exact_dedup"   -> (exactDedup _),
    "d04_ngram_jaccard" -> (ngramJaccard _),
    "d05_source_census" -> (sourceCensus _),
    "d08_repetition"    -> (repetition _),
    "d06_minhash_dedup" -> (minhashDedup _),
    "d07_simhash_dedup" -> (simhashDedup _))

  private val toksSql =
    """SELECT doc_id, lang, text,
      |       list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS t
      |FROM documents""".stripMargin

  /** Shared oracle CTE chain for the capped exact-Jaccard pipeline
    * (tokens → distinct trigram shingles → stop-shingle cap → post-cap
    * sizes → per-pair common counts). d04's oracle and q48's recursive
    * clustering oracle ([[PipelineQ]]) both build on THIS definition, so
    * a semantics change cannot drift between them. Mirrors
    * [[graft.dedup.Shingles.jaccardPairs]] with maxShingleDf=64, n=3. */
  val jaccardOracleCte: String =
    """toks AS (
      |  SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS t
      |  FROM documents),
      |sh0 AS (
      |  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
      |  FROM toks, UNNEST(generate_series(1, len(t) - 2)) AS u(i)
      |  WHERE len(t) >= 3),
      |-- stop-shingle preprocessing mirrors the Spark side: shingles with
      |-- document frequency > 64 are removed from the corpus first, and
      |-- jaccard (n_common AND sizes) runs over the filtered space
      |sh AS (
      |  SELECT * FROM sh0
      |  WHERE shingle IN (SELECT shingle FROM sh0 GROUP BY 1 HAVING count(*) <= 64)),
      |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
      |pairs0 AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
      |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)""".stripMargin

  val oracles: Map[String, String] = Map(
    "d01_token_stats" ->
      s"""WITH toks AS ($toksSql)
         |SELECT doc_id,
         |       CAST(len(t) AS INT) AS n_tokens,
         |       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS INT) AS n_bpe,
         |       CAST(length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g')) AS INT) AS n_punct,
         |       round(CAST(list_sum(list_transform(t, x -> length(x))) AS DOUBLE) / CAST(len(t) AS DOUBLE), 9) AS mean_tok_len
         |FROM toks""".stripMargin,
    "d02_quality_lang" ->
      s"""WITH toks AS ($toksSql),
         |sc AS (
         |  SELECT doc_id, lang, text, t,
         |    len(list_filter(t, x -> list_contains(['the','a','of','and','to'], x))) AS s_en,
         |    len(list_filter(t, x -> list_contains(['el','la','de','y','que'], x))) AS s_es,
         |    len(list_filter(t, x -> list_contains(['der','die','das','und','zu'], x))) AS s_de,
         |    len(list_filter(t, x -> list_contains(['le','la','de','et','que'], x))) AS s_fr,
         |    len(list_filter(t, x -> list_contains(['the','a','of','and','to','el','la','de','y','que','der','die','das','und','zu','le','et'], x))) AS s_all
         |  FROM toks)
         |SELECT doc_id, lang,
         |  CASE WHEN s_en = greatest(s_en,s_es,s_de,s_fr) AND greatest(s_en,s_es,s_de,s_fr) > 0 THEN 'en'
         |       WHEN s_es = greatest(s_en,s_es,s_de,s_fr) AND greatest(s_en,s_es,s_de,s_fr) > 0 THEN 'es'
         |       WHEN s_de = greatest(s_en,s_es,s_de,s_fr) AND greatest(s_en,s_es,s_de,s_fr) > 0 THEN 'de'
         |       WHEN s_fr = greatest(s_en,s_es,s_de,s_fr) AND greatest(s_en,s_es,s_de,s_fr) > 0 THEN 'fr'
         |       ELSE 'und' END AS lang_id,
         |  round(
         |    least(CAST(len(t) AS DOUBLE) / 50.0, 1.0) * 0.4
         |    + (1.0 - least(CAST(length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g')) AS DOUBLE)
         |        / greatest(CAST(length(text) AS DOUBLE), 1.0) * 4.0, 1.0)) * 0.3
         |    + least(CAST(s_all AS DOUBLE) / greatest(CAST(len(t) AS DOUBLE), 1.0) * 8.0, 1.0) * 0.3, 9) AS quality
         |FROM sc""".stripMargin,
    "d03_exact_dedup" ->
      """SELECT md5(text) AS fp, min(doc_id) AS canonical_id, count(*) AS n_copies
        |FROM documents GROUP BY 1""".stripMargin,
    "d04_ngram_jaccard" ->
      s"""WITH $jaccardOracleCte
         |SELECT id_a, id_b, n_common, sa.sz AS n_a, sb.sz AS n_b,
         |       CAST(n_common AS DOUBLE) / CAST(sa.sz + sb.sz - n_common AS DOUBLE) AS jaccard
         |FROM pairs0
         |JOIN sizes sa ON sa.doc_id = id_a
         |JOIN sizes sb ON sb.doc_id = id_b
         |WHERE CAST(n_common AS DOUBLE) / CAST(sa.sz + sb.sz - n_common AS DOUBLE) >= 0.5""".stripMargin,
    "d08_repetition" ->
      s"""WITH toks AS ($toksSql),
         |g AS (
         |  SELECT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
         |  FROM toks, UNNEST(generate_series(1, len(t) - 2)) AS u(i)
         |  WHERE len(t) >= 3)
         |SELECT doc_id, count(*) AS n_grams,
         |       count(*) - count(DISTINCT shingle) AS n_dup,
         |       round(CAST(count(*) - count(DISTINCT shingle) AS DOUBLE)
         |             / CAST(count(*) AS DOUBLE), 9) AS dup_ratio
         |FROM g GROUP BY 1""".stripMargin,
    "d05_source_census" ->
      """SELECT source, lang, count(*) AS n_docs,
        |       CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |       min(n_chars) AS min_chars, max(n_chars) AS max_chars
        |FROM documents GROUP BY 1, 2""".stripMargin)
}
