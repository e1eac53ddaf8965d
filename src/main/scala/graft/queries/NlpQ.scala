package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.text.{LangId, Relevance, Winnowing}

/** Round-5 NLP/corpus-statistics operators over `documents`: TF-IDF term
  * extraction, vocabulary building, winnowing fingerprints, and the
  * trigram-profile language classifier. All four are oracle-backed — the
  * scoring arithmetic is deliberately integer-exact (see [[Relevance]])
  * and the winnowing hash is md5-based so DuckDB reproduces it verbatim.
  */
object NlpQ {

  /** Top-3 most distinctive terms per document (scaled-integer tf-idf). */
  def tfidf(s: SparkSession, dir: String): DataFrame =
    // spread: tokenization before the term shuffle — see Tables.spread
    Relevance.topTerms(Tables.spread(Tables(s, dir).documents, "doc_id"),
      "doc_id", "text", k = 3)

  /** Corpus vocabulary: top 100 tokens by collection frequency. */
  def vocab(s: SparkSession, dir: String): DataFrame =
    Relevance.vocabulary(Tables.spread(Tables(s, dir).documents, "doc_id"),
      "doc_id", "text", k = 100)

  /** Winnowing fingerprints (k=7 char-grams, window w=4): every shared
    * substring of length ≥ 10 between two documents shares a fingerprint. */
  def winnow(s: SparkSession, dir: String): DataFrame =
    Winnowing.fingerprintRows(Tables.spread(Tables(s, dir).documents, "doc_id"),
      "doc_id", "text", k = 7, w = 4)

  /** Trigram-profile language ID (the production upgrade of d02's
    * stopword heuristic) — native one-pass scorer; the join-based
    * formulation is proven equal in LangIdNativeSpec and remains available
    * when the profile must be a joinable table. */
  def langid(s: SparkSession, dir: String): DataFrame =
    LangId.classifyNative(Tables(s, dir).documents, "doc_id", "text")

  /** Substring-level repeated-region detection over the winnowing
    * fingerprints: character spans whose content also occurs in another
    * document (gapMax=10 = w+k−1, so any cross-document repeat of length
    * ≥ 17 is guaranteed detected; ≥ 2 fingerprints per region). */
  def repeats(s: SparkSession, dir: String): DataFrame =
    // spread: the O(len) winnowing rolling hash runs before the first
    // shuffle and would otherwise be serial on the single-task scan
    Winnowing.repeatedRegions(Tables.spread(Tables(s, dir).documents, "doc_id"),
      "doc_id", "text", k = 7, w = 4, gapMax = 10, minFps = 2)

  /** Incremental repeated-region detection — the daily-crawl twin of d20:
    * even doc_ids play the accumulated history (their fingerprint registry
    * is all the flow keeps), odd doc_ids are today's batch, probed against
    * the registry without rescanning history. The oracle is d20's full
    * corpus rerun restricted to the new ids — the equality
    * [[Winnowing.incrementalRepeatedRegions]] guarantees, here checked
    * cell-exact by an engine that recomputes it the monolithic way. */
  def incrementalRepeats(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.spread(Tables(s, dir).documents, "doc_id") // see repeats
    val registry = Winnowing
      .fingerprintRows(docs.filter(col("doc_id") % 2 === 0), "doc_id", "text",
        k = 7, w = 4)
      .select("fp")
    Winnowing.incrementalRepeatedRegions(
      docs.filter(col("doc_id") % 2 === 1), "doc_id", "text", registry,
      k = 7, w = 4, gapMax = 10, minFps = 2)._1
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d09_tfidf_terms"    -> (tfidf _),
    "d10_vocab_topk"     -> (vocab _),
    "d11_winnow_fps"     -> (winnow _),
    "d12_langid_trigram" -> (langid _),
    "d20_repeat_regions" -> (repeats _),
    "d24_incr_regions"   -> (incrementalRepeats _))

  /** The winnowing fingerprint derivation (k=7, w=4) as a CTE chain ending
    * in `fps(doc_id, pos int, fp)` — shared by d11 (which selects it
    * verbatim) and d20 (which builds islands on it). `fps` is MATERIALIZED:
    * d20 references it twice, and DuckDB inlines plain CTEs per reference,
    * which would re-run the O(n·w) window-min joins. */
  private val winnowCtes =
    """g AS (
      |  SELECT doc_id, CAST(i AS INT) AS i,
      |         substr(md5(substr(text, CAST(i AS INT), 7)), 1, 12) AS h,
      |         length(text) - 6 AS m
      |  FROM documents, UNNEST(generate_series(1, length(text) - 6)) AS u(i)),
      |wmin AS (
      |  SELECT w.doc_id, w.i AS j, min(x.h) AS mn
      |  FROM g w JOIN g x ON x.doc_id = w.doc_id AND x.i BETWEEN w.i AND w.i + 3
      |  WHERE w.i <= w.m - 3
      |  GROUP BY 1, 2),
      |sel AS (
      |  SELECT m.doc_id, max(x.i) AS pos, m.mn AS fp
      |  FROM wmin m JOIN g x ON x.doc_id = m.doc_id
      |    AND x.i BETWEEN m.j AND m.j + 3 AND x.h = m.mn
      |  GROUP BY m.doc_id, m.j, m.mn),
      |fps AS MATERIALIZED (
      |  SELECT DISTINCT doc_id, CAST(pos AS INT) AS pos, fp FROM sel)""".stripMargin

  private val toksCte =
    """toks AS (
      |  SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS t
      |  FROM documents)""".stripMargin

  /** The langid profile as a SQL VALUES list — generated from
    * [[LangId.profiles]], so classifier and oracle cannot drift. */
  private def profileValues: String =
    LangId.profiles
      .map { case (l, g, w) => s"('$l','${g.replace("'", "''")}',$w)" }
      .mkString(",")

  private val langs = LangId.profiles.map(_._1).distinct.sorted

  /** d20's island-building SQL over the winnowing fingerprints; the final
    * WHERE takes an extra conjunct so d24's restricted variant cannot
    * drift from the full rerun it must equal. */
  private def repeatRegionsOracle(extraWhere: String): String =
    s"""WITH $winnowCtes,
       |xdoc AS (
       |  SELECT fp FROM fps GROUP BY fp HAVING count(DISTINCT doc_id) > 1),
       |sh AS (
       |  SELECT f.doc_id, f.pos FROM fps f WHERE f.fp IN (SELECT fp FROM xdoc)),
       |isl AS (
       |  SELECT doc_id, pos,
       |         CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= 10
       |              THEN 0 ELSE 1 END AS brk
       |  FROM sh),
       |grp AS (
       |  SELECT doc_id, pos,
       |         sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS isl_id
       |  FROM isl),
       |r AS (
       |  SELECT doc_id, min(pos) AS start_pos, max(pos) + 6 AS end_pos,
       |         CAST(count(*) AS INT) AS n_fps
       |  FROM grp GROUP BY doc_id, isl_id)
       |SELECT doc_id, start_pos, end_pos,
       |       end_pos - start_pos + 1 AS span, n_fps
       |FROM r WHERE n_fps >= 2$extraWhere""".stripMargin

  val oracles: Map[String, String] = Map(
    "d09_tfidf_terms" ->
      s"""WITH $toksCte,
         |tf AS (
         |  SELECT doc_id, u.term, count(*) AS tf
         |  FROM toks, UNNEST(t) AS u(term) GROUP BY 1, 2),
         |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         |scored AS (
         |  SELECT doc_id, tf.term, tf.tf, df.df,
         |         (tf.tf * 1000000 * (SELECT count(*) FROM documents)) // df.df AS score
         |  FROM tf JOIN df USING (term))
         |SELECT doc_id, term, tf, df, score, CAST(rnk AS INT) AS rnk
         |FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
         |        ORDER BY score DESC, term) AS rnk FROM scored)
         |WHERE rnk <= 3""".stripMargin,
    "d10_vocab_topk" ->
      s"""WITH $toksCte,
         |c AS (
         |  SELECT u.term, count(*) AS n, count(DISTINCT doc_id) AS n_docs
         |  FROM toks, UNNEST(t) AS u(term) GROUP BY 1)
         |SELECT term, n, n_docs, CAST(rank AS INT) AS rank
         |FROM (SELECT *, row_number() OVER (ORDER BY n DESC, term) AS rank FROM c)
         |WHERE rank <= 100""".stripMargin,
    "d11_winnow_fps" ->
      s"""WITH $winnowCtes
         |SELECT doc_id, pos, fp FROM fps""".stripMargin,
    "d20_repeat_regions" -> repeatRegionsOracle(""),
    // the incremental run's contract: identical to the full rerun,
    // restricted to the new batch's ids
    "d24_incr_regions" -> repeatRegionsOracle(" AND doc_id % 2 = 1"),
    "d12_langid_trigram" -> {
      val sums = langs.map(l =>
        s"CAST(sum(CASE WHEN plang = '$l' THEN weight ELSE 0 END) AS BIGINT) AS s_$l")
        .mkString(",\n         |         ")
      val best = s"greatest(${langs.map(l => s"s_$l").mkString(", ")})"
      val cascade = langs.map(l => s"WHEN s_$l = $best THEN '$l'")
        .mkString("\n         |            ")
      s"""WITH prof(plang, trigram, weight) AS (VALUES $profileValues),
         |norm AS (
         |  SELECT doc_id, replace(' ' || lower(text) || ' ', ' ', '_') AS s
         |  FROM documents),
         |grams AS (
         |  SELECT doc_id, CAST(length(s) - 2 AS INT) AS n_trigrams,
         |         substr(s, CAST(i AS INT), 3) AS trigram
         |  FROM norm, UNNEST(generate_series(1, length(s) - 2)) AS u(i)),
         |sc AS (
         |  SELECT doc_id, n_trigrams,
         |         $sums
         |  FROM grams LEFT JOIN prof USING (trigram)
         |  GROUP BY 1, 2)
         |SELECT doc_id,
         |       CASE WHEN $best <= 0 THEN 'und'
         |            $cascade
         |       END AS lang_id,
         |       $best AS best_score,
         |       n_trigrams
         |FROM sc""".stripMargin
    })
}
