package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-relevance operators: vocabulary building and TF-IDF term
  * extraction — the frequency statistics a training-data pipeline computes
  * before filtering/weighting documents (reference analog: the value_counts
  * censuses of reformat_metadata_file.py, generalized to token space).
  *
  * Scoring is exact integer arithmetic end to end: the classic
  * `tf·ln(N/df)` weight is replaced by the scaled-integer rational
  * `score = (tf · SCALE) div df` — monotone in tf and 1/df exactly like
  * tf-idf, but bit-identical across engines (no transcendental whose last
  * ulp can differ between java.lang.Math and libm, which would flip
  * near-tie rankings and break the oracle hash). Ranking ties break on the
  * term string, so top-k per document is fully deterministic.
  */
object Relevance {

  private val Scale = 1000000L

  /** Per-document term frequencies: one row per (id, term, tf).
    * One generator + one shuffle on (id, term). */
  def termFrequencies(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), explode(TextMetrics.tokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))

  /** Corpus vocabulary: distinct terms with collection frequency and
    * document frequency, top `k` by (n desc, term asc) with a dense rank.
    *
    * Scale shape: the explode fans out to one row per token, but the
    * groupBy is a partial-aggregating hash agg (map-side combine), so the
    * shuffle carries one row per distinct (partition, term) — vocabulary,
    * not corpus, sized. The global order touches only the aggregated
    * vocabulary; the final rank window runs on k rows post-limit. */
  def vocabulary(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val counts = df
      .select(col(idCol), explode(TextMetrics.tokens(col(textCol))).as("term"))
      .groupBy("term")
      .agg(count(lit(1)).as("n"), countDistinct(col(idCol)).as("n_docs"))
      .orderBy(col("n").desc, col("term").asc)
      .limit(k)
    // k rows at this point — the single-partition window is bounded by k,
    // not by the data (contrast the global-window anti-pattern r1 flagged)
    counts.withColumn("rank",
      row_number().over(Window.orderBy(col("n").desc, col("term").asc)))
  }

  /** Top `k` most distinctive terms per document by scaled-integer tf-idf.
    *
    * df(term) is computed once per corpus (hash agg over the same exploded
    * frequencies) and joined back on the term key; N is a scalar broadcast
    * into the score expression. The per-document top-k runs through a
    * (id)-partitioned window — bounded work per key, no global order. */
  def topTerms(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val n = df.count() // corpus size: one scalar, computed before the plan
    // overflow bound: score = tf·Scale·n must fit a Long for the largest
    // plausible tf (a document is bounded by ~10^4 repeated tokens here);
    // past ~10^8 documents, shrink Scale — the ranking only needs enough
    // resolution to separate df values, which cap at n
    require(n <= 100000000L,
      s"topTerms integer score would overflow Long at n=$n docs with " +
        s"Scale=$Scale; use a smaller Scale for corpora beyond 1e8 documents")
    val tf = termFrequencies(df, idCol, textCol)
    val docFreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    // SQL `div` keeps the whole score integer (no float division anywhere);
    // tf·Scale·N stays far below Long.MaxValue for any plausible tf
    val scored = tf.join(docFreq, "term")
      .withColumn("score", expr(s"(tf * ${Scale * n}L) div df"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score").desc, col("term").asc)
    scored
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col(idCol), col("term"), col("tf"), col("df"), col("score"), col("rnk"))
  }
}
