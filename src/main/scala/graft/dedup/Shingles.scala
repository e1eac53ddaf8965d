package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.TextMetrics

/** Word n-gram shingling and exact n-gram Jaccard near-duplicate pairs.
  *
  * Exact Jaccard via a shingle self-join is the *verification* path: it is
  * quadratic in documents-per-shingle, so at 100 TB it only runs on
  * candidate pairs produced by [[MinHashLsh]] / [[SimHash]]. On the test
  * corpus it doubles as the ground truth those sketches are judged against.
  */
object Shingles {

  /** Word n-grams over an ALREADY-MATERIALIZED token array column.
    * Taking the tokens as a column reference matters: expressions inside a
    * `transform` lambda are re-evaluated per element with no common-subexpr
    * elimination, so inlining the tokenizer here re-runs the regex split
    * 3n× per document (measured 10s of a 23s pipeline at sf0.1). */
  def wordShinglesFromTokens(toks: Column, n: Int): Column =
    // size < n must short-circuit: sequence(0, -1) yields [0, -1] (a
    // DESCENDING sequence), whose element_at(toks, 0) throws
    when(size(toks) < n, array().cast("array<string>")).otherwise(
      array_distinct(
        transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j + 1)): _*))))

  /** Word n-grams of `text`, distinct per document. Prefer
    * [[explodeShingles]], which materializes the token array first. */
  def wordShingles(c: Column, n: Int): Column =
    wordShinglesFromTokens(TextMetrics.tokens(c), n)

  /** (id, shingle) long table — the explode side of the pipeline. */
  def explodeShingles(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    df.select(col(idCol), TextMetrics.tokens(col(textCol)).as("__toks"))
      .select(col(idCol), explode(wordShinglesFromTokens(col("__toks"), n)).as("shingle"))

  /** (id, sh: long) — distinct xxhash64 per word n-gram, via the one-pass
    * [[graft.functions.ShingleHashes]] expression. Bit-identical to
    * `xxhash64` over [[explodeShingles]]'s strings at ~10× less cost; the
    * dedup pipeline evaluates its shingle subtree once per consumer, so the
    * savings multiply. */
  def explodeShingleHashes(df: DataFrame, idCol: String, textCol: String,
                           n: Int): DataFrame =
    df.select(col(idCol),
      explode(graft.functions.ShingleHashesFn.shingleHashes(
        col(textCol), n, distinct = true)).as("sh"))

  /** All pairs (a < b) with exact Jaccard similarity >= minJaccard.
    *
    * Plan shape: one shuffle on shingle for the self-join (skew caution: a
    * stop-shingle shared by everything explodes the join — at scale, drop
    * shingles above a document-frequency cap first, which also improves
    * precision), then one shuffle on the pair key. Sizes join back via two
    * broadcasts when the per-doc size table is small.
    */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
                   n: Int, minJaccard: Double,
                   maxShingleDf: Option[Int] = None): DataFrame = {
    // The self-join shuffles on an 8-byte xxhash64 of the shingle instead
    // of the ~10n-byte string: distinct-per-doc shingles make the hash a
    // faithful stand-in for set membership (a 64-bit collision would need
    // ~2^32 distinct shingles per corpus to become likely).
    val sh = explodeShingleHashes(df, idCol, textCol, n)
    // Stop-shingle cap: shingles above the document-frequency cap are
    // dropped BEFORE sizes and pair counts (boilerplate shared by
    // everything is not evidence of near-duplication, and one such shingle
    // fans the self-join out quadratically). The broadcast side is the
    // OVER-cap list — small by construction (≤ corpus_shingles / cap) —
    // joined anti; broadcasting the keep-list would ship the whole
    // vocabulary.
    val filtered = maxShingleDf match {
      case Some(cap) =>
        val stop = sh.groupBy("sh").agg(count(lit(1)).as("df"))
          .filter(col("df") > cap).select("sh")
        sh.join(broadcast(stop), Seq("sh"), "left_anti")
      case None => sh
    }
    val sizes = filtered.groupBy(col(idCol)).agg(count(lit(1)).as("sz"))
    val a = filtered.select(col(idCol).as("id_a"), col("sh"))
    val b = filtered.select(col(idCol).as("id_b"), col("sh"))
    val common = a.join(b, Seq("sh"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_common"))
    common
      .join(sizes.select(col(idCol).as("id_a"), col("sz").as("n_a")), Seq("id_a"))
      .join(sizes.select(col(idCol).as("id_b"), col("sz").as("n_b")), Seq("id_b"))
      .withColumn("jaccard",
        col("n_common").cast("double") /
          (col("n_a") + col("n_b") - col("n_common")).cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .select("id_a", "id_b", "n_common", "n_a", "n_b", "jaccard")
  }
}
