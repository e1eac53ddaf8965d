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
    array_distinct(
      transform(sequence(lit(0), greatest(size(toks) - n, lit(-1))),
        i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j + 1)): _*)))

  /** Word n-grams of `text`, distinct per document. Prefer
    * [[explodeShingles]], which materializes the token array first. */
  def wordShingles(c: Column, n: Int): Column =
    wordShinglesFromTokens(TextMetrics.tokens(c), n)

  /** (id, shingle) long table — the explode side of the pipeline. */
  def explodeShingles(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    df.select(col(idCol), TextMetrics.tokens(col(textCol)).as("__toks"))
      .select(col(idCol), explode(wordShinglesFromTokens(col("__toks"), n)).as("shingle"))

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
    val sh = explodeShingles(df, idCol, textCol, n)
      .select(col(idCol), xxhash64(col("shingle")).as("sh"))
    val filtered = maxShingleDf match {
      case Some(cap) =>
        val dfreq = sh.groupBy("sh").agg(count(lit(1)).as("df"))
          .filter(col("df") <= cap).select("sh")
        sh.join(broadcast(dfreq), Seq("sh"))
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
