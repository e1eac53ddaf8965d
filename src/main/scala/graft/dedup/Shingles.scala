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
    * With a document-frequency cap (the production path): a TWO-exchange
    * posting-list plan, no joins at all. Each document's shingle-set size
    * is computed map-side (it is just the length of its distinct-shingle
    * array) and travels WITH the doc id into the inverted index, built in
    * one shuffle by the memory-bounded [[graft.functions.CappedCollect]].
    * Over-cap shingles (boilerplate shared by everything — no near-dup
    * signal, and the quadratic fan-out hazard) are identified by list
    * saturation and dropped, which simultaneously applies the stop-shingle
    * cap, caps the per-shingle pair fan-out at C(cap,2), and bounds
    * executor memory even on a key shared by 10^8 documents. Pairs are then
    * generated INSIDE each posting array carrying (n_a, n_b) along, so the
    * second shuffle — counting each pair — is the last one; the old
    * formulation self-joined the exploded (id, shingle) table (two more
    * exchanges) and joined sizes back on both pair sides (two more).
    *
    * Capped semantics: `n_a`/`n_b` are each document's TOTAL distinct
    * shingle count, while `n_common` counts only under-cap shingles —
    * i.e. jaccard is exact on corpora with no over-cap shingle (this test
    * corpus: max DF 25) and a conservative lower bound on boilerplate-heavy
    * ones (boilerplate can never push a pair OVER the threshold). That is
    * also the quantity MinHash estimates, which makes d04 the right ground
    * truth for the sketch paths.
    *
    * Without a cap (ground-truth path, small corpora only): the classic
    * shingle self-join, quadratic in documents-per-shingle by definition,
    * with post-join size lookups.
    */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
                   n: Int, minJaccard: Double,
                   maxShingleDf: Option[Int] = None): DataFrame = {
    // Both paths shuffle an 8-byte xxhash64 of the shingle instead of the
    // ~10n-byte string: distinct-per-doc shingles make the hash a faithful
    // stand-in for set membership (a 64-bit collision would need ~2^32
    // distinct shingles per corpus to become likely).
    maxShingleDf match {
      case Some(cap) =>
        val shs = graft.functions.ShingleHashesFn.shingleHashes(
          col(textCol), n, distinct = true)
        val exploded = df
          .select(col(idCol), shs.as("__shs"))
          .select(col(idCol), size(col("__shs")).as("sz"),
            explode(col("__shs")).as("sh"))
        val postings = exploded.groupBy(col("sh"))
          .agg(graft.functions.CappedCollect.cappedCollect(
            struct(col(idCol).as("id"), col("sz").as("sz")), cap).as("ids"))
          .filter(size(col("ids")) <= cap)
          // struct sort is lexicographic and id is the leading (unique)
          // field, so (i < j) <=> (ids[i].id < ids[j].id): pair structs
          // come out already ordered id_a < id_b
          .select(array_sort(col("ids")).as("ids"))
        val sz = size(col("ids"))
        postings.filter(sz >= 2)
          .select(explode(flatten(transform(
            sequence(lit(0), sz - 2),
            i => transform(sequence(i + 1, sz - 1),
              j => struct(
                element_at(col("ids"), i + 1).getField("id").as("id_a"),
                element_at(col("ids"), j + 1).getField("id").as("id_b"),
                element_at(col("ids"), i + 1).getField("sz").as("n_a"),
                element_at(col("ids"), j + 1).getField("sz").as("n_b")))))).as("p"))
          .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"),
            col("p.n_a").as("n_a"), col("p.n_b").as("n_b"))
          .groupBy("id_a", "id_b", "n_a", "n_b")
          .agg(count(lit(1)).as("n_common"))
          .withColumn("jaccard",
            col("n_common").cast("double") /
              (col("n_a") + col("n_b") - col("n_common")).cast("double"))
          .filter(col("jaccard") >= minJaccard)
          .select("id_a", "id_b", "n_common", "n_a", "n_b", "jaccard")
      case None =>
        val sh = explodeShingleHashes(df, idCol, textCol, n)
        val sizes = sh.groupBy(col(idCol)).agg(count(lit(1)).as("sz"))
        val a = sh.select(col(idCol).as("id_a"), col("sh"))
        val b = sh.select(col(idCol).as("id_b"), col("sh"))
        a.join(b, Seq("sh"))
          .filter(col("id_a") < col("id_b"))
          .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_common"))
          // sizes is one row per document: tiny here, 10^8 rows at corpus
          // scale — no broadcast hint; AQE decides from runtime stats
          .join(sizes.select(col(idCol).as("id_a"), col("sz").as("n_a")), Seq("id_a"))
          .join(sizes.select(col(idCol).as("id_b"), col("sz").as("n_b")), Seq("id_b"))
          .withColumn("jaccard",
            col("n_common").cast("double") /
              (col("n_a") + col("n_b") - col("n_common")).cast("double"))
          .filter(col("jaccard") >= minJaccard)
          .select("id_a", "id_b", "n_common", "n_a", "n_b", "jaccard")
    }
  }
}
