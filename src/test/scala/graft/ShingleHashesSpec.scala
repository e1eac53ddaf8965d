package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.Shingles
import graft.functions.ShingleHashesFn.shingleHashes
import graft.text.TextMetrics

/** [[graft.functions.ShingleHashes]] must be bit-identical to the
  * compositional tokenize→n-gram→xxhash64 pipeline it replaces — MinHash
  * signatures and LSH buckets depend on the exact hash values. */
class ShingleHashesSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("n=3 distinct hashes equal xxhash64 over the string pipeline") {
    val want = Shingles.explodeShingles(docs, "doc_id", "text", 3)
      .select(col("doc_id"), xxhash64(col("shingle")).as("sh"))
    val got = Shingles.explodeShingleHashes(docs, "doc_id", "text", 3)
    assert(want.except(got).count() == 0)
    assert(got.except(want).count() == 0)
    assert(got.count() == want.count()) // distinct-ness matches too
  }

  test("n=1 non-distinct hashes equal xxhash64 per token occurrence") {
    val want = docs.select(col("doc_id"),
      explode(TextMetrics.tokens(col("text"))).as("tok"))
      .select(col("doc_id"), xxhash64(col("tok")).as("h"))
    val got = docs.select(col("doc_id"),
      explode(shingleHashes(col("text"), 1, distinct = false)).as("h"))
    // non-distinct: compare as multisets via (doc, hash, count)
    val w = want.groupBy("doc_id", "h").count()
    val g = got.groupBy("doc_id", "h").count()
    assert(w.except(g).count() == 0 && g.except(w).count() == 0)
  }

  test("whitespace variants and short docs") {
    val df = Seq(
      (1L, "  a\tb\nc  "),      // mixed separators
      (2L, "one two"),           // fewer tokens than n
      (3L, ""),                  // empty
      (4L, "x  y \r\n z w")) // vertical tab, CRLF
      .toDF("doc_id", "text")
    val want = Shingles.explodeShingles(df, "doc_id", "text", 3)
      .select(col("doc_id"), xxhash64(col("shingle")).as("sh"))
    val got = Shingles.explodeShingleHashes(df, "doc_id", "text", 3)
    assert(want.except(got).count() == 0 && got.except(want).count() == 0)
  }
}
