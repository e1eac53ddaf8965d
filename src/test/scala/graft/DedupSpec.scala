package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.{MinHashLsh, Shingles, SimHash}

/** The sketch dedup paths are judged against the exact n-gram Jaccard
  * ground truth on the same corpus (which itself is oracle-checked). */
class DedupSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val docs = Tables(spark, sf).documents
  private lazy val exactPairs: Set[(Long, Long)] =
    Shingles.jaccardPairs(docs, "doc_id", "text", n = 3, minJaccard = 0.5)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("corpus has implanted near-duplicate pairs") {
    assert(exactPairs.nonEmpty)
  }

  test("minhash LSH recovers the exact near-dup pairs with high recall") {
    val est = MinHashLsh.nearDuplicates(docs, "doc_id", "text", minEstJaccard = 0.5)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exactPairs.count(est.contains).toDouble / exactPairs.size
    assert(recall >= 0.9, s"recall $recall; found ${est.size} vs ${exactPairs.size} exact")
  }

  test("minhash estimate approximates true jaccard on implanted pairs") {
    val est = MinHashLsh.nearDuplicates(docs, "doc_id", "text", minEstJaccard = 0.5)
      .collect().map(r => r.getAs[Double]("est_jaccard"))
    assert(est.forall(e => e >= 0.5 && e <= 1.0))
  }

  test("simhash recovers the exact near-dup pairs") {
    val sh = SimHash.nearDuplicates(docs, "doc_id", "text", maxDist = 6, chunks = 8)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exactPairs.count(sh.contains).toDouble / exactPairs.size
    assert(recall >= 0.9, s"recall $recall")
  }

  test("simhash hamming of a doc with itself is zero") {
    val one = SimHash.simhashes(docs.limit(10), "doc_id", "text")
    val joined = one.alias("a").join(one.alias("b"), Seq("doc_id"))
      .select(bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("h"))
      .agg(max(col("h"))).head().getInt(0)
    assert(joined == 0)
  }
}
