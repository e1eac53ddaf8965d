package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.CorpusOverlap

/** Dataset-level overlap (d17): exact pairwise source Jaccard and the
  * MinHash sketch estimator bound against it. */
class CorpusOverlapSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("exact jaccard on a hand-checkable corpus") {
    val docs = Seq(
      (1L, "a", "w x y z"),       // shingles: {w x y, x y z}
      (2L, "b", "w x y"),         // {w x y}
      (3L, "c", "p q r s")).toDF("doc_id", "src", "text") // {p q r, q r s}
    val out = CorpusOverlap.exactPairJaccard(docs, "src", "text", 3)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    // only (a,b) share anything: inter=1, sizes 2 and 1 → j = 1/2
    assert(out.keySet == Set(("a", "b")))
    assert(out(("a", "b")) == ((2L, 1L, 1L, 0.5)))
  }

  test("groups sharing nothing produce no row; identical groups give 1.0") {
    val docs = Seq(
      (1L, "a", "m n o p"), (2L, "b", "m n o p"), (3L, "c", "z z1 z2"))
      .toDF("doc_id", "src", "text")
    val out = CorpusOverlap.exactPairJaccard(docs, "src", "text", 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(5)))
    assert(out.toSeq == Seq(("a", "b", 1.0)))
  }

  test("minhash estimate tracks exact jaccard within 3 standard errors") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val numHashes = 256
    val exact = CorpusOverlap.exactPairJaccard(docs, "source", "text", 3)
      .select(col("grp_a"), col("grp_b"), col("jaccard"))
      .as[(String, String, Double)].collect()
      .map { case (a, b, j) => (a, b) -> j }.toMap
    val est = CorpusOverlap.sketchPairJaccard(docs, "source", "text", 3, numHashes)
      .as[(String, String, Double)].collect()
      .map { case (a, b, j) => (a, b) -> j }.toMap
    val tol = 3.0 / math.sqrt(numHashes.toDouble) // ≈ 0.19
    var checked = 0
    for ((pair, j) <- exact) {
      val e = est.getOrElse(pair, 0.0)
      assert(math.abs(e - j) <= tol, s"$pair exact=$j est=$e tol=$tol")
      checked += 1
    }
    assert(checked > 10, s"only $checked overlapping source pairs — corpus too disjoint to test")
    // pairs the exact path omits (zero overlap) must estimate near zero
    for ((pair, e) <- est if !exact.contains(pair))
      assert(e <= tol, s"$pair has no exact overlap but estimate $e")
  }

  test("sketch side stays one aggregation: signature rows == distinct groups") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = CorpusOverlap.sketchPairJaccard(docs, "source", "text", 3, 64)
      .queryExecution.executedPlan.toString
    // the estimator joins two |sources|-row signature sets; the corpus-
    // sized data passes through exactly one aggregate (partial+final)
    val aggs = "ObjectHashAggregate".r.findAllIn(plan).size
    assert(aggs >= 2 && aggs <= 4, s"unexpected aggregate count $aggs in:\n$plan")
  }
}
