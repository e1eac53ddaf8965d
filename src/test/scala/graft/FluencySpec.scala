package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.Fluency

/** Scaled-integer bigram fluency (d19): hand-checked conditionals, edge
  * docs, and the repetitive-scores-high / soup-scores-low ordering. */
class FluencySpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("hand-checked conditional probabilities") {
    // corpus bigrams: (a b) x2, (b a) x1, (a c) x1
    // prefixes: a -> 3, b -> 1
    val docs = Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
    val out = Fluency.bigramFluency(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val S = Fluency.Scale
    // doc 1: bigrams (a b), (b a), (a b): scores 2S/3, S/1, 2S/3
    val d1 = (2 * S / 3 + S + 2 * S / 3) / 3
    // doc 2: (a c): score S/3
    assert(out(1L) == ((3L, d1)))
    assert(out(2L) == ((1L, S / 3)))
  }

  test("docs with fewer than two tokens score (0, 0)") {
    val docs = Seq((1L, "solo"), (2L, ""), (3L, null: String), (4L, "x y"))
      .toDF("doc_id", "text")
    val out = Fluency.bigramFluency(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(1L) == ((0L, 0L)) && out(2L) == ((0L, 0L)) && out(3L) == ((0L, 0L)))
    assert(out(4L) == ((1L, Fluency.Scale))) // unique bigram, unique prefix
    assert(out.size == 4)
  }

  test("corpus-typical transitions outscore rare continuations of the same prefix") {
    // background makes alpha -> beta the dominant continuation; doc 101
    // rides it, doc 102 takes rare continuations of the same prefix
    val bg = (1L to 5L).map(i => (i, "alpha beta"))
    val typical = (101L, "alpha beta alpha beta")
    val atypical = (102L, "alpha gamma alpha delta")
    val docs = (bg :+ typical :+ atypical).toDF("doc_id", "text")
    val out = Fluency.bigramFluency(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out(101L) > out(102L),
      s"typical ${out(101L)} should exceed atypical ${out(102L)}")
  }

  test("no interpreted-lambda filter below the bigram aggregations (d15 class)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = Fluency.bigramFluency(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    val badFilter = plan.linesIterator.exists(l =>
      l.trim.startsWith("+- Filter") && l.contains("lambdafunction"))
    assert(!badFilter, "inferred filter re-inlines interpreted lambdas:\n" + plan)
  }
}
