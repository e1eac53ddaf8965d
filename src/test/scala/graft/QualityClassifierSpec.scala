package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.NgramScoreFn
import graft.text.QualityClassifier

/** Hashed-n-gram quality scorer (d21): codegen'd scoring must match a
  * naive Scala reimplementation, handle degenerate text, and gate the
  * funnel without changing surviving rows. */
class QualityClassifierSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val model = QualityClassifier.seededModel(dim = 64, bias = 5L)

  /** Independent reimplementation (list ops, no shared loop). */
  private def naive(text: String): (Long, Int) = {
    val toks = text.trim.split("\\s+").filter(_.nonEmpty).toSeq
    val feats = toks ++ toks.sliding(2).collect { case Seq(a, b) => s"$a $b" }
    val score = model.bias + feats
      .map(f => model.weights((NgramScoreFn.md5Top60(f) % 64).toInt)).sum
    (score, feats.size)
  }

  test("codegen'd score equals the naive reimplementation") {
    val docs = Seq("the quick brown fox", "  padded   whitespace\ttabs ",
      "one", "repeated repeated repeated", "punct, and? mixed 123 tokens!")
    val got = docs.toDF("text")
      .select(QualityClassifier.scoreCol(col("text"), model).as("s"))
      .select(col("s.score"), col("s.n_feats"))
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(got.toSeq == docs.map(naive))
  }

  test("empty and all-whitespace text scores bias with zero features") {
    val got = Seq("", "   \t  ").toDF("text")
      .select(QualityClassifier.scoreCol(col("text"), model).as("s"))
      .select(col("s.score"), col("s.n_feats"))
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(got.forall(_ == (5L, 0)))
  }

  test("unigram-only model skips bigram features") {
    val uniModel = model.copy(bigrams = false)
    val got = Seq(Tuple1("a b c")).toDF("text")
      .select(QualityClassifier.scoreCol(col("text"), uniModel).as("s"))
      .select(col("s.n_feats")).as[Int].head()
    assert(got == 3)
  }

  test("gate keeps exactly the rows scored >= threshold") {
    val docs = (1 to 50).map(i => (i.toLong, s"synthetic document number $i with filler " + ("x" * (i % 7)))).toDF("doc_id", "text")
    val scored = QualityClassifier.scored(docs, "doc_id", "text", model, threshold = 0L)
    val kept = QualityClassifier.gate(docs, "text", model, threshold = 0L)
    val keptIds = kept.select("doc_id").as[Long].collect().toSet
    val expected = scored.filter(col("keep") === 1).select("doc_id").as[Long].collect().toSet
    assert(keptIds == expected)
    assert(keptIds.nonEmpty && keptIds.size < 50,
      s"degenerate gate (kept ${keptIds.size}/50) — threshold no longer splits")
  }

  test("scores are partitioning-invariant") {
    val docs = (1 to 200).map(i => (i.toLong, s"doc $i body " * (i % 5 + 1))).toDF("doc_id", "text")
    val one = QualityClassifier.scored(docs.coalesce(1), "doc_id", "text", model, 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val many = QualityClassifier.scored(docs.repartition(13), "doc_id", "text", model, 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(one == many)
  }
}
