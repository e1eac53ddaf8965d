package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.LangId

/** The native TrigramLangScores classification is identical to the
  * join-based formulation — lang_id, best_score, n_trigrams — on corpus
  * text and adversarial inputs (accents, supplementary-plane code points,
  * empty/short strings). */
class LangIdNativeSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def assertIdentical(df: org.apache.spark.sql.DataFrame): Unit = {
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getInt(3)))
    val native = rows(LangId.classifyNative(df, "doc_id", "text"))
    val joined = rows(LangId.classify(df, "doc_id", "text"))
    assert(native.length == joined.length,
      s"row counts differ: ${native.length} vs ${joined.length}")
    assert(native.sameElements(joined),
      native.zip(joined).find { case (a, b) => a != b }.toString)
  }

  test("native == join-based on the sf0.001 documents corpus") {
    assertIdentical(spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text"))
  }

  test("native == join-based on adversarial strings") {
    assertIdentical(Seq(
      (1L, "the cat sat on the mat and the dog is in the house"),
      (2L, "el perro que vive en la casa de los vecinos"),
      (3L, "ÇÉÎØÜ mixed CASE und die Straße"),          // case + accents
      (4L, "🎉🎊 emoji 😀 der und die das"),              // supplementary plane
      (5L, ""), (6L, "ab"), (7L, "x"),                   // empty / sub-trigram
      (8L, "não ção ão_ explícit pt triggers"),
      (9L, "    "), (10L, "multi   space   runs")).toDF("doc_id", "text"))
  }

  test("native == join-based on random multi-byte unicode, property-style") {
    val rnd = new scala.util.Random(11)
    val cps = "the der le el il o de é日🎉 _".codePoints().toArray
    val docs = (1 to 60).map { i =>
      val len = rnd.nextInt(100)
      val sb = new java.lang.StringBuilder
      (0 until len).foreach(_ => sb.appendCodePoint(cps(rnd.nextInt(cps.length))))
      (i.toLong, sb.toString)
    }.toDF("doc_id", "text")
    assertIdentical(docs)
  }

  test("native path is a shuffle-free projection") {
    val df = Seq((1L, "the quick brown fox")).toDF("doc_id", "text")
    val p = LangId.classifyNative(df, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange") && !p.contains("Generate"),
      "native langid must not shuffle or generate\n" + p)
  }
}
