package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.Winnowing

/** The native WinnowFps expression is bit-identical to the declarative
  * HOF formulation it replaces — positions, hex strings, row counts —
  * on real corpus text and on adversarial inputs (ties, multi-byte
  * UTF-8, short strings). */
class WinnowFpsSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def assertIdentical(df: org.apache.spark.sql.DataFrame): Unit = {
    val fast = Winnowing.fingerprintRows(df, "doc_id", "text")
      .orderBy("doc_id", "pos")
    val ref = Winnowing.fingerprintRowsReference(df, "doc_id", "text")
      .orderBy("doc_id", "pos")
    val f = fast.collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    val g = ref.collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    assert(f.length == g.length, s"row counts differ: ${f.length} vs ${g.length}")
    assert(f.sameElements(g),
      f.zip(g).find { case (a, b) => a != b }.toString)
  }

  test("native == declarative on the sf0.001 documents corpus") {
    assertIdentical(spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text"))
  }

  test("native == declarative on adversarial strings") {
    val docs = Seq(
      (1L, "aaaaaaaaaaaaaaaaaaaaaaaa"),              // all k-grams tie
      (2L, "ababababababababababab"),                // period-2 ties
      (3L, "çéîøü日本語テキストの長い文字列です漢字かな混じり"), // multi-byte UTF-8
      (4L, "short"),                                 // < k chars
      (5L, "exactly7!"),                             // barely >= k, < k+w-1
      (6L, ""),                                      // empty
      (7L, "the quick brown fox jumps over the lazy dog and keeps running"),
      (8L, "x" * 2000)).toDF("doc_id", "text")       // long degenerate
    assertIdentical(docs)
  }

  test("native == declarative on random ASCII, property-style") {
    val rnd = new scala.util.Random(42)
    val docs = (1 to 60).map { i =>
      val len = rnd.nextInt(120)
      (i.toLong, (0 until len).map(_ => (' ' + rnd.nextInt(94)).toChar).mkString)
    }.toDF("doc_id", "text")
    assertIdentical(docs)
  }

  test("native == declarative on random multi-byte unicode, property-style") {
    val rnd = new scala.util.Random(7)
    // alphabet mixing 1-, 2-, 3-, and 4-byte UTF-8 encodings (🎉 is a
    // surrogate pair in Java chars), small so window ties occur across
    // code-point widths
    val cps = "ab é日🎉".codePoints().toArray
    val docs = (1 to 60).map { i =>
      val len = rnd.nextInt(80)
      val sb = new java.lang.StringBuilder
      (0 until len).foreach(_ => sb.appendCodePoint(cps(rnd.nextInt(cps.length))))
      (i.toLong, sb.toString)
    }.toDF("doc_id", "text")
    assertIdentical(docs)
  }
}
