package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.PolyHash.polyHash
import graft.text.TextMetrics

class PolyHashSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("matches a reference implementation on scala side") {
    def ref(s: String, base: Long): Long =
      s.getBytes("UTF-8").foldLeft(0L)((h, b) => h * base + (b & 0xffL))
    val inputs = Seq("", "a", "hello world", "ACGT" * 20, "naïve ünïcode")
    val got = inputs.toDF("s").select(polyHash(col("s")).as("h"))
      .collect().map(_.getLong(0))
    inputs.zip(got).foreach { case (s, h) =>
      assert(h == ref(s, graft.functions.PolyHash.DefaultBase), s)
    }
  }

  test("codegen and interpreted paths agree") {
    val df = Tables(spark, sf).documents.select(polyHash(col("text")).as("h"))
    val a = df.collect().map(_.getLong(0)).toSeq
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val b = df.collect().map(_.getLong(0)).toSeq
      assert(a == b)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("rolling fingerprint is stable under distant edits, changes on local edits") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val df = Seq(
      ("orig", base),
      ("tail-edit", base + " omega"),          // min 4-shingle likely unchanged
      ("scrambled", "zzz qqq vvv www xxx yyy uuu ttt sss rrr"))
      .toDF("tag", "text")
      .withColumn("toks", TextMetrics.tokens(col("text")))
      .select(col("tag"), TextMetrics.rollingFingerprint(col("toks")).as("fp"))
    val m = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("orig") != m("scrambled"))
    // identical prefix shingles → the min over a superset can only go lower
    assert(m("tail-edit") <= m("orig"))
  }
}
