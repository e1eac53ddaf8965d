package graft

import java.text.Normalizer

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.UnicodeNormalize

/** [[graft.functions.UnicodeNormalize]] — NFC/NFKC correctness, codegen vs
  * interpreted parity, null handling, and the SQL registration. */
class UnicodeNormalizeSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val decomposedE = "é"       // e + combining acute
  private val composedE = "é"          // é

  test("NFC composes combining sequences and counts fewer characters") {
    val out = Seq((1L, s"caf$decomposedE"), (2L, "plain ascii"))
      .toDF("id", "s")
      .select(col("id"), UnicodeNormalize.nfc(col("s")).as("n"),
        length(col("s")).as("lraw"), length(UnicodeNormalize.nfc(col("s"))).as("lnfc"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2), r.getInt(3)))).toMap

    assert(out(1L) == ((s"caf$composedE", 5, 4)))
    assert(out(2L) == (("plain ascii", 11, 11)))
  }

  test("NFKC folds compatibility forms NFC leaves alone") {
    val lig = "ﬁle"            // ﬁ ligature + "le"
    val wide = "１２"       // full-width 12
    val df = Seq((lig, wide)).toDF("a", "b")
      .select(UnicodeNormalize.nfc(col("a")).as("anfc"),
        UnicodeNormalize.nfkc(col("a")).as("ankfc"),
        UnicodeNormalize.nfkc(col("b")).as("bnkfc"))
      .collect().head
    assert(df.getString(0) == lig)      // NFC: ligature preserved
    assert(df.getString(1) == "file")   // NFKC: folded
    assert(df.getString(2) == "12")
  }

  test("interpreted eval matches codegen on random multi-plane strings") {
    val rnd = new scala.util.Random(0x6e6663L)
    val samples = (0 until 200).map { _ =>
      val n = rnd.nextInt(12)
      new String((0 until n).flatMap { _ =>
        rnd.nextInt(5) match {
          case 0 => Character.toChars(0x61 + rnd.nextInt(26))
          case 1 => Character.toChars(0x300 + rnd.nextInt(0x70))  // combining
          case 2 => Character.toChars(0xc0 + rnd.nextInt(0x100))  // latin-1/A
          case 3 => Character.toChars(0x1d400 + rnd.nextInt(0x80)) // SMP math
          case 4 => Character.toChars(0xfb00 + rnd.nextInt(7))    // ligatures
        }
      }.toArray)
    }
    val df = samples.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "s")
    for (codegen <- Seq("CODEGEN_ONLY", "NO_CODEGEN")) {
      spark.conf.set("spark.sql.codegen.factoryMode", codegen)
      try {
        val got = df.select(col("id"), UnicodeNormalize.nfkc(col("s"))).collect()
          .map(r => r.getLong(0) -> r.getString(1)).toMap
        samples.zipWithIndex.foreach { case (s, i) =>
          assert(got(i.toLong) == Normalizer.normalize(s, Normalizer.Form.NFKC),
            s"mismatch ($codegen) on ${s.map(c => f"\\u$c%04x" ).mkString}")
        }
      } finally spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("nulls pass through; invalid form fails at construction") {
    val out = Seq((1L, null: String), (2L, "x")).toDF("id", "s")
      .select(col("id"), UnicodeNormalize.nfc(col("s")).as("n")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(out(1L) == null && out(2L) == "x")
    intercept[IllegalArgumentException] {
      UnicodeNormalize.withForm(col("s"), "NOT_A_FORM")
    }
  }

  test("SQL surface: nfc_normalize / nfkc_normalize registered") {
    GraftExtensions.registerAll(spark)
    val r = spark.sql(
      s"SELECT nfc_normalize('$decomposedE') AS a, nfkc_normalize('ﬁ') AS b")
      .collect().head
    assert(r.getString(0) == composedE && r.getString(1) == "fi")
  }
}
