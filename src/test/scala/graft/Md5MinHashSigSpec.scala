package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.{MinHashLsh, Shingles}

/** The fused one-pass md5 minhash signature must equal the exploded
  * `explodeShingles → md5BaseHash → MinHashSig` formulation bit-for-bit —
  * including the <n-token absent-row rule, whitespace edge cases, unicode
  * text, and duplicate shingles (minima idempotence). */
class Md5MinHashSigSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def refSig(df: org.apache.spark.sql.DataFrame, n: Int,
                     numHashes: Int, seed: Long) =
    Shingles.explodeShingles(df, "id", "text", n)
      .groupBy(col("id"))
      .agg(graft.functions.MinHashSig
        .minHashSig(MinHashLsh.md5BaseHash(col("shingle")), numHashes, seed)
        .as("sig"))

  test("fused signature equals the exploded formulation on adversarial text") {
    val rnd = new scala.util.Random(99)
    val words = Vector("alpha", "beta", "gamma", "δelta", "ε", "zzz", "a",
      "múlti", "字符", "x1", "-", "...")
    val docs = (0L until 300L).map { i =>
      val nw = rnd.nextInt(12) // 0..11 tokens — includes < n cases
      val toks = Seq.fill(nw)(words(rnd.nextInt(words.length)))
      // adversarial whitespace: tabs, newlines, runs, leading/trailing
      val seps = Seq(" ", "  ", "\t", "\n", " \t ")
      val body = toks.mkString(seps(rnd.nextInt(seps.length)))
      val text = (if (i % 3 == 0) "  " else "") + body +
        (if (i % 4 == 0) "\n\t" else "")
      (i, text)
    } :+ ((300L, "")) :+ ((301L, " \t\n ")) :+
      ((302L, "dup dup dup dup dup dup")) // duplicate shingles
    val df = docs.toDF("id", "text")
    for ((n, k, seed) <- Seq((3, 16, 42L), (2, 8, 7L))) {
      val got = MinHashLsh.signaturesMd5(df, "id", "text",
          MinHashLsh.Params(shingleN = n, numHashes = k, bands = k,
            seed = seed))
        .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).sortBy(_._1)
      val ref = refSig(df, n, k, seed)
        .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).sortBy(_._1)
      assert(got.toSeq == ref.toSeq, s"n=$n k=$k seed=$seed")
      // the <n-token rule must actually bind in this fixture
      assert(got.length < docs.length, "no short docs exercised the null rule")
    }
  }
}
