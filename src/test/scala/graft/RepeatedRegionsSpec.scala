package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.text.Winnowing

/** Substring-level repeat detection (d20): planted cross-document repeats
  * are found with position accuracy bounded by the winnowing resolution,
  * unique text reports nothing, and within-document regions are disjoint. */
class RepeatedRegionsSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val K = 7; private val W = 4; private val Gap = 10

  private def regions(docs: Seq[(Long, String)]) =
    Winnowing.repeatedRegions(docs.toDF("doc_id", "text"), "doc_id", "text",
        k = K, w = W, gapMax = Gap, minFps = 2)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))

  // distinct filler so docs share nothing except what we plant (seeded RNG:
  // an arithmetic progression mod 26 is periodic, which makes every filler
  // a rotation of the same cycle — they'd genuinely share long substrings)
  private def noise(seed: Int, n: Int): String = {
    val r = new scala.util.Random(seed)
    (0 until n).map(_ => ('a' + r.nextInt(26)).toChar).mkString
  }

  test("a planted long shared substring is reported in both documents") {
    val shared = "the quick brown fox jumps over the lazy dog again and again"
    val a = noise('q', 80) + shared + noise('z', 80)
    val b = noise('m', 40) + shared + noise('k', 120)
    val got = regions(Seq((1L, a), (2L, b), (3L, noise('w', 260))))

    val inA = got.filter(_._1 == 1L)
    val inB = got.filter(_._1 == 2L)
    assert(inA.nonEmpty && inB.nonEmpty, s"planted repeat missed: ${got.toSeq}")
    assert(got.forall(_._1 != 3L), s"false positive in unique doc: ${got.toSeq}")

    // the reported span must cover the planted occurrence to within the
    // winnowing resolution (w+k-2 chars at each edge)
    val slack = W + K - 2
    val (aStart, aEnd) = (81, 80 + shared.length)
    val hit = inA.exists { case (_, s, e, _, _) =>
      s >= aStart - slack && s <= aStart + slack &&
        e >= aEnd - slack && e <= aEnd + slack }
    assert(hit, s"region off target: ${inA.toSeq} vs planted [$aStart,$aEnd]")
  }

  test("recall guarantee: every repeat of length >= gapMax+k is detected") {
    // plant shared substrings of several lengths at varying offsets; all of
    // length >= 17 (gapMax + k) must be found in both carriers
    val cases = Seq(17, 20, 30, 64)
    val docs = cases.zipWithIndex.flatMap { case (len, i) =>
      val s = ('A' + i).toChar.toString * 3 + noise(('c' + i).toChar, len - 3)
      Seq((i * 2L, noise(('d' + i).toChar, 30 + i * 7) + s + noise(('p' + i).toChar, 25)),
          (i * 2L + 1, s + noise(('t' + i).toChar, 40 + i * 3)))
    }
    val got = regions(docs)
    cases.indices.foreach { i =>
      assert(got.exists(_._1 == i * 2L) && got.exists(_._1 == i * 2L + 1),
        s"repeat of length ${cases(i)} missed: ${got.toSeq}")
    }
  }

  test("regions within a document are disjoint and well-formed") {
    val s1 = "first repeated block of text that is long enough to catch"
    val s2 = "second duplicated stretch also comfortably past threshold"
    val a = noise('a', 50) + s1 + noise('b', 60) + s2 + noise('c', 50)
    val b = s1 + noise('e', 90) + s2
    val got = regions(Seq((1L, a), (2L, b)))
    Seq(1L, 2L).foreach { id =>
      val rs = got.filter(_._1 == id).sortBy(_._2)
      assert(rs.length == 2, s"doc $id: expected 2 regions, got ${rs.toSeq}")
      assert(rs.forall { case (_, s, e, span, n) =>
        s >= 1 && e > s && span == e - s + 1 && n >= 2 }, rs.toSeq.toString)
      assert(rs.sliding(2).forall {
        case Array(x, y) => x._3 < y._2; case _ => true },
        s"overlapping regions in doc $id: ${rs.toSeq}")
    }
  }

  test("incremental: registry probe finds content only history contains") {
    val shared = "a block of prose that yesterday's crawl already contained verbatim"
    val oldDocs = Seq((1L, noise('a', 60) + shared + noise('b', 40)),
                      (2L, noise('c', 200)))
    val newDocs = Seq((10L, noise('d', 30) + shared + noise('e', 70)),
                      (11L, noise('f', 180)))
    val registry = Winnowing.fingerprintRows(
      oldDocs.toDF("doc_id", "text"), "doc_id", "text", K, W).select("fp")
    val (regions, _) = Winnowing.incrementalRepeatedRegions(
      newDocs.toDF("doc_id", "text"), "doc_id", "text", registry,
      K, W, Gap, minFps = 2)
    val got = regions.collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    // the repeat is OLD-vs-NEW only — no batch-internal pair exists, so a
    // hit proves the registry probe, not the within-batch path
    assert(got.exists(_._1 == 10L), s"cross-batch repeat missed: ${got.toSeq}")
    assert(got.forall(_._1 != 11L), s"false positive: ${got.toSeq}")
  }

  test("incremental equals the full rerun restricted to the new batch (sf0.001)") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"$sf/documents.parquet").select("doc_id", "text")
    val oldD = docs.filter(col("doc_id") % 2 === 0)
    val newD = docs.filter(col("doc_id") % 2 === 1)
    val registry = Winnowing.fingerprintRows(oldD, "doc_id", "text", K, W).select("fp")
    val (regions, delta) = Winnowing.incrementalRepeatedRegions(
      newD, "doc_id", "text", registry, K, W, Gap, minFps = 2)
    val full = Winnowing.repeatedRegions(docs, "doc_id", "text", K, W, Gap, minFps = 2)
      .filter(col("doc_id") % 2 === 1)
    assert(regions.count() > 0, "vacuous: no regions in the new batch")
    assert(regions.except(full).isEmpty && full.except(regions).isEmpty,
      "incremental diverged from the full rerun on the new ids")
    // the registry plus its delta is exactly the corpus's fingerprint set
    val allFps = Winnowing.fingerprintRows(docs, "doc_id", "text", K, W)
      .select("fp").distinct().count()
    assert(registry.distinct().count() + delta.count() == allFps,
      "registry delta is not the set of genuinely novel fingerprints")
  }

  test("corpus smoke: sf0.001 documents produce internally consistent regions") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").select("doc_id", "text")
    val got = Winnowing.repeatedRegions(docs, "doc_id", "text",
        k = K, w = W, gapMax = Gap, minFps = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))
    assert(got.nonEmpty, "synthetic corpus has planted dups; expected regions")
    assert(got.forall { case (_, s, e, span, n) =>
      s >= 1 && e > s && span == e - s + 1 && n >= 2 })
  }
}
