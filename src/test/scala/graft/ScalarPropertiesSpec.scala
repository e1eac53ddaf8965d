package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.scalars.Genomics

/** Property tests for the pure scalar functions (SURVEY.md §5's gap list):
  * generated inputs are evaluated in one Spark pass per property. */
class ScalarPropertiesSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def sample[A](g: Gen[A], n: Int = 300): Seq[A] =
    Iterator.continually(g.sample).flatten.take(n).toSeq

  private val dnaGen: Gen[String] =
    Gen.chooseNum(0, 40).flatMap(n => Gen.listOfN(n, Gen.oneOf('A', 'C', 'G', 'T')).map(_.mkString))

  private val messyChar: Gen[Char] =
    Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(' ', '\t', '-', '_', '.', '!', '#', '/'))
  private val messyGen: Gen[String] =
    Gen.listOf(messyChar).map(_.mkString.take(60))

  test("media decoders never throw on arbitrary bytes (fuzz property)") {
    import graft.multimodal.Multimodal
    val bytesGen: Gen[Array[Byte]] =
      Gen.chooseNum(0, 200).flatMap(n =>
        Gen.listOfN(n, Gen.chooseNum(-128, 127).map(_.toByte)).map(_.toArray))
    // bias half the samples toward plausible container magics so header
    // parsing code paths get past the first guard
    val riffGen: Gen[Array[Byte]] = bytesGen.map { b =>
      ("RIFF".getBytes("US-ASCII") ++ b).take(math.max(b.length, 4))
    }
    for (b <- sample(bytesGen, 200) ++ sample(riffGen, 200)) {
      Multimodal.ImaAdpcm.decode(1L, b)        // Option, never a throw
      Multimodal.CompressedAudio.decode(1L, b)
      Multimodal.CompressedAudio.fingerprint(1L, b)
      Multimodal.CompressedImage.decode(1L, b)
      Multimodal.CompressedImage.decodeTiles(1L, b, 4)
      Multimodal.CompressedImage.dhash(1L, b)
      Multimodal.MjpegAvi.decode(1L, b)        // Seq, never a throw
      Multimodal.PcmWav.decode(1L, b)
      Multimodal.Ppm.decode(1L, b)
    }
    // AVI-magic biased corpus: get past the RIFF/'AVI ' guard so the
    // chunk walk itself is fuzzed (random bytes essentially never spell
    // both magics — the gap that hid the ADPCM wrapped-length wedge)
    val aviGen: Gen[Array[Byte]] = bytesGen.map { b =>
      "RIFF".getBytes("US-ASCII") ++ b.take(4).padTo(4, 0.toByte) ++
        "AVI ".getBytes("US-ASCII") ++ b
    }
    for (b <- sample(aviGen, 200)) Multimodal.MjpegAvi.decode(1L, b)
    // same for WAVE: fuzz the ADPCM/G.711/PCM chunk walks past the magic
    val waveGen: Gen[Array[Byte]] = bytesGen.map { b =>
      "RIFF".getBytes("US-ASCII") ++ b.take(4).padTo(4, 0.toByte) ++
        "WAVE".getBytes("US-ASCII") ++ b
    }
    for (b <- sample(waveGen, 200)) {
      Multimodal.ImaAdpcm.decode(1L, b)
      Multimodal.CompressedAudio.decode(1L, b)
      Multimodal.PcmWav.decode(1L, b)
    }
  }

  test("IMA ADPCM round-trip invariants over generated streams") {
    import graft.multimodal.Multimodal.ImaAdpcm
    val cases = sample(Gen.zip(Gen.chooseNum(0L, 1000000L), Gen.chooseNum(1, 120)), 60)
    for ((seed, ns) <- cases) {
      val d = ImaAdpcm.decode(1L, ImaAdpcm.renderWav(seed, ns, 8000))
      assert(d.isDefined, s"seed=$seed ns=$ns failed to decode")
      assert(d.get.n_samples == ns.toLong)
      assert(d.get.min_pcm >= -32768 && d.get.max_pcm <= 32767)
      assert(d.get.min_pcm <= d.get.max_pcm)
      // sample 0 is the header predictor (0), so extrema bracket 0
      assert(d.get.min_pcm <= 0 && d.get.max_pcm >= 0)
    }
  }

  test("revComp is an involution on DNA strings") {
    val df = sample(dnaGen).toDF("s")
    val bad = df.filter(Genomics.revComp(Genomics.revComp(col("s"))) =!= col("s"))
    assert(bad.count() == 0)
  }

  test("revComp preserves length and alphabet") {
    val df = sample(dnaGen).toDF("s")
    val bad = df.filter(
      length(Genomics.revComp(col("s"))) =!= length(col("s")) ||
      !Genomics.revComp(col("s")).rlike("^[ACGT]*$"))
    assert(bad.count() == 0)
  }

  test("normalizeName is idempotent") {
    val df = sample(messyGen).toDF("s")
    val once  = Genomics.normalizeName(col("s"))
    val bad = df.filter(Genomics.normalizeName(once) =!= once)
    assert(bad.count() == 0)
  }

  test("normalizeName output has no whitespace, punctuation or edge dashes") {
    val df = sample(messyGen).toDF("s")
    val out = df.select(Genomics.normalizeName(col("s")).as("n"))
    val bad = out.filter(!col("n").rlike("^$|^[a-zA-Z0-9_]([a-zA-Z0-9_-]*[a-zA-Z0-9_])?$"))
    assert(bad.count() == 0, bad.collect().mkString(","))
  }

  test("compositeIndex drops empty second index") {
    val df = Seq(("ACGT", "GGTT"), ("ACGT", ""), ("ACGT", null)).toDF("i1", "i2")
    val got = df.select(Genomics.compositeIndex(col("i1"), col("i2")).as("c"))
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("ACGT+GGTT", "ACGT", "ACGT"))
  }

  test("seqrunDate parses YYMMDD prefixes and rejects junk") {
    val df = Seq("200101_M00001_0001_FC", "991231_X", "badprefix_1").toDF("id")
    val got = df.select(Genomics.seqrunDate(col("id")).cast("string").as("d"))
      .collect().map(r => Option(r.getString(0)))
    assert(got(0).contains("2020-01-01"))
    assert(got(1).contains("2099-12-31")) // Spark 'yy' maps into 2000-2099
    assert(got(2).isEmpty)
  }

  test("isEmail accepts shapes and rejects spaces") {
    val df = Seq("a@b.org", "no-at-sign", "sp ace@x.org", "x@y").toDF("e")
    val got = df.select(Genomics.isEmail(col("e")).as("ok")).collect().map(_.getBoolean(0))
    assert(got.toSeq == Seq(true, false, false, true))
  }

  test("groupByIndexLength buckets rows by combined index length") {
    val df = Seq(("A", "ATTACTCG", "AGGCTATA"), ("B", "TCCGGA", ""), ("C", "NNACGTNN", ""))
      .toDF("Sample_ID", "index", "index2")
    val got = graft.sources.SampleSheet.groupByIndexLength(df)
      .collect().map(r => r.getAs[String]("Sample_ID") -> r.getAs[Int]("idx_len")).toMap
    assert(got == Map("A" -> 16, "B" -> 6, "C" -> 4)) // N bases stripped
  }

  test("insertLength clamps at zero and strips commas") {
    val df = Seq("1,200", "100", "0", "130").toDF("f")
    val got = df.select(Genomics.insertLength(col("f")).as("l"))
      .collect().map(_.getInt(0)).toSeq
    assert(got == Seq(1080, 0, 0, 10))
  }
}
