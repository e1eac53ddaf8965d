package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.BpeEncode
import graft.text.Bpe

/** BPE trainer + encoder: distributed/local trainer equivalence, the
  * textbook merge example, encode round-trip, determinism, and
  * codegen/interpreted parity of the encode expression. */
class BpeSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("textbook merge sequence on a known corpus") {
    // classic example: {"low":5, "lower":2, "newest":6, "widest":3}
    val wc = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val m = Bpe.trainLocal(wc, numMerges = 4, minCount = 1)
    // est</w> dominates: (e,s)=9, then (es,t)=9, then (est,</w>)=9, (l,o)=7
    assert(m.merges == Seq(("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o")))
    assert(m.encodeWord("newest").toSeq == Seq("n", "e", "w", "est</w>"))
    assert(m.encodeWord("lowest").toSeq == Seq("lo", "w", "est</w>"))
  }

  test("distributed trainer equals the local reference on the same corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val wc = Bpe.wordCounts(docs, "text").as[(String, Long)].collect().toMap
    val local = Bpe.trainLocal(wc, numMerges = 20)
    val dist = Bpe.train(docs, "text", numMerges = 20)
    assert(dist.merges == local.merges)
  }

  test("trainAuto (local fast path) equals the distributed trainer") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val auto = Bpe.trainAuto(docs, "text", numMerges = 15)
    val dist = Bpe.train(docs, "text", numMerges = 15)
    assert(auto.merges == dist.merges)
  }

  test("training is deterministic across repartitionings") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val a = Bpe.train(docs, "text", numMerges = 10)
    val b = Bpe.train(docs.repartition(13), "text", numMerges = 10)
    assert(a.merges == b.merges)
  }

  test("encode round-trips: stripping </w> and joining reconstructs the words") {
    val docs = Seq((1L, "the quick brown fox"), (2L, "  padded   whitespace "),
      (3L, "")).toDF("doc_id", "text")
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val model = Bpe.train(corpus, "text", numMerges = 12)
    val enc = docs.select(col("doc_id"),
        BpeEncode.bpeEncode(col("text"), model).as("toks"))
      .as[(Long, Seq[String])].collect().toMap
    def decode(toks: Seq[String]): String =
      toks.mkString("").replace(Bpe.Eow, " ").trim
    assert(decode(enc(1L)) == "the quick brown fox")
    assert(decode(enc(2L)) == "padded whitespace")
    assert(enc(3L).isEmpty)
  }

  test("every encoded symbol is a char, a trained merge product, or eow-suffixed") {
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val model = Bpe.train(corpus, "text", numMerges = 16)
    val vocabFromMerges = model.merges.map { case (a, b) => a + b }.toSet
    val enc = corpus.limit(50).select(
        explode(BpeEncode.bpeEncode(col("text"), model)).as("t"))
      .as[String].collect()
    enc.foreach { t =>
      val core = t.stripSuffix(Bpe.Eow)
      assert(vocabFromMerges.contains(t) || t == Bpe.Eow ||
        core.length <= 1 || vocabFromMerges.exists(v => v == t || v == core) ||
        core.codePointCount(0, core.length) == 1,
        s"unexplained symbol '$t'")
    }
  }

  test("pairCounts matches a hand count and applies the tie rule") {
    val docs = Seq((1L, "ab ab ba")).toDF("doc_id", "text")
    val out = Bpe.pairCounts(docs, "text", k = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getInt(3)))
    // words: ab x2 (pairs (a,b),(b,</w>) each x2), ba x1 ((b,a),(a,</w>))
    assert(out.toSeq == Seq(
      ("a", "b", 2L, 1), ("b", "</w>", 2L, 2),
      ("a", "</w>", 1L, 3), ("b", "a", 1L, 4)))
  }

  test("token-id encoding: ids mirror the string encoding; unseen chars -> unkId") {
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val model = Bpe.train(corpus, "text", numMerges = 12)
    assert(model.alphabet.nonEmpty)
    assert(model.vocabulary.size == model.alphabet.size + 12)
    // trainers agree on the alphabet too
    val wc = Bpe.wordCounts(corpus, "text").as[(String, Long)].collect().toMap
    assert(Bpe.trainLocal(wc, 12).alphabet.sorted == model.alphabet.sorted)
    val docs = Seq((1L, "the table stream"), (2L, "ünseen glyph"))
      .toDF("doc_id", "text")
    val rows = docs.select(col("doc_id"),
        BpeEncode.bpeEncode(col("text"), model).as("toks"),
        BpeEncode.bpeEncodeIds(col("text"), model).as("ids"))
      .as[(Long, Seq[String], Seq[Int])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    for ((_, (toks, ids)) <- rows) {
      assert(toks.length == ids.length)
      toks.zip(ids).foreach { case (t, id) =>
        assert(id == model.tokenIds.getOrElse(t, model.unkId))
        assert(id >= 0 && id <= model.unkId)
      }
    }
    // 'ü' never appears in the corpus -> its symbol must be unk
    assert(rows(2L)._1.zip(rows(2L)._2)
      .exists { case (t, id) => t.contains("ü") && id == model.unkId })
    // in-alphabet text maps every symbol to a real vocab id
    assert(rows(1L)._2.forall(_ < model.unkId))
  }

  test("encode expression: interpreted eval matches codegen") {
    val model = Bpe.Model(Seq(("a", "b"), ("ab", "</w>")))
    val df = Seq((1L, "ab abc a b"), (2L, null: String)).toDF("id", "s")
    val expect = Map(1L -> Seq("ab</w>", "ab", "c", "</w>", "a", "</w>", "b", "</w>"),
      2L -> null)
    for (mode <- Seq("CODEGEN_ONLY", "NO_CODEGEN")) {
      spark.conf.set("spark.sql.codegen.factoryMode", mode)
      try {
        val got = df.select(col("id"), BpeEncode.bpeEncode(col("s"), model).as("e"))
          .collect().map(r => r.getLong(0) ->
            (if (r.isNullAt(1)) null else r.getSeq[String](1))).toMap
        assert(got(1L) == expect(1L), s"mode=$mode")
        assert(got(2L) == null)
      } finally spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }
}
