package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Sampling, Sessionize}
import graft.text.{LangId, Redaction, Relevance, Winnowing}

/** Round-5 operators: winnowing fingerprints, trigram language-ID,
  * integer tf-idf, PII redaction, batch sessionization, exact stratified
  * sampling. */
class NlpSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  // ---------------------------------------------------------------- winnow

  private val K = 7
  private val W = 4

  test("winnowing: every window of W consecutive k-grams contains a selected position") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "aaaaaaaaaaaaaaaaaaaa"), // degenerate: all k-grams identical
      (3L, "abcdefghij")).toDF("doc_id", "text")
    val fps = Winnowing.fingerprintRows(docs, "doc_id", "text", K, W)
      .collect().map(r => (r.getLong(0), r.getInt(1))).groupBy(_._1)
      .map { case (id, rs) => id -> rs.map(_._2).toSet }
    for ((id, text) <- Seq((1L, "the quick brown fox jumps over the lazy dog"),
                           (2L, "aaaaaaaaaaaaaaaaaaaa"), (3L, "abcdefghij"))) {
      val m = text.length - K + 1
      val sel = fps.getOrElse(id, Set.empty)
      for (j <- 1 to m - W + 1)
        assert((j until j + W).exists(sel.contains),
          s"doc $id window $j has no fingerprint")
    }
  }

  test("winnowing guarantee: docs sharing a substring of length >= K+W-1 share a fingerprint") {
    val shared = "zqxwvutsrqponml" // length 15 >= 10, rare characters
    val docs = Seq(
      (1L, s"first document prefix $shared and unrelated tail here"),
      (2L, s"completely different start $shared other ending text")).toDF("doc_id", "text")
    val fps = Winnowing.fingerprintRows(docs, "doc_id", "text", K, W)
    val a = fps.filter(col("doc_id") === 1).select("fp").as[String].collect().toSet
    val b = fps.filter(col("doc_id") === 2).select("fp").as[String].collect().toSet
    assert(a.intersect(b).nonEmpty, "no shared fingerprint for a 15-char shared substring")
  }

  test("winnowing: selected hash equals md5-prefix of the k-gram at its position") {
    val text = "the quick brown fox jumps"
    val fps = Winnowing.fingerprintRows(Seq((1L, text)).toDF("doc_id", "text"),
      "doc_id", "text", K, W).collect()
    assert(fps.nonEmpty)
    for (r <- fps) {
      val pos = r.getInt(1)
      val gram = text.substring(pos - 1, pos - 1 + K)
      val expect = java.security.MessageDigest.getInstance("MD5")
        .digest(gram.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
      assert(r.getString(2) == expect, s"fp mismatch at pos $pos")
    }
  }

  test("winnowing: short documents yield no fingerprints, not a crash") {
    val docs = Seq((1L, ""), (2L, "abc"), (3L, "abcdefg"), (4L, "abcdefgh"))
      .toDF("doc_id", "text")
    // len 7 => 1 k-gram < W windows; len 8 => 2 k-grams < W
    assert(Winnowing.fingerprintRows(docs, "doc_id", "text", K, W).count() == 0)
  }

  test("winnowing pair generator finds the planted near-dup and is shuffle-sane") {
    val shared = "the identical plagiarised passage appears verbatim in both documents"
    val docs = Seq(
      (1L, s"intro alpha $shared closing remarks one"),
      (2L, s"different beginning $shared and another tail"),
      (3L, "wholly unrelated text with nothing in common at all today")).toDF("doc_id", "text")
    val pairs = Winnowing.sharedFingerprintPairs(docs, "doc_id", "text", K, W, minShared = 2)
      .collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
  }

  test("winnowing fingerprintRows is a shuffle-free projection") {
    val docs = Seq((1L, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text")
    val p = Winnowing.fingerprintRows(docs, "doc_id", "text", K, W)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), "winnowing must not shuffle\n" + p)
  }

  // ---------------------------------------------------------------- langid

  test("trigram langid classifies characteristic sentences") {
    val docs = Seq(
      (1L, "the cat sat on the mat and the dog is in the house"),
      (2L, "el perro que vive en la casa de los vecinos"),
      (3L, "der hund und die katze sind in das haus gegangen"),
      (4L, "le chien est dans les maisons des voisins et le chat"),
      (5L, "il cane che vive nella casa per i vicini"),
      (6L, "o cachorro que vive na casa dos vizinhos com uma bola")).toDF("doc_id", "text")
    val got = LangId.classify(docs, "doc_id", "text")
      .select("doc_id", "lang_id").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "en", 2L -> "es", 3L -> "de", 4L -> "fr", 5L -> "it", 6L -> "pt"))
  }

  test("trigram langid: no profile hits => und; ties break alphabetically") {
    val docs = Seq((1L, "xxxx yyyy zzzz"), (2L, "")).toDF("doc_id", "text")
    val rows = LangId.classify(docs, "doc_id", "text").collect()
    // empty text has no trigram and is dropped (mirrors the oracle's UNNEST)
    assert(rows.map(_.getLong(0)).toSet == Set(1L))
    assert(rows.head.getString(1) == "und")
    assert(rows.head.getLong(2) == 0L)
  }

  test("langid profile has no duplicate (lang, trigram) and only 3-char trigrams") {
    val keys = LangId.profiles.map(p => (p._1, p._2))
    assert(keys.distinct.size == keys.size)
    assert(LangId.profiles.forall(_._2.length == 3),
      LangId.profiles.filter(_._2.length != 3).mkString(","))
  }

  // ------------------------------------------------------------- relevance

  test("tfidf: rarer term outranks commoner term at equal tf; ranks deterministic") {
    val docs = Seq(
      (1L, "apple banana apple cherry"),
      (2L, "banana banana date"),
      (3L, "banana elderberry fig")).toDF("doc_id", "text")
    // df: banana=3, apple=1, cherry=1, date=1, elderberry=1, fig=1; N=3
    val top = Relevance.topTerms(docs, "doc_id", "text", k = 2)
    val d1 = top.filter(col("doc_id") === 1).orderBy("rnk")
      .select("term").as[String].collect().toSeq
    // doc1: apple tf=2 df=1 score=2*S*3; cherry tf=1 df=1; banana tf=1 df=3
    assert(d1 == Seq("apple", "cherry"))
    val scores = top.filter(col("doc_id") === 1).orderBy("rnk")
      .select("score").as[Long].collect().toSeq
    assert(scores == Seq(2L * 1000000 * 3, 1L * 1000000 * 3))
  }

  test("vocabulary: counts, doc-frequencies, and rank order") {
    val docs = Seq(
      (1L, "a b a"), (2L, "b c"), (3L, "b a")).toDF("doc_id", "text")
    val v = Relevance.vocabulary(docs, "doc_id", "text", k = 10)
      .select("term", "n", "n_docs", "rank")
      .as[(String, Long, Long, Int)].collect().sortBy(_._4)
    // b: n=3 docs=3; a: n=3 docs=2; c: n=1  — tie on n breaks by term asc
    assert(v.toSeq == Seq(("a", 3L, 2L, 1), ("b", 3L, 3L, 2), ("c", 1L, 1L, 3)))
  }

  // ------------------------------------------------------------- redaction

  test("redaction replaces url, email, phone, ip and counts without double counting") {
    val s = "mail a.b+c@test.org or https://x.io/p?q=1 call 020 7946 0958 x +1 (555) 123-4567 from 10.0.0.1"
    val df = Seq(s).toDF("t").select(
      Redaction.redact(col("t")).as("clean"),
      Redaction.countMatches(col("t"), "email").as("ne"),
      Redaction.totalHits(col("t")).as("np"))
    val r = df.collect().head
    val clean = r.getString(0)
    assert(clean.contains("[EMAIL]") && clean.contains("[URL]") &&
      clean.contains("[PHONE]") && clean.contains("[IP]"), clean)
    assert(!clean.contains("test.org") && !clean.contains("10.0.0.1"), clean)
    assert(r.getInt(1) == 1)
    assert(r.getInt(2) >= 4, s"expected >=4 hits, got ${r.getInt(2)} in: $clean")
  }

  test("redaction: email userinfo inside a URL is not double-counted") {
    val s = "see https://user@host.example.com/path now"
    val df = Seq(s).toDF("t").select(
      Redaction.redact(col("t")).as("clean"),
      Redaction.totalHits(col("t")).as("np"))
    val r = df.collect().head
    assert(r.getString(0) == "see [URL] now", r.getString(0))
    assert(r.getInt(1) == 1)
  }

  // ------------------------------------------------------------ sessionize

  test("sessionize: gap strictly greater than threshold starts a new session") {
    val gap = 100L
    val events = Seq(
      (1L, 0L, 10L), (1L, 50L, 11L), (1L, 150L, 12L),   // +100 == gap: same session
      (1L, 251L, 13L),                                   // +101 > gap: new session
      (2L, 0L, 20L)).toDF("user_id", "us", "event_id")
    val got = Sessionize.sessions(events, "user_id", "us", "event_id", gap)
      .select("user_id", "session_idx", "n_events", "start_us", "end_us", "dur_us")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      (1L, 0L, 3L, 0L, 150L, 150L),
      (1L, 1L, 1L, 251L, 251L, 0L),
      (2L, 0L, 1L, 0L, 0L, 0L)))
  }

  test("sessionize shares one exchange between both windows and the rollup") {
    val events = Seq((1L, 0L, 1L)).toDF("user_id", "us", "event_id")
    val p = Sessionize.sessions(events, "user_id", "us", "event_id", 10L)
      .queryExecution.executedPlan.toString
    assert(p.split("Exchange").length - 1 <= 2,
      "sessionize should not re-shuffle per window\n" + p)
  }

  // ------------------------------------------------------------ stratified

  test("stratified sampling: exact ceil quota per stratum, stable under append") {
    val docs = (1 to 25).map(i => (i.toLong, if (i <= 20) "a" else "b"))
      .toDF("doc_id", "stratum")
    val picked = Sampling.stratifiedExact(docs, Seq("stratum"), col("doc_id"), 1, 10)
    val byStratum = picked.groupBy("stratum").count()
      .as[(String, Long)].collect().toMap
    assert(byStratum == Map("a" -> 2L, "b" -> 1L)) // ceil(20/10)=2, ceil(5/10)=1
    // appending one row to stratum b changes b's quota to ceil(6/10)=1:
    // the selection within b may swap but stratum a is untouched
    val more = docs.union(Seq((26L, "b")).toDF("doc_id", "stratum"))
    val p2 = Sampling.stratifiedExact(more, Seq("stratum"), col("doc_id"), 1, 10)
    val aBefore = picked.filter(col("stratum") === "a").select("doc_id")
      .as[Long].collect().toSet
    val aAfter = p2.filter(col("stratum") === "a").select("doc_id")
      .as[Long].collect().toSet
    assert(aBefore == aAfter, "append to stratum b must not reshuffle stratum a")
  }
}
