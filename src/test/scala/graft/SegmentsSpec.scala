package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.Segments

/** C4-style segment dedup + boilerplate detection (d13/d14). */
class SegmentsSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val docs = Seq(
    (1L, "a b c d e f"),          // segs: "a b c", "d e f"
    (2L, "a b c x y z"),          // "a b c" duplicates doc 1's first seg
    (3L, "d e f a b c"),          // both segs are dups of earlier docs
    (4L, "x y z z y"),            // "x y z" dups doc 2; "z y" is a short tail
    (5L, ""),                     // empty doc must survive reconstruction
    (6L, "unique tail"))          // single short segment
    .toDF("doc_id", "text")

  test("segmentDedup keeps the global first occurrence and rebuilds in order") {
    val out = Segments.segmentDedup(docs, "doc_id", "text", segTokens = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((2L, 2L, "a b c d e f")))   // first doc keeps all
    assert(out(2L) == ((2L, 1L, "x y z")))         // lost "a b c" to doc 1
    assert(out(3L) == ((2L, 0L, "")))              // everything was seen before
    assert(out(4L) == ((2L, 1L, "z y")))           // lost "x y z" to doc 2
    assert(out(5L) == ((0L, 0L, "")))              // empty doc preserved
    assert(out(6L) == ((1L, 1L, "unique tail")))
    assert(out.size == 6)
  }

  test("within-document repeats also deduplicate to the first instance") {
    val d = Seq((1L, "p q r p q r p q r")).toDF("doc_id", "text")
    val out = Segments.segmentDedup(d, "doc_id", "text", segTokens = 3)
      .collect().head
    assert((out.getLong(1), out.getLong(2), out.getString(3)) == ((3L, 1L, "p q r")))
  }

  test("dedup is append-stable: new docs never steal an old doc's kept segment") {
    val grown = docs.union(Seq((7L, "a b c d e f")).toDF("doc_id", "text"))
    val before = Segments.segmentDedup(docs, "doc_id", "text", 3)
      .where(col("doc_id") <= 6)
    val after = Segments.segmentDedup(grown, "doc_id", "text", 3)
      .where(col("doc_id") <= 6)
    assert(before.except(after).isEmpty && after.except(before).isEmpty)
  }

  test("incremental dedup over two batches equals the full run on the union") {
    val batch1 = docs.where(col("doc_id") <= 3)
    val batch2 = docs.where(col("doc_id") > 3)
      .union(Seq((7L, "a b c fresh seg here")).toDF("doc_id", "text"))
    val (clean1, delta1) = Segments.incrementalSegmentDedup(
      batch1, "doc_id", "text", spark.emptyDataset[Array[Byte]].toDF("seg_fp"), 3)
    val (clean2, delta2) = Segments.incrementalSegmentDedup(
      batch2, "doc_id", "text", delta1, 3)
    val full = Segments.segmentDedup(batch1.union(batch2), "doc_id", "text", 3)
    val incremental = clean1.union(clean2)
    assert(incremental.except(full).isEmpty && full.except(incremental).isEmpty)
    // registry after both batches == full run's kept segments
    val registry = delta1.union(delta2)
    assert(registry.count() ==
      full.agg(sum(col("n_kept"))).head.getLong(0))
  }

  test("incremental probe scale shape: the digest registry is scanned in " +
       "place, never exchanged or distinct-ed") {
    // a parquet-backed registry (the streaming twins' real input) — an
    // in-memory local relation would not exercise the scan the gate pins
    val regDir = java.nio.file.Files.createTempDirectory("seg-reg").toString
    Segments.registryDelta(Segments.incrementalFlags(
        docs, "doc_id", "text",
        spark.emptyDataset[Array[Byte]].toDF("seg_fp"), 3))
      .write.mode("overwrite").parquet(regDir)
    val plan = Segments.incrementalFlags(
        docs, "doc_id", "text", spark.read.parquet(regDir), 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), plan)
    // the registry feeds exactly one operator chain: scan -> semi-join;
    // any Exchange/HashAggregate between the parquet scan and the join
    // means the probe re-acquired a per-drop registry-sized cost
    assert(plan.contains("FileScan parquet"), plan)
    val scanIdx = plan.linesIterator.indexWhere(_.contains("FileScan parquet"))
    val joinIdx = plan.linesIterator.indexWhere(_.contains("LeftSemi"))
    assert(joinIdx >= 0 && scanIdx > joinIdx,
      "registry scan must sit under the semi-join\n" + plan)
    val between = plan.linesIterator.slice(joinIdx, scanIdx + 1)
      .filter(l => l.contains(":-") || l.contains(":  ")).mkString("\n")
    assert(!between.contains("Exchange") && !between.contains("HashAggregate"),
      "the segment registry must never be shuffled/aggregated by the " +
        "probe\n" + plan)
  }

  test("boilerplate reports segments in >= minDocs distinct docs with counts") {
    val d = Seq(
      (1L, "n a v"), (2L, "n a v"), (3L, "n a v n a v"), (4L, "o n e"))
      .toDF("doc_id", "text")
    val out = Segments.boilerplate(d, "doc_id", "text", segTokens = 3, minDocs = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(("n a v", 3L, 4L))) // 3 docs, 4 occurrences
  }

  test("null text behaves like an empty document end to end") {
    val d = Seq((1L, "a b c"), (2L, null: String)).toDF("doc_id", "text")
    val out = Segments.segmentDedup(d, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((1L, 1L, "a b c")))
    assert(out(2L) == ((0L, 0L, "")))
    assert(Segments.boilerplate(d, "doc_id", "text", 3, 1).count() == 1)
  }

  test("segment derivation: fixed 3-token chunks with a short tail") {
    val segs = Segments.explodeSegments(
      Seq((1L, "  t1 t2  t3 t4 ")).toDF("doc_id", "text"), "doc_id", "text", 3)
      .orderBy("seg_idx").select("seg").as[String].collect()
    assert(segs.toSeq == Seq("t1 t2 t3", "t4"))
  }

  test("chunk-with-overlap: coverage, overlap width, short tail, stride=size") {
    val doc = (1L, (1 to 10).map(i => s"t$i").mkString(" ")) // 10 tokens
    val got = Segments.chunkWithOverlap(Seq(doc).toDF("doc_id", "text"),
        "doc_id", "text", size = 4, stride = 3)
      .collect().map(r => (r.getInt(1), r.getString(3))).sortBy(_._1)
    // starts 0,3,6,9 → 4 chunks; all size-4 except the 1-token tail
    assert(got.map(_._1).toSeq == Seq(0, 1, 2, 3))
    assert(got.map(_._2).toSeq == Seq(
      "t1 t2 t3 t4", "t4 t5 t6 t7", "t7 t8 t9 t10", "t10"))
    // every token is covered; consecutive chunks share size−stride tokens
    val toks = got.flatMap(_._2.split(" ")).toSet
    assert(toks == (1 to 10).map(i => s"t$i").toSet)
    // stride == size → a partition, no overlap, nothing lost
    val part = Segments.chunkWithOverlap(Seq(doc).toDF("doc_id", "text"),
        "doc_id", "text", size = 4, stride = 4)
      .collect().map(_.getString(3)).sortBy(identity)
    assert(part.flatMap(_.split(" ")).length == 10)
    // empty text → no chunks, no crash
    assert(Segments.chunkWithOverlap(Seq((2L, "  ")).toDF("doc_id", "text"),
      "doc_id", "text", size = 4, stride = 3).count() == 0)
  }

  test("segmentKeepCounts matches segmentDedup's counts (with and without carry)") {
    val full = Segments.segmentDedup(docs, "doc_id", "text", segTokens = 3)
      .select("doc_id", "n_segs", "n_kept")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val counts = Segments.segmentKeepCounts(docs, "doc_id", "text", segTokens = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(counts == full)
    // carried column rides through unchanged and grouping stays per-doc
    val tagged = docs.withColumn("src", concat(lit("s"), col("doc_id") % 2))
    val carried = Segments.segmentKeepCounts(tagged, "doc_id", "text",
        segTokens = 3, carryCols = Seq("src"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(carried.length == 6)
    assert(carried.forall { case (id, src, _, _) => src == s"s${id % 2}" })
    assert(carried.map { case (id, _, a, b) => (id, a, b) }.toSet == full)
  }

  test("dedup stays a two-exchange plan (segment window + doc rebuild)") {
    val plan = Segments.segmentDedup(docs, "doc_id", "text", 3)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 2, s"expected 2 hash exchanges, plan:\n$plan")
  }
}
