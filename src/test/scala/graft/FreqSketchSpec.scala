package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.FreqSketch.freqSketch
import graft.text.Segments

/** Misra-Gries frequent items: exactness under capacity, the heavy-hitter
  * guarantee against the exact d14 census, merge safety across
  * partitionings, and skew-bounded buffers. */
class FreqSketchSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def summarize(df: org.apache.spark.sql.DataFrame, col0: String,
                        cap: Int): Map[String, Long] =
    df.agg(freqSketch(col(col0), cap).as("s"))
      .select(explode(col("s")).as("e"))
      .select(col("e.item"), col("e.count"))
      .as[(String, Long)].collect().toMap

  test("cardinality <= capacity: counts are exact") {
    val df = (Seq.fill(7)("a") ++ Seq.fill(4)("b") ++ Seq.fill(2)("c"))
      .toDF("x").repartition(5)
    assert(summarize(df, "x", 8) == Map("a" -> 7L, "b" -> 4L, "c" -> 2L))
  }

  test("heavy-hitter guarantee vs the exact segment census (d14's scale path)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val segs = Segments.explodeSegments(docs, "doc_id", "text", 3)
      .where(col("seg").isNotNull)
    val n = segs.count()
    val cap = 64
    val bound = n / (cap + 1) // max undercount, and the must-appear cutoff
    val exact = segs.groupBy("seg").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    for (parts <- Seq(1, 7, 32)) {
      val got = summarize(segs.repartition(parts), "seg", cap)
      assert(got.size <= cap)
      for ((item, c) <- got) {
        val truth = exact.getOrElse(item, 0L)
        assert(c <= truth, s"overcount for '$item': $c > $truth (parts=$parts)")
        assert(c >= truth - bound, s"undercount beyond bound for '$item' (parts=$parts)")
      }
      for ((item, truth) <- exact if truth > bound)
        assert(got.contains(item),
          s"heavy hitter '$item' (count $truth > $bound) missing at parts=$parts")
    }
  }

  test("pathological skew: one hot key among a million-cardinality tail") {
    val df = spark.range(200000).select(
      when(col("id") % 4 === 0, lit("HOT"))
        .otherwise(concat(lit("tail_"), col("id"))).as("x"))
    val got = summarize(df, "x", 16)
    assert(got.size <= 16)
    // hot key: truth 50k of 200k, bound 200k/17 ≈ 11.7k → must survive
    assert(got.contains("HOT"), s"hot key evicted: $got")
    assert(got("HOT") >= 50000L - 200000L / 17 && got("HOT") <= 50000L)
  }

  test("grouped usage: one summary per group, nulls ignored") {
    val df = Seq(("g1", "a"), ("g1", "a"), ("g1", null), ("g2", "b"))
      .toDF("g", "x")
    val out = df.groupBy("g").agg(freqSketch(col("x"), 4).as("s"))
      .select(col("g"), expr("transform(s, e -> e.item)").as("items"),
        expr("transform(s, e -> e.count)").as("counts"))
      .as[(String, Seq[String], Seq[Long])].collect()
      .map { case (g, i, c) => g -> i.zip(c) }.toMap
    assert(out("g1") == Seq(("a", 2L)))
    assert(out("g2") == Seq(("b", 1L)))
  }
}
