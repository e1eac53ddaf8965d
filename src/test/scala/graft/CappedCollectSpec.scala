package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.CappedCollect.cappedCollect

/** Contract tests for the memory-bounded posting-list collector. */
class CappedCollectSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("groups at or below the cap collect exactly (vs collect_list)") {
    val df = (1 to 1000).map(i => (i % 97, i.toLong)).toDF("k", "v")
    val got = df.groupBy("k").agg(cappedCollect(col("v"), 64).as("ids"))
      .select(col("k"), array_sort(col("ids")).as("ids"))
    val want = df.groupBy("k").agg(collect_list(col("v")).as("ids"))
      .select(col("k"), array_sort(col("ids")).as("ids"))
    assert(got.collect().map(r => (r.getInt(0), r.getSeq[Long](1))).sortBy(_._1)
      .sameElements(want.collect().map(r => (r.getInt(0), r.getSeq[Long](1))).sortBy(_._1)))
  }

  test("over-cap groups saturate at cap+1 — detectable and memory-bounded") {
    // one hot key with 100k values, cap 8: buffer must never hold more
    // than 9 elements (collect_list would hold 100k)
    val df = (1 to 100000).map(i => (1, i.toLong)).toDF("k", "v")
      .repartition(8)
    val out = df.groupBy("k").agg(cappedCollect(col("v"), 8).as("ids"))
      .select(size(col("ids"))).as[Int].collect()
    assert(out.sameElements(Array(9)))
  }

  test("struct payloads survive serialize/merge across a wide shuffle") {
    val df = (1 to 500).map(i => (i % 7, i.toLong, s"doc$i")).toDF("k", "v", "s")
      .repartition(16)
    val got = df.groupBy("k")
      .agg(cappedCollect(struct(col("v"), col("s")), 200).as("ids"))
      .select(col("k"), size(col("ids")).as("n"))
      .as[(Int, Int)].collect().toMap
    val want = (0 until 7).map(k => k -> (1 to 500).count(_ % 7 == k)).toMap
    assert(got == want)
  }

  test("null values are skipped, not collected") {
    val df = Seq((1, Some(1L)), (1, None), (1, Some(2L))).toDF("k", "v")
    val got = df.groupBy("k").agg(cappedCollect(col("v"), 10).as("ids"))
      .select(array_sort(col("ids"))).as[Seq[Long]].collect()
    assert(got.head == Seq(1L, 2L))
  }
}
