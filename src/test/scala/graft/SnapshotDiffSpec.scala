package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Eav, SnapshotDiff}

class SnapshotDiffSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("snapshot diff tags added/removed/changed/unchanged") {
    val prev = Seq(("a.bin", 100L), ("b.bin", 200L), ("c.bin", 300L))
      .toDF("path", "size")
    val curr = Seq(("a.bin", 100L), ("b.bin", 250L), ("d.bin", 50L))
      .toDF("path", "size")
    val d = SnapshotDiff.diff(prev, curr, Seq("path"), Seq("size"))
      .collect().map(r => r.getAs[String]("path") -> r.getAs[String]("change")).toMap
    assert(d == Map("a.bin" -> "unchanged", "b.bin" -> "changed",
      "c.bin" -> "removed", "d.bin" -> "added"))
  }

  test("EAV melt/pivot round-trips random wide tables") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 200).map { i =>
      (i.toLong,
        if (rnd.nextBoolean()) rnd.alphanumeric.take(6).mkString else null,
        rnd.nextInt(1000).toString,
        if (rnd.nextInt(4) == 0) null else rnd.alphanumeric.take(3).mkString)
    }
    val wide = rows.toDF("id", "c1", "c2", "c3")
    val attrs = Seq("c1", "c2", "c3")
    val long = Eav.melt(wide, Seq("id"), attrs)
    // nulls are dropped on melt (the reference's empty-value rule)
    val expectedLongRows = rows.map(r =>
      Seq(r._2, r._3, r._4).count(_ != null)).sum
    assert(long.count() == expectedLongRows)
    val back = Eav.pivot(long, Seq("id"), attrs)
    val orig = wide.collect().map(r => r.getLong(0) ->
      ((Option(r.getString(1)), Option(r.getString(2)), Option(r.getString(3))))).toMap
    back.collect().foreach { r =>
      val (c1, c2, c3) = orig(r.getLong(0))
      assert(Option(r.getString(1)) == c1)
      assert(Option(r.getString(2)) == c2)
      assert(Option(r.getString(3)) == c3)
    }
  }
}
