package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.GlobalOrder

/** [[GlobalOrder]] must be value-identical to the no-partition window
  * formulations it replaces, for every N-vs-tiles shape. */
class GlobalOrderSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("withGlobalRank equals a global row_number") {
    val df = spark.read.parquet(s"$sf/supplier.parquet")
    val want = df.withColumn("rk",
      row_number().over(Window.orderBy(col("s_suppkey"))).cast("long"))
    val got = GlobalOrder.withGlobalRank(df, Seq(col("s_suppkey")), "rk")
    assert(got.select("s_suppkey", "rk").except(want.select("s_suppkey", "rk")).count() == 0)
    assert(got.count() == want.count())
  }

  test("ntileBalanced equals ntile for uneven, even, and tiny inputs") {
    for (n <- Seq(1, 3, 4, 7, 97, 400)) {
      val df = (1 to n).map(i => (i * 7 % 1000, s"s$i")).toDF("k", "v")
        .repartition(8)
      val want = df.withColumn("t", ntile(4).over(Window.orderBy(col("k"), col("v"))))
      val got = GlobalOrder.ntileBalanced(df, Seq(col("k"), col("v")), 4, "t")
      assert(got.select("k", "v", "t").except(want.select("k", "v", "t")).count() == 0,
        s"mismatch at n=$n")
      assert(got.count() == n.toLong)
    }
  }

  test("rank survives empty input") {
    val df = Seq.empty[(Int, String)].toDF("k", "v")
    assert(GlobalOrder.withGlobalRank(df, Seq(col("k")), "rk").count() == 0)
  }

  test("the plan contains no un-partitioned window") {
    val got = GlobalOrder.ntileBalanced(
      spark.read.parquet(s"$sf/supplier.parquet"), Seq(col("s_suppkey")), 4, "w")
    val p = got.queryExecution.executedPlan.toString
    // every Window node must carry a partition spec (the __go_pid column)
    p.linesIterator.filter(_.contains("Window")).foreach { l =>
      assert(!l.contains("windowspecdefinition(") ||
        l.contains("__go_pid"), s"unpartitioned window in plan: $l")
    }
  }
}
