package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.WindowOps

/** [[graft.functions.TopKRows]] must reproduce the window top-k exactly —
  * it is the same operator with a bounded-heap physical shape. */
class TopKRowsSpec extends AnyFunSuite {
  import SparkTestSession._

  private val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    .select("l_returnflag", "l_extendedprice", "l_orderkey", "l_linenumber")

  test("bounded top-k equals the window formulation") {
    val order = Seq(("l_extendedprice", true), ("l_orderkey", false), ("l_linenumber", false))
    val win = WindowOps.topK(li, Seq("l_returnflag"),
      Seq(col("l_extendedprice").desc, col("l_orderkey").asc, col("l_linenumber").asc), k = 7)
    val bounded = WindowOps.topKBounded(li, Seq("l_returnflag"), order, k = 7)
    val cols = Seq("l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice", "rk")
    assert(win.select(cols.map(col): _*).except(bounded.select(cols.map(col): _*)).count() == 0)
    assert(bounded.select(cols.map(col): _*).except(win.select(cols.map(col): _*)).count() == 0)
    assert(bounded.count() == win.count())
  }

  test("heap merge across many input partitions is exact") {
    // 64 partitions × tiny k forces real partial-buffer serialize/merge
    val skewed = li.repartition(64)
    val order = Seq(("l_extendedprice", true), ("l_orderkey", false), ("l_linenumber", false))
    val bounded = WindowOps.topKBounded(skewed, Seq("l_returnflag"), order, k = 2)
    val win = WindowOps.topK(li, Seq("l_returnflag"),
      Seq(col("l_extendedprice").desc, col("l_orderkey").asc, col("l_linenumber").asc), k = 2)
    val cols = Seq("l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice", "rk")
    assert(bounded.select(cols.map(col): _*).except(win.select(cols.map(col): _*)).count() == 0)
    assert(bounded.count() == win.count())
  }

  test("ascending-only ordering and k larger than the group") {
    val small = li.filter(col("l_orderkey") < 100)
    // (orderkey, linenumber) alone is NOT total on the synthetic lineitem
    // (duplicate pairs exist) — the price suffix makes it one
    val order = Seq(("l_orderkey", false), ("l_linenumber", false), ("l_extendedprice", false))
    val bounded = WindowOps.topKBounded(small, Seq("l_returnflag"), order, k = 1000)
    // with k >= group size every row survives with its full rank
    assert(bounded.count() == small.count())
    val win = WindowOps.topK(small, Seq("l_returnflag"),
      Seq(col("l_orderkey").asc, col("l_linenumber").asc, col("l_extendedprice").asc), k = 1000)
    val cols = Seq("l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice", "rk")
    assert(bounded.select(cols.map(col): _*).except(win.select(cols.map(col): _*)).count() == 0)
  }
}
