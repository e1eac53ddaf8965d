package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.RangeJoin

/** The range-join optimizer rule must (1) remove the nested-loop join,
  * (2) return exactly the naive join's rows, (3) degrade to identity
  * semantics when the rule is not installed. */
class RangeJoinRewriteSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val iv = (1 to 60).map { i =>
    val s = (i * 97 % 500).toLong; (i.toLong, s, s + (i * 13 % 80))
  }.toDF("iv_id", "s", "e")
  private val pts = (1 to 300).map(i => (i.toLong, (i * 31 % 600).toLong))
    .toDF("p_id", "p")

  private def naive = pts.join(iv, col("p") >= col("s") && col("p") <= col("e"))

  test("annotated range join is rewritten to a bucketized equi-join") {
    GraftExtensions.registerAll(spark)
    val auto = RangeJoin.pointsInIntervalsAuto(iv, pts, "s", "e", "p", 80L)
    val plan = auto.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "rule did not fire — still a nested-loop join\n" + plan)
    assert(plan.contains("__graft_b"), "bucket column missing\n" + plan)
    val cols = Seq("p_id", "p", "iv_id", "s", "e").map(col)
    assert(auto.select(cols: _*).except(naive.select(cols: _*)).count() == 0)
    assert(naive.select(cols: _*).except(auto.select(cols: _*)).count() == 0)
    assert(auto.count() == naive.count() && auto.count() > 0)
  }

  test("width smaller than the longest interval stays correct (more buckets)") {
    GraftExtensions.registerAll(spark)
    val auto = RangeJoin.pointsInIntervalsAuto(iv, pts, "s", "e", "p", 7L)
    assert(auto.count() == naive.count())
  }

  test("without the rule the annotation is a runtime identity") {
    val saved = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations =
      saved.filterNot(_ == graft.plans.RangeJoinRewrite)
    try {
      val auto = RangeJoin.pointsInIntervalsAuto(iv, pts, "s", "e", "p", 80L)
      assert(auto.count() == naive.count())
    } finally spark.experimental.extraOptimizations = saved
  }

  test("SQL users can hint through the registered bucketed_end function") {
    GraftExtensions.registerAll(spark)
    iv.createOrReplaceTempView("iv_sql")
    pts.createOrReplaceTempView("pts_sql")
    val auto = spark.sql(
      """SELECT p_id, iv_id FROM pts_sql JOIN iv_sql
        |ON p >= s AND p <= bucketed_end(e, 80)""".stripMargin)
    val plan = auto.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(auto.count() == naive.count() && auto.count() > 0)
  }

  test("incomplete pattern (no lower bound) is left untouched but correct") {
    GraftExtensions.registerAll(spark)
    val onlyUpper = pts.join(iv, col("p") <= RangeJoin.bucketedEnd(col("e"), 80L))
    val expect = pts.join(iv, col("p") <= col("e"))
    assert(onlyUpper.count() == expect.count())
  }
}
