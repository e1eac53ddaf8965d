package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Census, CensusAggregator}
import graft.ops.CensusAggregator.ChildRollup

class CensusAggregatorSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("typed census aggregator equals the untyped count(when) plan") {
    val t = Tables(spark, sf)
    val items = t.lineitem.withColumnRenamed("l_orderkey", "o_orderkey")
    val net = col("l_extendedprice") * (lit(1) - col("l_discount"))
    val rollup = Census.perChildRollup(
      t.orders, Seq("o_custkey", "o_orderkey"), items, "o_orderkey",
      expected = col("o_totalprice"), actual = net)

    val untyped = Census.passFailZero(
        t.customer.withColumnRenamed("c_custkey", "o_custkey"),
        Seq("o_custkey"), rollup, "o_custkey", passRatio = 0.5)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap

    val typed = rollup
      .select(col("o_custkey"),
        col("expected"), coalesce(col("actual"), lit(0.0)).as("actual"), col("n_items"))
      .as[(Long, Double, Double, Long)]
      .map { case (k, e, a, n) => k -> ChildRollup(e, a, n) }
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(CensusAggregator.passFailZero(0.5))
      .collect().map { case (k, b) => k -> ((b.nPass, b.nFail, b.nZero)) }.toMap

    assert(typed == untyped)
  }
}
