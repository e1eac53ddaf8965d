package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorExpressions.doubleDot

class VectorExpressionsSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("DoubleDot matches the interpreted HOF formulation exactly") {
    val df = Tables(spark, sf).embeddings.limit(200)
      .select(col("vec_id"), col("embedding").as("v"))
    val hof = aggregate(
      zip_with(col("v"), col("v"), (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)
    val bad = df.select((doubleDot(col("v"), col("v")) - hof).as("d"))
      .filter(abs(col("d")) > 0.0)
    assert(bad.count() == 0) // identical summation order => bit-identical
  }

  test("DoubleDot handles nulls and empty/mismatched arrays") {
    val df = Seq(
      (Some(Seq(1.0f, 2.0f)), Some(Seq(3.0f, 4.0f))),
      (Some(Seq.empty[Float]), Some(Seq(1.0f))),
      (None, Some(Seq(1.0f))))
      .toDF("a", "b")
    val got = df.select(doubleDot(col("a"), col("b")).as("d")).collect().map(r =>
      if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(got(0).contains(11.0))
    assert(got(1).contains(0.0))
    assert(got(2).isEmpty)
  }

  test("DoubleDot survives both codegen and interpreted paths") {
    val df = Tables(spark, sf).embeddings.limit(10)
    val withExpr = df.select(doubleDot(col("embedding"), col("embedding")).as("n2"))
    assert(withExpr.collect().forall(_.getDouble(0) > 0.0))
    // force interpreted eval
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try assert(withExpr.collect().forall(_.getDouble(0) > 0.0))
    finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }
}
