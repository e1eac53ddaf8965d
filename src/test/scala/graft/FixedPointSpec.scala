package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.FixedPointExpressions._

/** [[graft.functions.ScaledDecimal]] / [[graft.functions.ScaledDecimalProduct]]
  * must be drop-in replacements for the built-in double→decimal cast on the
  * exact-aggregation path: same values, same result type, plus loud failure
  * outside the domain (a silent wrap at 100 TB poisons a partial sum).
  */
class FixedPointSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val D = DecimalType(18, 4)

  test("scaledDecimal equals the native cast on fixed-digit and random data") {
    val rnd = new scala.util.Random(42)
    // two true decimal digits (the reference's price/rate shape) + integers
    val fixed = Seq.fill(4000)(math.round((rnd.nextDouble() - 0.5) * 2e7) / 100.0)
    val ints = Seq.fill(1000)((rnd.nextInt(101) - 50).toDouble)
    val df = (fixed ++ ints).toDF("x")
    val bad = df.filter(scaledDecimal(col("x"), 18, 4) =!= col("x").cast(D))
    assert(bad.count() == 0)
  }

  test("scaledProduct equals the decimal-cast multiply") {
    val rnd = new scala.util.Random(43)
    val df = Seq.fill(3000)((
      math.round(rnd.nextDouble() * 5e6) / 100.0,
      math.round((rnd.nextDouble() - 0.5) * 1e4) / 100.0)).toDF("a", "b")
    val bad = df.filter(
      scaledProduct(col("a"), col("b"), 4) =!= col("a").cast(D) * col("b").cast(D))
    assert(bad.count() == 0)
    // result type parity with the cast formulation (sum buffers match too)
    val t1 = df.select(scaledProduct(col("a"), col("b"), 4)).schema.head.dataType
    val t2 = df.select(col("a").cast(D) * col("b").cast(D)).schema.head.dataType
    assert(t1 == t2, s"$t1 vs $t2")
  }

  test("sum over scaled decimals goes beyond long-unscaled range exactly") {
    // 300k rows of 9e9.9999 → unscaled 9e13+; sum unscaled ≈ 2.7e19 > 2^63:
    // the aggregation buffer must promote off the compact representation
    // without wrapping.
    val df = spark.range(300000).select(lit(9.9999e9).as("x"))
    val got = df.agg(sum(scaledDecimal(col("x"), 18, 4)).cast("double")).head.getDouble(0)
    val want = BigDecimal("9.9999e9").*(BigDecimal(300000)).toDouble
    assert(got == want, s"$got vs $want")
  }

  test("out-of-domain input throws instead of wrapping") {
    // constant folding may surface the raw ArithmeticException driver-side;
    // a task failure arrives wrapped in SparkException — either is a loud stop
    def loud(f: => Unit): Unit = {
      val e = intercept[Exception](f)
      val root = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
        .toSeq.last
      assert(root.isInstanceOf[ArithmeticException], s"unexpected: $e")
    }
    loud(Seq(Double.NaN).toDF("x").select(scaledDecimal(col("x"), 18, 4)).collect())
    loud(Seq(1e15).toDF("x").select(scaledDecimal(col("x"), 18, 4)).collect())
    // per-row product overflow: 9e10 * 9e10 at scale 4 exceeds long
    loud(Seq((9e10, 9e10)).toDF("a", "b")
      .select(scaledProduct(col("a"), col("b"), 4)).collect())
  }

  test("interpreted eval matches codegen") {
    // force interpreted path via a non-codegen context: eval directly
    val e = graft.functions.ScaledDecimal(
      org.apache.spark.sql.catalyst.expressions.Literal(1234.5678), 18, 4)
    assert(e.eval(null).toString == "1234.5678")
    val p = graft.functions.ScaledDecimalProduct(
      org.apache.spark.sql.catalyst.expressions.Literal(2.5),
      org.apache.spark.sql.catalyst.expressions.Literal(-4.0), 4)
    assert(p.eval(null).toString == "-10.00000000")
  }
}
