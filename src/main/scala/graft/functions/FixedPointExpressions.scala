package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, Decimal, DecimalType}

/** Codegen'd fixed-point conversion for the exact-aggregation hot path.
  *
  * `CAST(double AS DECIMAL(p,s))` in Spark routes every row through
  * `Double.toString` + a `java.math.BigDecimal` parse — two allocations and
  * a string render per value. In a six-way moment aggregation over lineitem
  * (q21) that cast dominates the runtime by an order of magnitude.
  *
  * [[ScaledDecimal]] produces the same compact decimal through pure long
  * arithmetic: round(x * 10^s) half-away-from-zero, long-unscaled, no
  * strings. Once every input is a compact (long-backed) decimal of one
  * scale, Spark's `Sum`/window-sum accumulate through `Decimal`'s compact
  * fast path instead of BigDecimal.
  *
  * Rounding domain: Spark's native cast rounds the *shortest decimal
  * representation* of the double (HALF_UP); this expression rounds in
  * double space (`x * 10^s`, HALF_UP). The two disagree only when the
  * product lands within one double ulp of a `.5` tie — impossible for
  * values that carry at most `s` true decimal digits (the reference's
  * quantities/prices/rates, project_pooling_info.py:55-69), and verified
  * by the cell-exact DuckDB hash gate at every scale factor. DuckDB's own
  * double→decimal cast rounds in double space, so this is also the closer
  * semantic match to the oracle.
  *
  * Out-of-domain inputs (NaN, ±Inf, |x·10^s| ≥ 10^p) throw
  * `ArithmeticException`, mirroring the ANSI cast; at 100 TB a silent
  * wrap would poison a whole partition's partial sum.
  */
case class ScaledDecimal(child: Expression, precision: Int, scale: Int)
    extends UnaryExpression {
  require(precision <= DecimalType.MAX_PRECISION && scale <= precision,
    s"invalid decimal($precision,$scale)")

  override def dataType: DataType = DecimalType(precision, scale)
  override def nullIntolerant: Boolean = true

  private val pow: Double = math.pow(10, scale)
  private val bound: Double = math.pow(10, precision)

  override protected def nullSafeEval(input: Any): Any = {
    val z = input.asInstanceOf[Double] * pow
    if (java.lang.Double.isNaN(z) || java.lang.Double.isInfinite(z) ||
        math.abs(z) >= bound) {
      throw new ArithmeticException(s"ScaledDecimal($precision,$scale) overflow: $input")
    }
    val u = if (z >= 0) (z + 0.5d).toLong else -((-z + 0.5d).toLong)
    Decimal(u, precision, scale)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val z = ctx.freshName("z")
      val u = ctx.freshName("u")
      s"""
         |double $z = $x * ${pow}d;
         |if (Double.isNaN($z) || Double.isInfinite($z) || Math.abs($z) >= ${bound}d) {
         |  throw new ArithmeticException("ScaledDecimal($precision,$scale) overflow: " + $x);
         |}
         |long $u = $z >= 0d ? (long) ($z + 0.5d) : -((long) (-$z + 0.5d));
         |${ev.value} = org.apache.spark.sql.types.Decimal.apply($u, $precision, $scale);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Exact product of two doubles as a compact decimal, without the
  * intermediate `decimal * decimal` BigDecimal multiply.
  *
  * Each factor is scaled to a long at `scale` digits (same rounding as
  * [[ScaledDecimal]]); the product is one `Math.multiplyExact` with result
  * scale `2*scale`. Equivalent to
  * `CAST(a AS DECIMAL(18,s)) * CAST(b AS DECIMAL(18,s))` (→ DECIMAL(37,2s))
  * for all inputs where the unscaled product fits a long — |a·b·10^2s| <
  * 2^63, i.e. products up to ~9·10^10 at scale 4. Larger products throw
  * rather than wrap (the moment queries' per-row products are ≤ 5·10^14
  * unscaled; the *sums* above long range are carried by the decimal
  * aggregation buffer, which goes non-compact exactly).
  */
case class ScaledDecimalProduct(left: Expression, right: Expression, scale: Int)
    extends BinaryExpression {
  require(scale >= 0 && 2 * scale <= 8, s"scale $scale out of supported range")

  // (37, 2s): same result type as the decimal-cast multiply it replaces.
  override def dataType: DataType = DecimalType(37, 2 * scale)
  override def nullIntolerant: Boolean = true

  private val pow: Double = math.pow(10, scale)
  // Factor bound so the *per-factor* long conversion is exact; product
  // overflow is caught by multiplyExact.
  private val bound: Double = math.pow(10, 18)

  private def toScaledLong(v: Double): Long = {
    val z = v * pow
    if (java.lang.Double.isNaN(z) || java.lang.Double.isInfinite(z) ||
        math.abs(z) >= bound) {
      throw new ArithmeticException(s"ScaledDecimalProduct($scale) overflow: $v")
    }
    if (z >= 0) (z + 0.5d).toLong else -((-z + 0.5d).toLong)
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val p = Math.multiplyExact(
      toScaledLong(a.asInstanceOf[Double]), toScaledLong(b.asInstanceOf[Double]))
    Decimal(p, 37, 2 * scale)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val za = ctx.freshName("za")
      val zb = ctx.freshName("zb")
      val ua = ctx.freshName("ua")
      val ub = ctx.freshName("ub")
      def conv(in: String, z: String, u: String): String =
        s"""
           |double $z = $in * ${pow}d;
           |if (Double.isNaN($z) || Double.isInfinite($z) || Math.abs($z) >= ${bound}d) {
           |  throw new ArithmeticException("ScaledDecimalProduct($scale) overflow: " + $in);
           |}
           |long $u = $z >= 0d ? (long) ($z + 0.5d) : -((long) (-$z + 0.5d));
         """.stripMargin
      s"""
         |${conv(a, za, ua)}
         |${conv(b, zb, ub)}
         |${ev.value} = org.apache.spark.sql.types.Decimal.apply(
         |  Math.multiplyExact($ua, $ub), 37, ${2 * scale});
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object FixedPointExpressions {
  /** Codegen'd equivalent of `c.cast(DecimalType(p, s))` for double input. */
  def scaledDecimal(c: Column, precision: Int, scale: Int): Column =
    Bridge.column(ScaledDecimal(Bridge.expression(c), precision, scale))

  /** Codegen'd equivalent of
    * `a.cast(DecimalType(18,s)) * b.cast(DecimalType(18,s))`. */
  def scaledProduct(a: Column, b: Column, scale: Int): Column =
    Bridge.column(ScaledDecimalProduct(
      Bridge.expression(a), Bridge.expression(b), scale))
}
