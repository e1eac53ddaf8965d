package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Native Catalyst expressions for the vector hot path.
  *
  * `zip_with` + `aggregate` dot products don't enter whole-stage codegen
  * (higher-order functions are interpreted and allocate an intermediate
  * array per row); over an all-pairs similarity join that interpretation
  * dominates the runtime. [[DoubleDot]] generates a tight primitive loop
  * over the two ArrayData buffers — no boxing, no allocation — and keeps
  * the whole scoring projection inside one codegen stage. Summation order
  * is left-to-right, identical to the HOF formulation it replaces.
  */
case class DoubleDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** EXACT quantized dot product of two float vectors, as the correctly-
  * rounded double of the exact integer sum Σᵢ q9(aᵢ)·q9(bᵢ), where
  * q9(x) = rint(double(x)·1e9) (half-even; identical to Spark `bround` /
  * DuckDB `round_even` by construction).
  *
  * Replaces the interpreted `zip_with`/`aggregate` DECIMAL(38,0)
  * formulation with a codegen'd integer loop — same value bit-for-bit:
  * the decimal path's closing `cast(double)` is BigDecimal.doubleValue
  * (correctly rounded), and this loop reproduces the correctly-rounded
  * double of the same exact integer. Overflow-safe 128-bit accumulation
  * without BigInteger: each product p (|p| < 2^62 for |x| ≲ 2) splits
  * exactly as (p >> 32)·2^32 + (p & 0xffffffff) — true in two's
  * complement for negative p as well — and the two partial sums stay
  * far from 2^63 for any realistic (n ≤ 2^20) embedding. The closing is
  * hi·2^32 + lo computed in doubles: after carry-normalization hi has
  * ≤ 53 significant bits and lo < 2^32, so both terms are exact doubles
  * and the single addition rounds once — a correctly-rounded result (the
  * same value DuckDB's hugeint → VARCHAR → DOUBLE route yields).
  */
case class Q9Dot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var hi = 0L
    var lo = 0L
    var i = 0
    while (i < n) {
      val p = Math.rint(x.getFloat(i).toDouble * 1e9).toLong *
        Math.rint(y.getFloat(i).toDouble * 1e9).toLong
      hi += (p >> 32)
      lo += (p & 0xffffffffL)
      i += 1
    }
    hi += (lo >> 32)
    lo &= 0xffffffffL
    hi.toDouble * 4294967296.0 + lo.toDouble
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val hi = ctx.freshName("hi")
      val lo = ctx.freshName("lo")
      val p = ctx.freshName("p")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $hi = 0L; long $lo = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $p = (long) java.lang.Math.rint((double) $a.getFloat($i) * 1.0E9)
         |          * (long) java.lang.Math.rint((double) $b.getFloat($i) * 1.0E9);
         |  $hi += ($p >> 32);
         |  $lo += ($p & 0xffffffffL);
         |}
         |$hi += ($lo >> 32);
         |$lo &= 0xffffffffL;
         |${ev.value} = (double) $hi * 4294967296.0 + (double) $lo;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Random-hyperplane LSH bucket of a float vector, computed as one
  * codegen'd loop over INTEGER-quantized planes.
  *
  * Bit j of the result is set iff Σᵢ q9(xᵢ)·wⱼᵢ > 0, where q9(x) =
  * rint(double(x)·1e9) (half-even — Spark `bround`, DuckDB `round_even`)
  * and wⱼᵢ are the plane weights pre-quantized to integers at plan-build
  * time. The sum is EXACT long arithmetic (|q9| ≲ 1e9, |w| ≲ 1e4, ≤ 2^13
  * terms stays under 2^63), so the bucket is bit-identical across engines
  * and partitionings — which is what lets the approximate-KNN query carry
  * a DuckDB oracle. Replaces a per-plane interpreted `zip_with`/`aggregate`
  * formulation that allocated per row and fell out of whole-stage codegen
  * (the r05 e03 bench regression, 0.78 → 1.91 s).
  */
case class QuantLshBucket(child: Expression, planes: Seq[Seq[Int]])
    extends UnaryExpression {

  require(planes.nonEmpty && planes.size <= 62, "bucket must fit a long")

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  @transient private lazy val planeArr: Array[Array[Int]] =
    planes.map(_.toArray).toArray

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    var bucket = 0L
    var j = 0
    while (j < planeArr.length) {
      val w = planeArr(j)
      val m = math.min(n, w.length)
      var s = 0L
      var i = 0
      while (i < m) {
        s += Math.rint(v.getFloat(i).toDouble * 1e9).toLong * w(i)
        i += 1
      }
      if (s > 0L) bucket |= (1L << j)
      j += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val p = ctx.addReferenceObj("planes", planeArr, "int[][]")
      val n = ctx.freshName("n")
      val b = ctx.freshName("bucket")
      val j = ctx.freshName("j")
      val w = ctx.freshName("w")
      val m = ctx.freshName("m")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      s"""
         |int $n = $v.numElements();
         |long $b = 0L;
         |for (int $j = 0; $j < $p.length; $j++) {
         |  int[] $w = $p[$j];
         |  int $m = java.lang.Math.min($n, $w.length);
         |  long $s = 0L;
         |  for (int $i = 0; $i < $m; $i++) {
         |    $s += (long) java.lang.Math.rint((double) $v.getFloat($i) * 1.0E9)
         |          * (long) $w[$i];
         |  }
         |  if ($s > 0L) $b |= (1L << $j);
         |}
         |${ev.value} = $b;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** EXACT squared Euclidean distance of two integer-quantized vectors
  * (array<long> × array<long> → long). The k-means hot path: one codegen'd
  * primitive loop per (point, centroid) pair — no HOF interpretation, no
  * allocation, and because everything is integer the value is identical in
  * any engine (the reason [[graft.similarity.KMeansExact]] can carry a
  * cell-exact cross-engine oracle with no float policy at all). */
case class IntVecSqDist(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      val d = x.getLong(i) - y.getLong(i)
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $d = $a.getLong($i) - $b.getLong($i);
         |  $s += $d * $d;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Int16 code of a float vector's UNIT form: element i of the binary
  * (big-endian shorts, 2d bytes) is c_i = rint(32767 · x_i / nrm) —
  * since |x_i| ≤ nrm for every element, c_i ∈ [-32767, 32767] with no
  * clamping, and c_i/32767 approximates the unit element u_i within the
  * CONSTANT radius δ = 0.5/32767. That constant is the whole design:
  * [[graft.similarity.Knn.Code16CosEps]] turns it into a sound
  * corpus-independent cosine bound that lives in the PLAN as a literal
  * — unlike a per-vector-scaled code, whose per-pair bound would ride
  * every candidate row through the kth-threshold exchange (measured at
  * sf10: the 8 B/row eps column on the 302M-row slim exchange cost MORE
  * than the probe-side byte saving it enabled).
  *
  * The point of the code is BYTES ON THE WIRE: an ANN probe fan-out
  * carrying 128 B instead of a ~280 B float array halves its bucket-join
  * exchange — e18's measured third-decade wall (docs/SCALE.md
  * Addendum 6). A zero vector codes to all-zero (its cosine is
  * undefined upstream anyway). */
case class FloatVecCode16(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.BinaryType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val nrm = b.asInstanceOf[Double]
    val d = v.numElements()
    val out = new Array[Byte](2 * d)
    if (nrm > 0) {
      val t = 32767.0 / nrm
      var i = 0
      while (i < d) {
        val c = Math.rint(v.getFloat(i).toDouble * t).toInt
        out(2 * i) = (c >> 8).toByte
        out(2 * i + 1) = c.toByte
        i += 1
      }
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val d = ctx.freshName("d")
      val out = ctx.freshName("out")
      val t = ctx.freshName("t")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      s"""
         |int $d = $a.numElements();
         |byte[] $out = new byte[2 * $d];
         |if ($b > 0) {
         |  double $t = 32767.0 / $b;
         |  for (int $i = 0; $i < $d; $i++) {
         |    int $c = (int) java.lang.Math.rint((double) $a.getFloat($i) * $t);
         |    $out[2 * $i] = (byte) ($c >> 8);
         |    $out[2 * $i + 1] = (byte) $c;
         |  }
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Code-cosine of two [[FloatVecCode16]] binaries:
  * (Σ c_i·d_i) / 32767² — within [[graft.similarity.Knn.Code16CosEps]]
  * of cos(u, v). One integer loop over the short codes, codegen'd, long
  * accumulator (64 · 32767² ≈ 2^36 overflows an int). */
case class Code16Dot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]
    val y = b.asInstanceOf[Array[Byte]]
    val n = math.min(x.length, y.length) & ~1
    var s = 0L
    var i = 0
    while (i < n) {
      val va = (x(i) << 8) | (x(i + 1) & 0xff)
      val vb = (y(i) << 8) | (y(i + 1) & 0xff)
      s += va.toLong * vb
      i += 2
    }
    s / 1073676289.0 // 32767^2
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val va = ctx.freshName("va")
      val vb = ctx.freshName("vb")
      s"""
         |int $n = java.lang.Math.min($a.length, $b.length) & ~1;
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i += 2) {
         |  int $va = ($a[$i] << 8) | ($a[$i + 1] & 0xff);
         |  int $vb = ($b[$i] << 8) | ($b[$i + 1] & 0xff);
         |  $s += (long) $va * $vb;
         |}
         |${ev.value} = $s / 1073676289.0;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  /** Column wrapper: codegen'd double dot product of two float vectors. */
  def doubleDot(a: Column, b: Column): Column =
    Bridge.column(DoubleDot(Bridge.expression(a), Bridge.expression(b)))

  /** Column wrapper: codegen'd exact integer squared distance (long). */
  def intVecSqDist(a: Column, b: Column): Column =
    Bridge.column(IntVecSqDist(Bridge.expression(a), Bridge.expression(b)))

  /** Column wrapper: codegen'd quantized-plane LSH bucket (long). */
  def quantLshBucket(vec: Column, planes: Seq[Seq[Int]]): Column =
    Bridge.column(QuantLshBucket(Bridge.expression(vec), planes))

  /** Column wrapper: codegen'd exact quantized dot (1e18-scaled, double). */
  def q9Dot(a: Column, b: Column): Column =
    Bridge.column(Q9Dot(Bridge.expression(a), Bridge.expression(b)))

  /** Column wrapper: unit-scaled int16 code binary (128 B at d=64). */
  def code16(vec: Column, nrmFast: Column): Column =
    Bridge.column(FloatVecCode16(Bridge.expression(vec), Bridge.expression(nrmFast)))

  /** Column wrapper: code-cosine of two [[code16]] binaries. */
  def code16Dot(a: Column, b: Column): Column =
    Bridge.column(Code16Dot(Bridge.expression(a), Bridge.expression(b)))
}
