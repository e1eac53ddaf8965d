package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Model-as-literal argmin expressions for the k-means / PQ / IVF+PQ
  * family.
  *
  * The r14 plans showed the assignment/encode operators paying a
  * corpus-scale `crossJoin(broadcast(model)) → groupBy(id) →
  * min(struct(d, cid))` per model pass: `min` over a struct cannot
  * hash-aggregate (the buffer is not mutable fixed-width), so every
  * assignment planned as Sort + SortAggregate + Exchange + Sort +
  * SortAggregate over n·k exploded rows. But the model side of each of
  * these joins is k rows by contract (the scaladocs already pin it
  * broadcast-small, and [[graft.similarity.IvfPq.searchStored]] already
  * collects the probed cells the same way), so the whole pass is really
  * a per-row function of the vector — these expressions take the model
  * as a plan literal (the [[QuantLshBucket]] planes precedent) and
  * compute the argmin in one codegen'd integer loop: zero exchanges,
  * zero sorts, zero row explosion, and the n·k distance arithmetic that
  * remains is the same arithmetic [[IntVecSqDist]] did, in the same
  * order.
  *
  * Tie semantics are preserved EXACTLY: candidates are iterated in
  * ascending id/code order with a strict `<` update, which is the
  * `min(struct(d, cid))` rule — smallest distance, then lowest id.
  * Distances accumulate in longs over the same `min(length)` element
  * window as [[IntVecSqDist]], so every value is bit-identical to the
  * join formulation and the DuckDB oracles replay unchanged.
  */
object ModelArgmin {

  /** Column wrapper: codegen'd scale-1024 half-even quantization
    * (array<float> → array<long>), bit-identical to
    * `transform(vec, x => bround(x.cast(double) * 1024).cast(long))`. */
  def quantizeVec(vec: Column): Column =
    Bridge.column(QuantizeVec(Bridge.expression(vec)))

  /** Column wrapper: argmin centroid id over a literal model (ties to
    * the lower id). `model` must be sorted ascending by id. */
  def quantArgminId(q: Column, ids: Seq[Int], cands: Seq[Seq[Long]]): Column =
    Bridge.column(QuantArgminId(Bridge.expression(q), ids, cands))

  /** Column wrapper: per-subspace PQ encode against a literal codebook —
    * array<struct<sub:int, code:int, d:long>>, one entry per subspace. */
  def pqEncodeVec(q: Column, subdim: Int, codeIds: Seq[Seq[Int]],
                  cbs: Seq[Seq[Seq[Long]]]): Column =
    Bridge.column(PqEncodeVec(Bridge.expression(q), subdim, codeIds, cbs))

  /** Column wrapper: fused IVF cell assignment + residual PQ encode —
    * array<struct<cell:int, sub:int, code:int>>, one entry per subspace
    * (the cell repeats per entry exactly as the exploded rows repeat it). */
  def ivfPqEncodeVec(q: Column, cells: Seq[Int], cents: Seq[Seq[Long]],
                     subdim: Int, codeIds: Seq[Seq[Int]],
                     cbs: Seq[Seq[Seq[Long]]]): Column =
    Bridge.column(IvfPqEncodeVec(Bridge.expression(q), cells, cents,
      subdim, codeIds, cbs))

  /** Collect a (id, vec) model DataFrame to sorted parallel arrays — the
    * bounded driver-scale contract point shared by every argmin caller. */
  def collectModel(df: org.apache.spark.sql.DataFrame, idCol: String,
                   vecCol: String): (Seq[Int], Seq[Seq[Long]]) = {
    val rows = df.selectExpr(s"cast($idCol as int)", vecCol).collect()
      .map(r => (r.getInt(0), r.getSeq[Long](1).toIndexedSeq))
      .sortBy(_._1).toIndexedSeq
    require(rows.nonEmpty, s"empty model frame ($idCol, $vecCol)")
    (rows.map(_._1), rows.map(_._2))
  }

  /** Collect a (sub, code, cq) codebook DataFrame to per-sub sorted
    * parallel arrays; subs must be exactly 0..m-1 (the subspaceSplit
    * contract — fail loudly on a malformed codebook). */
  def collectCodebook(df: org.apache.spark.sql.DataFrame, m: Int)
      : (Seq[Seq[Int]], Seq[Seq[Seq[Long]]]) = {
    val bySub = df.selectExpr("cast(sub as int)", "cast(code as int)", "cq")
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Long](2).toIndexedSeq))
      .groupBy(_._1)
    require(bySub.keySet == (0 until m).toSet,
      s"codebook subs ${bySub.keySet.toSeq.sorted} != 0..${m - 1}")
    val perSub = (0 until m).map(s => bySub(s).sortBy(_._2).toIndexedSeq)
    (perSub.map(_.map(_._2)), perSub.map(_.map(_._3)))
  }
}

/** Scale-1024 half-even quantization of a float vector as one codegen'd
  * loop. Replaces the interpreted `transform` HOF (allocates a lambda
  * frame per element and falls out of whole-stage codegen) on the hot
  * path every assignment/encode query takes. rint == bround: both are
  * IEEE round-half-even on the exact double x·1024 (1024 is a power of
  * two, the product is exact). Null elements pass through as nulls,
  * matching `transform`. */
case class QuantizeVec(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType,
    child.dataType.asInstanceOf[ArrayType].containsNull)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    var hasNull = false
    var i = 0
    while (i < n && !hasNull) { hasNull = v.isNullAt(i); i += 1 }
    if (!hasNull) {
      val out = new Array[Long](n)
      i = 0
      while (i < n) {
        out(i) = Math.rint(v.getFloat(i).toDouble * 1024.0).toLong
        i += 1
      }
      UnsafeArrayData.fromPrimitiveArray(out)
    } else {
      val out = new Array[Any](n)
      i = 0
      while (i < n) {
        if (!v.isNullAt(i))
          out(i) = Math.rint(v.getFloat(i).toDouble * 1024.0).toLong
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      val hasNull = ctx.freshName("hasNull")
      val o = ctx.freshName("o")
      val j = ctx.freshName("j")
      s"""
         |int $n = $v.numElements();
         |boolean $hasNull = false;
         |long[] $out = new long[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($v.isNullAt($i)) { $hasNull = true; break; }
         |  $out[$i] = (long) java.lang.Math.rint((double) $v.getFloat($i) * 1024.0);
         |}
         |if (!$hasNull) {
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
         |} else {
         |  Object[] $o = new Object[$n];
         |  for (int $j = 0; $j < $n; $j++) {
         |    if (!$v.isNullAt($j)) {
         |      $o[$j] = java.lang.Long.valueOf((long) java.lang.Math.rint((double) $v.getFloat($j) * 1024.0));
         |    }
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($o);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Argmin centroid id of an integer-quantized vector over a literal
  * model: one codegen'd loop over k·dims longs, ties to the lower id
  * (`ids` sorted ascending + strict `<` — the min(struct(d, cid)) rule).
  * Per-candidate distance uses the [[IntVecSqDist]] min-length window. */
case class QuantArgminId(child: Expression, ids: Seq[Int],
                         cands: Seq[Seq[Long]]) extends UnaryExpression {

  require(ids.nonEmpty && ids.length == cands.length,
    s"model mismatch: ${ids.length} ids vs ${cands.length} vectors")

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  @transient private lazy val idArr: Array[Int] = ids.toArray
  @transient private lazy val candArr: Array[Array[Long]] =
    cands.map(_.toArray).toArray

  override protected def nullSafeEval(input: Any): Any = {
    val q = input.asInstanceOf[ArrayData]
    val qn = q.numElements()
    var bestD = Long.MaxValue
    var bestId = idArr(0)
    var j = 0
    while (j < candArr.length) {
      val c = candArr(j)
      val n = math.min(qn, c.length)
      var s = 0L
      var i = 0
      while (i < n) {
        val d = q.getLong(i) - c(i)
        s += d * d
        i += 1
      }
      if (s < bestD) { bestD = s; bestId = idArr(j) }
      j += 1
    }
    bestId
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, q => {
      val idsRef = ctx.addReferenceObj("ids", idArr, "int[]")
      val candsRef = ctx.addReferenceObj("cands", candArr, "long[][]")
      val qn = ctx.freshName("qn")
      val bestD = ctx.freshName("bestD")
      val bestId = ctx.freshName("bestId")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      s"""
         |int $qn = $q.numElements();
         |long $bestD = Long.MAX_VALUE;
         |int $bestId = $idsRef[0];
         |for (int $j = 0; $j < $candsRef.length; $j++) {
         |  long[] $c = $candsRef[$j];
         |  int $n = java.lang.Math.min($qn, $c.length);
         |  long $s = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $d = $q.getLong($i) - $c[$i];
         |    $s += $d * $d;
         |  }
         |  if ($s < $bestD) { $bestD = $s; $bestId = $idsRef[$j]; }
         |}
         |${ev.value} = $bestId;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-subspace PQ encode of an integer-quantized vector against a
  * literal codebook: array<struct<sub, code, d>>, one entry per
  * subspace, code ties to the lower id, d the exact integer squared
  * distance — element-for-element what the subspaceSplit → broadcast
  * join → min(struct(d, code)) chain produced, with the n·m exploded
  * rows and the SortAggregate gone. */
case class PqEncodeVec(child: Expression, subdim: Int,
                       codeIds: Seq[Seq[Int]], cbs: Seq[Seq[Seq[Long]]])
    extends UnaryExpression {

  require(subdim > 0 && cbs.nonEmpty && codeIds.length == cbs.length &&
    codeIds.zip(cbs).forall { case (a, b) => a.nonEmpty && a.length == b.length })

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("sub", IntegerType, nullable = false),
    StructField("code", IntegerType, nullable = false),
    StructField("d", LongType, nullable = false))), containsNull = false)
  override def nullIntolerant: Boolean = true

  @transient private lazy val codeArr: Array[Array[Int]] =
    codeIds.map(_.toArray).toArray
  @transient private lazy val cbArr: Array[Array[Array[Long]]] =
    cbs.map(_.map(_.toArray).toArray).toArray

  override protected def nullSafeEval(input: Any): Any = {
    val q = input.asInstanceOf[ArrayData]
    val qn = q.numElements()
    val m = cbArr.length
    val out = new Array[Any](m)
    var sub = 0
    while (sub < m) {
      val base = sub * subdim
      val cb = cbArr(sub)
      var bestD = Long.MaxValue
      var bestCode = codeArr(sub)(0)
      var j = 0
      while (j < cb.length) {
        val c = cb(j)
        var s = 0L
        var i = 0
        while (i < subdim && i < c.length && base + i < qn) {
          val d = q.getLong(base + i) - c(i)
          s += d * d
          i += 1
        }
        if (s < bestD) { bestD = s; bestCode = codeArr(sub)(j) }
        j += 1
      }
      out(sub) = InternalRow(sub, bestCode, bestD)
      sub += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, q => {
      val codesRef = ctx.addReferenceObj("codeIds", codeArr, "int[][]")
      val cbRef = ctx.addReferenceObj("cbs", cbArr, "long[][][]")
      val qn = ctx.freshName("qn")
      val out = ctx.freshName("out")
      val sub = ctx.freshName("sub")
      val base = ctx.freshName("base")
      val cb = ctx.freshName("cb")
      val bestD = ctx.freshName("bestD")
      val bestCode = ctx.freshName("bestCode")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      s"""
         |int $qn = $q.numElements();
         |Object[] $out = new Object[$cbRef.length];
         |for (int $sub = 0; $sub < $cbRef.length; $sub++) {
         |  int $base = $sub * $subdim;
         |  long[][] $cb = $cbRef[$sub];
         |  long $bestD = Long.MAX_VALUE;
         |  int $bestCode = $codesRef[$sub][0];
         |  for (int $j = 0; $j < $cb.length; $j++) {
         |    long[] $c = $cb[$j];
         |    long $s = 0L;
         |    for (int $i = 0; $i < $subdim && $i < $c.length && $base + $i < $qn; $i++) {
         |      long $d = $q.getLong($base + $i) - $c[$i];
         |      $s += $d * $d;
         |    }
         |    if ($s < $bestD) { $bestD = $s; $bestCode = $codesRef[$sub][$j]; }
         |  }
         |  $out[$sub] = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |    new Object[]{java.lang.Integer.valueOf($sub), java.lang.Integer.valueOf($bestCode), java.lang.Long.valueOf($bestD)});
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Fused IVF cell assignment + residual PQ encode of an integer-
  * quantized vector against literal models: argmin cell (ties to the
  * lower cell id), residual against that centroid computed inline, then
  * per-subspace codeword argmin on the residual (ties to the lower
  * code). array<struct<cell, sub, code>> — exactly the rows
  * assignResiduals → subspaceSplit → join → min(struct) produced, in
  * ONE map-side loop. */
case class IvfPqEncodeVec(child: Expression, cells: Seq[Int],
                          cents: Seq[Seq[Long]], subdim: Int,
                          codeIds: Seq[Seq[Int]], cbs: Seq[Seq[Seq[Long]]])
    extends UnaryExpression {

  require(cells.nonEmpty && cells.length == cents.length && subdim > 0 &&
    cbs.nonEmpty && codeIds.length == cbs.length &&
    codeIds.zip(cbs).forall { case (a, b) => a.nonEmpty && a.length == b.length })

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("cell", IntegerType, nullable = false),
    StructField("sub", IntegerType, nullable = false),
    StructField("code", IntegerType, nullable = false))), containsNull = false)
  override def nullIntolerant: Boolean = true

  @transient private lazy val cellArr: Array[Int] = cells.toArray
  @transient private lazy val centArr: Array[Array[Long]] =
    cents.map(_.toArray).toArray
  @transient private lazy val codeArr: Array[Array[Int]] =
    codeIds.map(_.toArray).toArray
  @transient private lazy val cbArr: Array[Array[Array[Long]]] =
    cbs.map(_.map(_.toArray).toArray).toArray

  override protected def nullSafeEval(input: Any): Any = {
    val q = input.asInstanceOf[ArrayData]
    val qn = q.numElements()
    // argmin cell
    var bestD = Long.MaxValue
    var bestJ = 0
    var j = 0
    while (j < centArr.length) {
      val c = centArr(j)
      val n = math.min(qn, c.length)
      var s = 0L
      var i = 0
      while (i < n) {
        val d = q.getLong(i) - c(i)
        s += d * d
        i += 1
      }
      if (s < bestD) { bestD = s; bestJ = j }
      j += 1
    }
    val cell = cellArr(bestJ)
    val cent = centArr(bestJ)
    // per-sub codeword argmin on the residual q - cent, computed inline
    val m = cbArr.length
    val out = new Array[Any](m)
    var sub = 0
    while (sub < m) {
      val base = sub * subdim
      val cb = cbArr(sub)
      var bd = Long.MaxValue
      var bc = codeArr(sub)(0)
      var k = 0
      while (k < cb.length) {
        val c = cb(k)
        var s = 0L
        var i = 0
        while (i < subdim && i < c.length && base + i < qn &&
               base + i < cent.length) {
          val d = (q.getLong(base + i) - cent(base + i)) - c(i)
          s += d * d
          i += 1
        }
        if (s < bd) { bd = s; bc = codeArr(sub)(k) }
        k += 1
      }
      out(sub) = InternalRow(cell, sub, bc)
      sub += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, q => {
      val cellsRef = ctx.addReferenceObj("cells", cellArr, "int[]")
      val centsRef = ctx.addReferenceObj("cents", centArr, "long[][]")
      val codesRef = ctx.addReferenceObj("codeIds", codeArr, "int[][]")
      val cbRef = ctx.addReferenceObj("cbs", cbArr, "long[][][]")
      val qn = ctx.freshName("qn")
      val bestD = ctx.freshName("bestD")
      val bestJ = ctx.freshName("bestJ")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val cell = ctx.freshName("cell")
      val cent = ctx.freshName("cent")
      val out = ctx.freshName("out")
      val sub = ctx.freshName("sub")
      val base = ctx.freshName("base")
      val cb = ctx.freshName("cb")
      val bd = ctx.freshName("bd")
      val bc = ctx.freshName("bc")
      val k = ctx.freshName("k")
      val c2 = ctx.freshName("c2")
      val s2 = ctx.freshName("s2")
      val i2 = ctx.freshName("i2")
      val d2 = ctx.freshName("d2")
      s"""
         |int $qn = $q.numElements();
         |long $bestD = Long.MAX_VALUE;
         |int $bestJ = 0;
         |for (int $j = 0; $j < $centsRef.length; $j++) {
         |  long[] $c = $centsRef[$j];
         |  int $n = java.lang.Math.min($qn, $c.length);
         |  long $s = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $d = $q.getLong($i) - $c[$i];
         |    $s += $d * $d;
         |  }
         |  if ($s < $bestD) { $bestD = $s; $bestJ = $j; }
         |}
         |int $cell = $cellsRef[$bestJ];
         |long[] $cent = $centsRef[$bestJ];
         |Object[] $out = new Object[$cbRef.length];
         |for (int $sub = 0; $sub < $cbRef.length; $sub++) {
         |  int $base = $sub * $subdim;
         |  long[][] $cb = $cbRef[$sub];
         |  long $bd = Long.MAX_VALUE;
         |  int $bc = $codesRef[$sub][0];
         |  for (int $k = 0; $k < $cb.length; $k++) {
         |    long[] $c2 = $cb[$k];
         |    long $s2 = 0L;
         |    for (int $i2 = 0; $i2 < $subdim && $i2 < $c2.length
         |         && $base + $i2 < $qn && $base + $i2 < $cent.length; $i2++) {
         |      long $d2 = ($q.getLong($base + $i2) - $cent[$base + $i2]) - $c2[$i2];
         |      $s2 += $d2 * $d2;
         |    }
         |    if ($s2 < $bd) { $bd = $s2; $bc = $codesRef[$sub][$k]; }
         |  }
         |  $out[$sub] = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |    new Object[]{java.lang.Integer.valueOf($cell), java.lang.Integer.valueOf($sub), java.lang.Integer.valueOf($bc)});
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
