package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Exact percentiles over a primitive double buffer — a drop-in for the
  * built-in `percentile(col, array(...))` on the exact-percentile path.
  *
  * The built-in aggregates through an OpenHashMap[AnyRef, Long] (boxed key
  * per distinct value, hash probe per row, map merge per shuffle block);
  * for a mostly-distinct physical column that is strictly worse than the
  * flat multiset this aggregate keeps: an appending primitive
  * Array[Double] (no boxing, no probing), concatenated on merge and sorted
  * ONCE at eval. Measured ~2x on the 600k-row q34 path.
  *
  * Interpolation is bit-identical to the built-in (and to the DuckDB
  * quantile_cont oracle on the driver gate): for percentage p over n
  * sorted values, pos = p*(n-1), result =
  * (ceil(pos)-pos)*a[floor(pos)] + (pos-floor(pos))*a[ceil(pos)].
  *
  * Scale note: the buffer is O(group size) — same as the built-in's map on
  * high-cardinality columns (and smaller by the boxing constant). Exact
  * percentiles intrinsically hold the group's multiset; the 100 TB path is
  * approx_percentile/t-digest, which is not oracle-able cell-exact.
  * Nulls are skipped (built-in semantics); an all-null group yields null.
  */
case class ArrayPercentile(
    child: Expression,
    percentages: Seq[Double],
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayPercentile.DoubleVec] {

  require(percentages.nonEmpty && percentages.forall(p => p >= 0.0 && p <= 1.0),
    "percentages must be in [0, 1]")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def createAggregationBuffer(): ArrayPercentile.DoubleVec =
    new ArrayPercentile.DoubleVec

  override def update(buf: ArrayPercentile.DoubleVec,
                      input: InternalRow): ArrayPercentile.DoubleVec = {
    val v = child.eval(input)
    if (v != null) buf.append(v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: ArrayPercentile.DoubleVec,
                     other: ArrayPercentile.DoubleVec): ArrayPercentile.DoubleVec = {
    buf.appendAll(other)
    buf
  }

  override def eval(buf: ArrayPercentile.DoubleVec): Any = {
    if (buf.n == 0) return null
    val a = buf.sortedCopy()
    val out = percentages.map { p =>
      val pos = p * (a.length - 1)
      val lo = math.floor(pos).toInt
      val hi = math.ceil(pos).toInt
      if (lo == hi) a(lo)
      else (hi - pos) * a(lo) + (pos - lo) * a(hi)
    }
    new GenericArrayData(out.toArray)
  }

  override def serialize(buf: ArrayPercentile.DoubleVec): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * buf.n)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putDouble(buf.a(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayPercentile.DoubleVec = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new ArrayPercentile.DoubleVec
    buf.ensure(n)
    var i = 0
    while (i < n) { buf.a(i) = bb.getDouble; i += 1 }
    buf.n = n
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ArrayPercentile =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ArrayPercentile =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "array_percentile"
}

object ArrayPercentile {

  /** Growable primitive double buffer (no boxing). */
  final class DoubleVec {
    var a: Array[Double] = new Array[Double](16)
    var n: Int = 0
    def ensure(cap: Int): Unit =
      if (a.length < cap) {
        val next = new Array[Double](math.max(cap, a.length * 2))
        System.arraycopy(a, 0, next, 0, n)
        a = next
      }
    def append(v: Double): Unit = {
      if (n == a.length) ensure(n + 1)
      a(n) = v
      n += 1
    }
    def appendAll(o: DoubleVec): Unit = {
      ensure(n + o.n)
      System.arraycopy(o.a, 0, a, n, o.n)
      n += o.n
    }
    def sortedCopy(): Array[Double] = {
      val c = java.util.Arrays.copyOf(a, n)
      java.util.Arrays.sort(c)
      c
    }
  }

  /** Aggregate Column: exact percentiles of `c` (cast to double) at the
    * given percentages, returned as array<double> in input order. */
  def percentiles(c: Column, ps: Seq[Double]): Column =
    Bridge.column(ArrayPercentile(
      Bridge.expression(c.cast("double")), ps).toAggregateExpression())
}
