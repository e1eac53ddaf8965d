package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StructType}

/** Bounded top-k rows per group as ONE map-side-combinable aggregation.
  *
  * The window formulation of "top k by X per group"
  * (`row_number().over(partitionBy(g).orderBy(...)) <= k`,
  * metadata_validation.py:585-589) shuffles and sorts EVERY row; with few
  * groups (q10 has three return flags) the sort lands on as many tasks as
  * there are groups — 3 giant tasks at 100 TB. This aggregate keeps a
  * k-bounded heap per (group, partition): each input partition contributes
  * at most k rows per group to the shuffle, the merge is heap-union, and no
  * global sort ever happens. Work is O(n log k) map-side; shuffle volume is
  * O(groups × partitions × k).
  *
  * Ordering: lexicographic over the first `sortFields` fields of the input
  * struct, field i descending when `desc(i)`. The caller must supply a
  * TOTAL order (tie-suffix columns), same contract as [[graft.ops.WindowOps]].
  * `eval` emits the k rows sorted in that order, so `posexplode` yields the
  * `row_number` rank directly — no follow-up window.
  */
case class TopKRows(
    child: Expression,
    k: Int,
    sortFields: Int,
    desc: Seq[Boolean],
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[InternalRow]] {

  require(k > 0 && sortFields > 0 && desc.length == sortFields)

  private def structType: StructType = child.dataType.asInstanceOf[StructType]

  // Query-order comparator over the leading sort fields. The heap keeps the
  // k SMALLEST under this order (row_number <= k keeps the first k rows of
  // the ORDER BY); its head is the current worst, evicted on a better row.
  @transient private lazy val fieldTypes: Array[DataType] =
    structType.fields.map(_.dataType)
  @transient private lazy val fieldOrd: Array[Ordering[Any]] =
    fieldTypes.take(sortFields).map(TypeUtils.getInterpretedOrdering)

  /** Query-order compare of one field's two VALUES. Null placement
    * matches Spark's window default: NULLS FIRST on ascending keys,
    * NULLS LAST on descending. */
  private def compareField(i: Int, va: Any, vb: Any): Int =
    if (va == null && vb == null) 0
    else if (va == null) { if (desc(i)) 1 else -1 }
    else if (vb == null) { if (desc(i)) -1 else 1 }
    else {
      val cc = fieldOrd(i).compare(va, vb)
      if (desc(i)) -cc else cc
    }

  @transient private lazy val rowOrd: Ordering[InternalRow] =
    new Ordering[InternalRow] {
      override def compare(a: InternalRow, b: InternalRow): Int = {
        var i = 0
        while (i < sortFields) {
          val c = compareField(i,
            a.get(i, fieldTypes(i)), b.get(i, fieldTypes(i)))
          if (c != 0) return c
          i += 1
        }
        0
      }
    }

  // Fast-path reject: once the heap is full, the overwhelming share of
  // input rows lose to the current worst on the FIRST sort field alone
  // (e18 at sf30: ~960M candidate rows keep 10 per query), yet the
  // generic path pays a full interpreted CreateNamedStruct.eval — a
  // per-row List walk and GenericInternalRow allocation — just to
  // discard the row (measured: the dominant cpu of e18's kth stage,
  // ~12k cpu-s at sf30). When the child is a struct literal we can
  // evaluate JUST its first value expression and compare against the
  // heap head's first field: strictly-worse rows reject with one
  // expression eval and zero allocation; ties and winners fall through
  // to the exact generic path, so the kept set is bit-identical.
  @transient private lazy val firstValExpr: Expression = child match {
    case s: org.apache.spark.sql.catalyst.expressions.CreateNamedStruct =>
      s.valExprs.head
    case _ => null
  }

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(structType, containsNull = false)

  override def createAggregationBuffer(): mutable.PriorityQueue[InternalRow] =
    new mutable.PriorityQueue[InternalRow]()(rowOrd) // max-heap: head = worst

  override def update(buf: mutable.PriorityQueue[InternalRow],
                      input: InternalRow): mutable.PriorityQueue[InternalRow] = {
    if (buf.size >= k && firstValExpr != null) {
      val c = compareField(0, firstValExpr.eval(input),
        buf.head.get(0, fieldTypes(0)))
      // strictly worse than the current worst on the first sort field →
      // the full lexicographic compare is also > 0: reject allocation-free
      if (c > 0) return buf
    }
    val v = child.eval(input)
    if (v != null) {
      val r = v.asInstanceOf[InternalRow]
      if (buf.size < k) {
        buf.enqueue(r.copy())
      } else if (rowOrd.compare(r, buf.head) < 0) {
        buf.dequeue(); buf.enqueue(r.copy())
      }
    }
    buf
  }

  override def merge(buf: mutable.PriorityQueue[InternalRow],
                     other: mutable.PriorityQueue[InternalRow]): mutable.PriorityQueue[InternalRow] = {
    other.foreach { r =>
      if (buf.size < k) buf.enqueue(r)
      else if (rowOrd.compare(r, buf.head) < 0) { buf.dequeue(); buf.enqueue(r) }
    }
    buf
  }

  override def eval(buf: mutable.PriorityQueue[InternalRow]): Any =
    new GenericArrayData(buf.toArray.sorted(rowOrd).asInstanceOf[Array[Any]])

  @transient private lazy val proj = UnsafeProjection.create(fieldTypes)

  override def serialize(buf: mutable.PriorityQueue[InternalRow]): Array[Byte] = {
    val rows = buf.toArray.map(r => proj(r).copy())
    val size = 4 + rows.map(4 + _.getSizeInBytes).sum
    val bb = java.nio.ByteBuffer.allocate(size)
    bb.putInt(rows.length)
    rows.foreach { u =>
      bb.putInt(u.getSizeInBytes)
      u.writeTo(bb)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[InternalRow] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val arr = new Array[Byte](len)
      bb.get(arr)
      val u = new UnsafeRow(fieldTypes.length)
      u.pointTo(arr, len)
      buf.enqueue(u)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKRows =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKRows =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object TopKRows {
  /** Aggregate Column: bounded top-k of `structCol` (a struct whose first
    * `desc.length` fields are the sort key, descending where flagged). */
  def topKRows(structCol: Column, k: Int, desc: Seq[Boolean]): Column =
    Bridge.column(TopKRows(Bridge.expression(structCol), k, desc.length, desc)
      .toAggregateExpression())
}
