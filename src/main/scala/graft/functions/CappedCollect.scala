package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType}

/** `collect_list` with a hard per-group size cap — the memory-safe way to
  * build inverted-index posting lists (shingle → documents, LSH band →
  * members) on a corpus where one key can be pathologically hot.
  *
  * Semantics: the result array holds the group's values EXACTLY when the
  * group has `<= cap` of them; a hotter group saturates at `cap + 1`
  * elements (which elements survive is partition-order dependent). Callers
  * that drop over-cap groups — every document-frequency-capped dedup path
  * here — therefore lose nothing: `size(ids) > cap` identifies the group as
  * over-cap, and for every kept group the list is complete. The built-in
  * `collect_list` materializes ALL values per key first, so a single
  * boilerplate shingle shared by 10^8 documents is an executor OOM; this
  * aggregate's buffer is O(cap) per group on the map side, in the shuffle,
  * and in the reduce, no matter how skewed the key.
  *
  * Element order is NOT deterministic (same as collect_list across a
  * shuffle) — sort the result if order matters downstream.
  */
case class CappedCollect(
    child: Expression,
    cap: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayBuffer[Any]] {

  require(cap > 0, "cap must be positive")

  // saturation point: one past the cap is enough to prove "over cap"
  private def limit: Int = cap + 1

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)

  override def createAggregationBuffer(): mutable.ArrayBuffer[Any] =
    new mutable.ArrayBuffer[Any](8)

  override def update(buf: mutable.ArrayBuffer[Any],
                      input: InternalRow): mutable.ArrayBuffer[Any] = {
    if (buf.size < limit) {
      val v = child.eval(input)
      if (v != null) buf += InternalRow.copyValue(v)
    }
    buf
  }

  override def merge(buf: mutable.ArrayBuffer[Any],
                     other: mutable.ArrayBuffer[Any]): mutable.ArrayBuffer[Any] = {
    val it = other.iterator
    while (buf.size < limit && it.hasNext) buf += it.next()
    buf
  }

  override def eval(buf: mutable.ArrayBuffer[Any]): Any =
    new GenericArrayData(buf.toArray)

  @transient private lazy val proj = UnsafeProjection.create(Array(child.dataType))
  @transient private lazy val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)

  override def serialize(buf: mutable.ArrayBuffer[Any]): Array[Byte] = {
    val rows = buf.toArray.map { v =>
      row.update(0, v)
      proj(row).copy()
    }
    val size = 4 + rows.map(4 + _.getSizeInBytes).sum
    val bb = java.nio.ByteBuffer.allocate(size)
    bb.putInt(rows.length)
    rows.foreach { u => bb.putInt(u.getSizeInBytes); u.writeTo(bb) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[Any] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val arr = new Array[Byte](len)
      bb.get(arr)
      val u = new UnsafeRow(1)
      u.pointTo(arr, len)
      buf += InternalRow.copyValue(u.get(0, child.dataType))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CappedCollect =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CappedCollect =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object CappedCollect {
  /** Aggregate Column: collect up to `cap` values per group, saturating at
    * `cap + 1` (see class doc for the exact-below-cap contract). */
  def cappedCollect(c: Column, cap: Int): Column =
    Bridge.column(CappedCollect(Bridge.expression(c), cap).toAggregateExpression())
}
