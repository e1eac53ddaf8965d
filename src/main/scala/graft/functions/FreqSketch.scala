package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries frequent-items summary as a mergeable one-pass aggregate —
  * the shuffle-free scale path for heavy-hitter detection (d14's exact
  * boilerplate census shuffles one row per DISTINCT segment, which is
  * corpus-sized; this never ships more than `capacity` counters per
  * partition regardless of cardinality or skew).
  *
  * Buffer: at most `capacity` (item, count) counters. Update is the
  * classic algorithm (hit → increment; room → insert; full → decrement
  * all, dropping zeros — amortized O(1), each decrement refunds an
  * earlier insert). Merge follows Agarwal et al., "Mergeable Summaries"
  * (PODS'12): add counters pointwise, then subtract the (capacity+1)-th
  * largest count from everything and drop the non-positive remainder —
  * the summed error bounds add, so the combined guarantee survives ANY
  * merge tree, which is exactly what a partial-aggregation shuffle is.
  *
  * Guarantee (n = stream length): every item with true count >
  * n/(capacity+1) is present, and each reported count lower-bounds the
  * true count by at most n/(capacity+1). Output is (count desc, item asc)
  * sorted, so equal summaries render identically.
  */
case class FreqSketch(
    child: Expression,
    capacity: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(capacity > 0, "capacity must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("count", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"freq_sketch needs a string column, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long],
                      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[UTF8String].toString
      buf.get(key) match {
        case Some(c) => buf(key) = c + 1
        case None if buf.size < capacity => buf(key) = 1L
        case None => // full: decrement everything, evict zeros
          val dead = mutable.ArrayBuffer.empty[String]
          buf.mapValuesInPlace((_, c) => c - 1)
          buf.foreach { case (k, c) => if (c <= 0) dead += k }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(buf: mutable.HashMap[String, Long],
                     other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (k, c) => buf(k) = buf.getOrElse(k, 0L) + c }
    if (buf.size > capacity) {
      // subtract the (capacity+1)-th largest count; drop what hits zero
      val counts = buf.values.toArray
      java.util.Arrays.sort(counts)
      val sub = counts(counts.length - capacity - 1)
      val dead = mutable.ArrayBuffer.empty[String]
      buf.mapValuesInPlace((_, c) => c - sub)
      buf.foreach { case (k, c) => if (c <= 0) dead += k }
      dead.foreach(buf.remove)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val rows = buf.toArray.sortBy { case (k, c) => (-c, k) }.map { case (k, c) =>
      InternalRow(UTF8String.fromString(k), c)
    }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val items = buf.toArray
    val bytes = items.map { case (k, _) => k.getBytes("UTF-8") }
    val size = 4 + bytes.map(b => 4 + b.length + 8).sum
    val bb = java.nio.ByteBuffer.allocate(size)
    bb.putInt(items.length)
    items.zip(bytes).foreach { case ((_, c), b) =>
      bb.putInt(b.length); bb.put(b); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val arr = new Array[Byte](len)
      bb.get(arr)
      buf(new String(arr, "UTF-8")) = bb.getLong
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object FreqSketch {
  /** Aggregate Column: Misra-Gries summary of `c` with `capacity`
    * counters. Result: `array<struct<item,count>>`, (count desc, item)
    * sorted; counts lower-bound truth by at most n/(capacity+1). */
  def freqSketch(c: Column, capacity: Int): Column =
    Bridge.column(FreqSketch(Bridge.expression(c), capacity)
      .toAggregateExpression())
}
