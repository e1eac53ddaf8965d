package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** One-pass MinHash signature aggregate.
  *
  * Input: the shingle's base hash `x` (a long, already reduced mod p).
  * Buffer: a primitive long[k] of running minima — each input row updates
  * all k affine hashes `(a_i*x + b_i) mod p` in a tight loop, partial
  * buffers merge with elementwise min, so the signature is computed in ONE
  * map-side-combinable aggregation with an 8k-byte buffer. The
  * k-separate-`min()`-columns formulation this replaces carries k
  * independent aggregate states through codegen'd row buffers; at k=128+
  * the single primitive-array buffer wins on both memory and update cost.
  *
  * The hash family must match [[graft.dedup.MinHashLsh.hashFamily]] —
  * both derive from the same seeded PRNG, so signatures are identical.
  */
case class MinHashSig(
    child: Expression,
    numHashes: Int,
    seed: Long,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  private val P = 2147483647L // 2^31 - 1, matches MinHashLsh

  @transient private lazy val family: Array[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(numHashes)((1L + rnd.nextInt((P - 1).toInt).toLong,
      rnd.nextInt(P.toInt).toLong))
  }

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Long]
      var i = 0
      while (i < numHashes) {
        val (a, b) = family(i)
        val h = (a * x + b) % P
        if (h < buf(i)) buf(i) = h
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) { if (other(i) < buf(i)) buf(i) = other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * numHashes)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(numHashes)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashSig =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashSig =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object MinHashSig {
  /** Aggregate Column: minhash signature of the grouped base hashes. */
  def minHashSig(c: Column, numHashes: Int, seed: Long): Column =
    Bridge.column(MinHashSig(Bridge.expression(c), numHashes, seed)
      .toAggregateExpression())
}
