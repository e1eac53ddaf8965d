package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass winnowing fingerprints (the native twin of
  * [[graft.text.Winnowing.fingerprintsFromHashes]], proven bit-identical in
  * WinnowFpsSpec).
  *
  * The compositional formulation — transform over window starts, a fold
  * per window — is interpreted per element: at sf0.1 it costs ~8 s, almost
  * all lambda dispatch, UTF8String comparisons, and per-step struct
  * allocation. This expression does the whole document in compiled Scala:
  *
  *  - char-boundary byte offsets computed once (UTF-8 exact, O(bytes));
  *  - md5 of each k-gram's bytes; the first 6 DIGEST bytes as an unsigned
  *    48-bit Long — the numeric order of that Long IS the lexicographic
  *    order of the 12-char lowercase-hex prefix the declarative pipeline
  *    compares, so the winnow runs on primitive longs;
  *  - sliding-window minimum with a monotonic deque (pop `>=` from the
  *    back, so on ties the newest index survives = the paper's RIGHTMOST
  *    tie rule), O(m) total instead of O(m·w);
  *  - hex strings materialized ONLY for selected fingerprints (~2/(w+1)
  *    of positions), with consecutive duplicate picks collapsed — a
  *    position can only repeat while it stays in the window, so adjacent
  *    dedup equals array_distinct here, in the same first-occurrence order.
  */
case class WinnowFps(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k >= 1 && w >= 1, "k-gram size and window must be >= 1")

  override def dataType: DataType = WinnowFpsUtil.schema
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    WinnowFpsUtil.fingerprints(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WinnowFpsUtil.fingerprints($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowFpsUtil {
  val schema: DataType = ArrayType(
    StructType(Seq(
      StructField("pos", IntegerType, nullable = false),
      StructField("fp", StringType, nullable = false))),
    containsNull = false)

  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  private val HexChars = "0123456789abcdef".toCharArray

  /** First 6 md5-digest bytes of bytes[from, until) as an unsigned long. */
  private def hash48(bytes: Array[Byte], from: Int, until: Int): Long = {
    val d = md5.get()
    d.reset()
    d.update(bytes, from, until - from)
    val dig = d.digest()
    ((dig(0) & 0xffL) << 40) | ((dig(1) & 0xffL) << 32) |
      ((dig(2) & 0xffL) << 24) | ((dig(3) & 0xffL) << 16) |
      ((dig(4) & 0xffL) << 8) | (dig(5) & 0xffL)
  }

  /** 12-char lowercase hex of a 48-bit value — exactly
    * substring(md5-hex, 1, 12) of the same digest. */
  private def hex12(v: Long): UTF8String = {
    val out = new Array[Byte](12)
    var i = 0
    while (i < 12) {
      out(i) = HexChars(((v >>> ((11 - i) * 4)) & 0xf).toInt).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  def fingerprints(s: UTF8String, k: Int, w: Int): ArrayData = {
    val bytes = s.getBytes
    val nBytes = bytes.length
    // char-boundary byte offsets (UTF-8: leading byte determines width)
    var nChars = 0
    var offs = new Array[Int](math.max(16, nBytes + 1))
    var b = 0
    while (b < nBytes) {
      offs(nChars) = b
      b += UTF8String.numBytesForFirstByte(bytes(b))
      nChars += 1
    }
    offs(nChars) = nBytes
    val m = nChars - k + 1 // k-gram count
    if (m < w) return new GenericArrayData(Array.empty[Any])

    val h = new Array[Long](m)
    var i = 0
    while (i < m) {
      h(i) = hash48(bytes, offs(i), offs(i + k))
      i += 1
    }

    // monotonic deque of indices; values strictly increase front->back.
    // Popping `>=` on insert makes the newest of equal values survive,
    // so the front is the RIGHTMOST minimum of the current window.
    val dq = new Array[Int](m)
    var head = 0
    var tail = 0 // exclusive
    val picksPos = new Array[Int](m)
    var nPicks = 0
    i = 0
    while (i < m) {
      while (tail > head && h(dq(tail - 1)) >= h(i)) tail -= 1
      dq(tail) = i; tail += 1
      if (dq(head) <= i - w) head += 1
      if (i >= w - 1) {
        val pick = dq(head)
        if (nPicks == 0 || picksPos(nPicks - 1) != pick) {
          picksPos(nPicks) = pick; nPicks += 1
        }
      }
      i += 1
    }

    val rows = new Array[Any](nPicks)
    var p = 0
    while (p < nPicks) {
      val pos = picksPos(p)
      rows(p) = new GenericInternalRow(
        Array[Any](pos + 1, hex12(h(pos)))): InternalRow
      p += 1
    }
    new GenericArrayData(rows)
  }
}

object WinnowFpsFn {
  /** Column: winnowing fingerprints array<struct<pos,fp>> of a text column. */
  def winnowFps(c: Column, k: Int, w: Int): Column =
    Bridge.column(WinnowFps(Bridge.expression(c), k, w))
}
