package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass md5 MinHash signature of a text column — the fused form of
  * `explodeShingles → md5BaseHash → MinHashSig` (the d06/d26 signature
  * pass), per document in a single expression: no shingle-row explosion,
  * no aggregate, no exchange. The [[ShingleHashes]]/[[WinnowFps]]
  * precedent applied to the minhash pipeline.
  *
  * Bit-identical derivation, stage for stage:
  *   - tokens: `filter(split(trim(text), "\\s+"), _ != "")` — non-empty
  *     whitespace-separated runs; scanned byte-level (Java regex `\s` is
  *     the six ASCII whitespace bytes, and UTF-8 continuation bytes are
  *     ≥ 0x80, so a byte scan is exact — [[ShingleHashUtil]]'s argument);
  *   - shingle strings: `concat_ws(" ", tok_i..tok_{i+n-1})` (the
  *     `array_distinct` in the exploded form is irrelevant here — minima
  *     are idempotent to duplicates);
  *   - base hash: `pmod(conv(substring(md5(s), 1, 15), 16, 10), P)` — the
  *     first 15 hex chars of the digest are the big-endian first 8 bytes
  *     shifted right 4 (a 60-bit non-negative value, so conv+cast is
  *     exact and pmod is plain %);
  *   - signature: elementwise min over the [[MinHashSig]] affine family
  *     `(a_i·x + b_i) mod P`, same seeded PRNG draw.
  *
  * A document with fewer than n tokens has NO shingle rows in the
  * exploded form and is absent from the aggregated signature table; this
  * expression returns NULL for it — callers filter, restoring the exact
  * row set. */
case class Md5MinHashSig(child: Expression, n: Int, numHashes: Int, seed: Long)
    extends UnaryExpression {

  require(n >= 1 && numHashes >= 1)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  // same draw as MinHashSig / MinHashLsh.hashFamily
  @transient private lazy val family: (Array[Long], Array[Long]) = {
    val P = Md5MinHashUtil.P
    val rnd = new scala.util.Random(seed)
    val pairs = Array.fill(numHashes)((1L + rnd.nextInt((P - 1).toInt).toLong,
      rnd.nextInt(P.toInt).toLong))
    (pairs.map(_._1), pairs.map(_._2))
  }

  override protected def nullSafeEval(input: Any): Any =
    Md5MinHashUtil.sig(input.asInstanceOf[UTF8String], n,
      family._1, family._2)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val aRef = ctx.addReferenceObj("a", family._1, "long[]")
      val bRef = ctx.addReferenceObj("b", family._2, "long[]")
      s"""
         |${ev.value} = graft.functions.Md5MinHashUtil.sig($c, $n, $aRef, $bRef);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5MinHashUtil {
  val P = 2147483647L // 2^31 - 1, matches MinHashLsh

  // one MD5 instance per thread; reset() per shingle
  private val mdTl = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  /** MinHash signature (long[numHashes] minima) of the word n-grams of
    * `s`, or null when the document has fewer than n tokens. */
  def sig(s: UTF8String, n: Int, a: Array[Long], b: Array[Long]): ArrayData = {
    val bytes = s.getBytes
    val len = bytes.length
    var m = 0
    var starts = new Array[Int](16)
    var ends = new Array[Int](16)
    var i = 0
    while (i < len) {
      while (i < len && isWs(bytes(i))) i += 1
      if (i < len) {
        val st = i
        while (i < len && !isWs(bytes(i))) i += 1
        if (m == starts.length) {
          starts = java.util.Arrays.copyOf(starts, m * 2)
          ends = java.util.Arrays.copyOf(ends, m * 2)
        }
        starts(m) = st; ends(m) = i; m += 1
      }
    }
    if (m < n) return null
    val k = a.length
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, Long.MaxValue)
    val md = mdTl.get()
    val buf = new Array[Byte](len + n)
    val count = m - n + 1
    var sh = 0
    while (sh < count) {
      var p = 0
      var j = 0
      while (j < n) {
        if (j > 0) { buf(p) = ' '; p += 1 }
        val st = starts(sh + j); val en = ends(sh + j)
        System.arraycopy(bytes, st, buf, p, en - st)
        p += en - st
        j += 1
      }
      md.reset()
      md.update(buf, 0, p)
      val d = md.digest()
      // first 15 hex chars == big-endian first 8 bytes >>> 4 (60 bits)
      val be = ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
        ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
        ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
        ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
      val x = (be >>> 4) % P
      var h = 0
      while (h < k) {
        val v = (a(h) * x + b(h)) % P
        if (v < sig(h)) sig(h) = v
        h += 1
      }
      sh += 1
    }
    new GenericArrayData(sig)
  }
}

object Md5MinHashSigFn {
  /** Column: one-pass md5 minhash signature (null below n tokens). */
  def md5MinHashSig(text: Column, n: Int, numHashes: Int, seed: Long): Column =
    Bridge.column(Md5MinHashSig(Bridge.expression(text), n, numHashes, seed))
}
