package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass word n-gram hashing.
  *
  * The compositional shingle pipeline —
  * `array_distinct(transform(sequence(...), i => concat_ws(" ",
  * element_at(toks, ...))))` over a regex-split token array, then
  * `xxhash64(shingle)` — is correct but interpreted: higher-order functions
  * don't codegen, every element pays lambda dispatch, and each shingle
  * allocates an intermediate UTF8String. Profiled at sf0.1 the shingling
  * alone cost ~3 s and is re-evaluated once per consumer in the dedup DAG
  * (self-join sides, sizes, document frequency).
  *
  * This expression does the whole thing in one pass over the string's UTF8
  * bytes: tokenize on ASCII whitespace (Java regex `\s` = `[ \t\n\x0B\f\r]`
  * — multi-byte UTF-8 code points never collide with ASCII bytes, so
  * byte-level scanning is exact), assemble each n-gram with single spaces
  * into a reused buffer, and emit `xxhash64` (seed 42) of the same bytes
  * `concat_ws(" ", ...)` would produce — hashes are BIT-IDENTICAL to the
  * pipeline it replaces, so MinHash signatures and LSH buckets are
  * unchanged. `distinct=true` sorts and dedups (matching `array_distinct`
  * up to hash collisions, which the downstream join already tolerates).
  *
  * Reference semantics: word shingling for near-dup detection
  * (metadata_validation-adjacent curation; SURVEY LLM-ops). Tokenizer must
  * stay in lockstep with [[graft.text.TextMetrics.tokens]].
  */
case class ShingleHashes(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression {
  require(n >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    ShingleHashUtil.hashes(input.asInstanceOf[UTF8String], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ShingleHashUtil.hashes($c, $n, $distinct)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleHashUtil {
  // Java regex \s (ASCII): space, \t, \n, \x0B (vertical tab), \f, \r
  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  /** Distinct (or raw, in input order) xxhash64 values of the word n-grams
    * of `s`, identical to `xxhash64(concat_ws(' ', tok_i..tok_{i+n-1}))`. */
  def hashes(s: UTF8String, n: Int, distinct: Boolean): ArrayData = {
    val bytes = s.getBytes
    val len = bytes.length
    // token spans [start, end)
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
    if (m < n) return new GenericArrayData(Array.emptyLongArray)
    val count = m - n + 1
    val out = new Array[Long](count)
    // assembly buffer: shingle can never exceed source length (+ separators
    // already counted inside it)
    val buf = new Array[Byte](len + n)
    var k = 0
    while (k < count) {
      var p = 0
      var j = 0
      while (j < n) {
        if (j > 0) { buf(p) = ' '; p += 1 }
        val st = starts(k + j); val en = ends(k + j)
        System.arraycopy(bytes, st, buf, p, en - st)
        p += en - st
        j += 1
      }
      out(k) = XxHash64Function.hash(
        UTF8String.fromBytes(buf, 0, p), StringType, 42L)
      k += 1
    }
    if (!distinct) return new GenericArrayData(out)
    java.util.Arrays.sort(out)
    var uniq = 1
    var q = 1
    while (q < count) {
      if (out(q) != out(q - 1)) { out(uniq) = out(q); uniq += 1 }
      q += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, uniq))
  }
}

object ShingleHashesFn {
  /** Column: distinct xxhash64 n-gram hashes of a text column. */
  def shingleHashes(c: Column, n: Int, distinct: Boolean = true): Column =
    Bridge.column(ShingleHashes(Bridge.expression(c), n, distinct))
}
