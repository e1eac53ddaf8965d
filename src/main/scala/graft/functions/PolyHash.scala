package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling hash over a string's UTF-8 bytes:
  * `h_i = h_{i-1} * base + b_i` in wrapping 64-bit arithmetic.
  *
  * The rolling property (`h(s[1..n]) = h(s[0..n-1])*base + b_n -
  * b_0*base^n`) is what makes it the classic document-fingerprinting
  * primitive (winnowing k-gram hashes): consecutive window hashes differ by
  * O(1) work. As a Catalyst expression it codegens to a tight byte loop —
  * fingerprinting is a shuffle-free projection over the corpus scan.
  */
case class PolyHash(child: Expression, base: Long)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) { h = h * base + (bytes(i) & 0xffL); i += 1 }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long $h = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h = $h * ${base}L + ($bytes[$i] & 0xffL);
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PolyHash {
  /** Default base: a large odd multiplier with good avalanche in practice. */
  val DefaultBase: Long = 1099511628211L // FNV-64 prime

  def polyHash(c: Column, base: Long = DefaultBase): Column =
    Bridge.column(PolyHash(Bridge.expression(c), base))
}
