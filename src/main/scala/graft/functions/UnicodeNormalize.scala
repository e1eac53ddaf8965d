package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (NFC/NFD/NFKC/NFKD) as a Catalyst expression.
  *
  * Web scrape mixes composed and decomposed encodings of the same visible
  * text ("é" as U+00E9 vs "e"+U+0301); every downstream exact-dedup key,
  * shingle hash, and vocabulary count treats them as different strings
  * unless the corpus is normalized first. NFC is the curation default;
  * NFKC additionally folds compatibility forms (ligatures, full-width
  * digits) and is common before tokenizer training. Spark has no built-in
  * (`lower`/`translate` don't touch combining marks), so this wraps
  * `java.text.Normalizer` — the result is defined by the Unicode standard,
  * which is what makes a cross-engine oracle possible at all (DuckDB's
  * `nfc_normalize` must agree on any codepoint both JVMs know).
  *
  * Codegen: the JDK call dominates, so the generated code is a direct
  * static-helper invocation — the expression stays inside WholeStageCodegen
  * (no interpreted fallback splitting the projection) and the common
  * all-ASCII case exits on a cheap `isNormalized` scan without allocating.
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {

  private val normForm = Normalizer.Form.valueOf(form) // fail fast at plan time

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    UnicodeNormalize.normalize(input.asInstanceOf[UTF8String], normForm.name())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.UnicodeNormalize.normalize($c, "${normForm.name()}");""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnicodeNormalize {

  /** Static helper shared by eval and codegen. ASCII (and already-
    * normalized) inputs return the input object unchanged. */
  def normalize(s: UTF8String, form: String): UTF8String = {
    val f = Normalizer.Form.valueOf(form)
    val str = s.toString
    if (Normalizer.isNormalized(str, f)) s
    else UTF8String.fromString(Normalizer.normalize(str, f))
  }

  def nfc(c: Column): Column  = withForm(c, "NFC")
  def nfkc(c: Column): Column = withForm(c, "NFKC")

  def withForm(c: Column, form: String): Column =
    Bridge.column(UnicodeNormalize(Bridge.expression(c), form))
}
