package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass trigram language scoring — the native twin of
  * [[graft.text.LangId.classify]]'s explode → broadcast-join → hash-agg
  * pipeline (proven score-identical in LangIdNativeSpec).
  *
  * The join formulation is the right shape when the profile is a TABLE
  * (pluggable, trainable, joinable); but it pays one generate (a row per
  * character), one broadcast probe per trigram, and one hash-agg shuffle
  * per document. When the profile is fixed at plan time, the whole
  * classification is a scalar function of the text: this expression scans
  * the normalized string's code points once, looks each trigram up in a
  * compiled hash map, and accumulates the per-language score vector in a
  * primitive array — shuffle-free, generate-free, at scan speed.
  *
  * Input must be the ALREADY-NORMALIZED string ([[graft.text.LangId.normalized]]):
  * keeping normalization in the declarative layer means the two paths
  * share it verbatim. Code-point indexing matches Spark's `substr` char
  * semantics (NOT Java UTF-16 chars — supplementary-plane characters are
  * one position, covered in the parity spec).
  *
  * Returns struct(n_trigrams int, scores array<long>) with scores in
  * `langs` order.
  */
case class TrigramLangScores(child: Expression, langs: Seq[String],
                             entries: Seq[(String, Int, Int)])
    extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_trigrams", IntegerType, nullable = false),
    StructField("scores", ArrayType(LongType, containsNull = false), nullable = false)))

  override def nullIntolerant: Boolean = true

  @transient private lazy val table: java.util.HashMap[String, Array[Long]] = {
    val m = new java.util.HashMap[String, Array[Long]]()
    entries.foreach { case (g, li, w) =>
      val v = m.computeIfAbsent(g, _ => new Array[Long](langs.size))
      v(li) += w
    }
    m
  }

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val cps = s.codePoints().toArray
    val n = math.max(cps.length - 2, 0)
    val scores = new Array[Long](langs.size)
    var i = 0
    while (i < n) {
      val v = table.get(new String(cps, i, 3))
      if (v != null) {
        var l = 0
        while (l < scores.length) { scores(l) += v(l); l += 1 }
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](n, new GenericArrayData(scores)))
  }

  // CodegenFallback-style: the heavy loop is compiled Scala either way;
  // a defineCodeGen call would need the expression instance reachable from
  // generated code (it carries the compiled profile table), so keep eval.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("trigramScorer", this)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $ref.score($c);")
  }

  /** Entry point for generated code. */
  def score(input: UTF8String): Any = nullSafeEval(input)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TrigramLangScoresFn {
  /** Column over a NORMALIZED text column; profile compiled from
    * (lang, trigram, weight) rows with langs in sorted order. */
  def trigramLangScores(norm: Column, profiles: Seq[(String, String, Int)]): Column = {
    val langs = profiles.map(_._1).distinct.sorted
    val idx = langs.zipWithIndex.toMap
    val entries = profiles.map { case (l, g, w) => (g, idx(l), w) }
    Bridge.column(TrigramLangScores(Bridge.expression(norm), langs, entries))
  }
}
