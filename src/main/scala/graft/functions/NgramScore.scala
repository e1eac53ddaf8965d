package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** fastText-style linear quality scorer: hashed word uni+bigram features
  * against a broadcast integer weight table, one codegen'd pass per
  * document (the quality gate of a curation funnel — scores at scan speed,
  * no explode, no shuffle; the model rides the plan as a reference object,
  * i.e. broadcast once per executor, never per row).
  *
  * Everything is INTEGER so the score is bit-identical across engines and
  * partitionings (the repo's d19 float policy): feature bucket =
  * first-60-bits(md5(feature)) mod dim, weight lookup, plain long sum.
  * Tokenization mirrors the corpus-wide whitespace rule (trim, split \s+,
  * drop empties); bigram features are "tokᵢ tokᵢ₊₁". The md5 bucketing is
  * what lets a DuckDB oracle reproduce the scores exactly — the one hash
  * family both engines share (same device as d06/d07).
  *
  * The reference has no trained-model scoring; its nearest analogs are the
  * static QC threshold checks (e.g. barcode QC in
  * check_sequence_index_barcodes.py). This is the beyond-reference
  * LLM-pipeline operator the curation funnel (d18) consumes.
  */
case class HashedNgramScore(child: Expression, model: NgramScoreFn.Model)
    extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("score", LongType, nullable = false),
    StructField("n_feats", IntegerType, nullable = false)))
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    NgramScoreFn.score(input.asInstanceOf[UTF8String], model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("ngramModel", model, classOf[NgramScoreFn.Model].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NgramScoreFn.score($c, $m);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NgramScoreFn {

  /** Broadcast model: `weights(bucket)` integer weights, additive `bias`.
    * `dim` is `weights.length`. Train offline however you like (fastText,
    * logistic regression on hashed features) and quantize the weights to
    * integers at whatever scale — the gate compares integer sums. */
  final case class Model(weights: IndexedSeq[Long], bias: Long,
                         bigrams: Boolean = true) {
    @transient lazy val wArr: Array[Long] = weights.toArray
    require(weights.nonEmpty, "empty weight table")
  }

  private val md5Local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** First 60 bits of md5(s) as a non-negative long — exactly DuckDB's
    * digit-sum over the first 15 hex chars (TextQ.hexToBigint(…, 15)). */
  def md5Top60(s: String): Long = {
    val d = md5Local.get()
    d.reset()
    val b = d.digest(s.getBytes("UTF-8"))
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (b(i) & 0xffL); i += 1 }
    (v << 4) | ((b(7) & 0xffL) >>> 4)
  }

  /** First 32 bits of md5(s) (TextQ.hexToBigint(…, 8)) — used by the
    * seeded demo weight table. */
  def md5Top32(s: String): Long = {
    val d = md5Local.get()
    d.reset()
    val b = d.digest(s.getBytes("UTF-8"))
    ((b(0) & 0xffL) << 24) | ((b(1) & 0xffL) << 16) |
      ((b(2) & 0xffL) << 8) | (b(3) & 0xffL)
  }

  /** One pass: tokenize, hash each unigram (and bigram) to a bucket, sum
    * weights. Returns (score, n_feats); an all-whitespace document scores
    * `bias` with 0 features. Called from generated code. */
  def score(text: UTF8String, m: Model): InternalRow = {
    val toks = text.toString.trim.split("\\s+").filter(_.nonEmpty)
    val dim = m.wArr.length
    var s = m.bias
    var n = 0
    var i = 0
    while (i < toks.length) {
      s += m.wArr((md5Top60(toks(i)) % dim).toInt)
      n += 1
      if (m.bigrams && i + 1 < toks.length) {
        s += m.wArr((md5Top60(toks(i) + " " + toks(i + 1)) % dim).toInt)
        n += 1
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](s, n))
  }
}

object NgramScore {
  /** Column wrapper: codegen'd hashed-n-gram score, struct(score, n_feats). */
  def hashedNgramScore(text: Column, model: NgramScoreFn.Model): Column =
    Bridge.column(HashedNgramScore(Bridge.expression(text), model))
}
