package graft.functions

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.text.Bpe

/** BPE-encode a text column with a trained [[graft.text.Bpe.Model]]:
  * whitespace words, each run through the greedy lowest-rank merge loop,
  * concatenated into one `array<string>` of subword tokens per document.
  *
  * The model rides into generated code as a plan reference
  * (`ctx.addReferenceObj`), so encoding is a shuffle-free codegen'd
  * projection over the corpus scan. A per-executor memo caches each
  * distinct word's encoding — corpora repeat words, so the merge loop
  * runs once per distinct word per executor, and every other occurrence
  * is a hash probe. The memo is bounded and cleared when full (encoding
  * is pure; a cleared cache only costs recomputation).
  */
case class BpeEncode(child: Expression, model: Bpe.Model)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    BpeEncode.encode(input.asInstanceOf[UTF8String], model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val modelRef = ctx.addReferenceObj("bpeModel", model, classOf[Bpe.Model].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.BpeEncode.encode($c, $modelRef);""")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** [[BpeEncode]]'s integer twin: subword TOKEN IDS per document
  * (`array<int>`), looked up in the model's stable vocabulary (sorted
  * alphabet, then merge products); symbols outside the vocabulary —
  * text containing characters unseen at training time — map to
  * `model.unkId`. This is the column a training pipeline actually
  * materializes. */
case class BpeEncodeIds(child: Expression, model: Bpe.Model)
    extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    BpeEncode.encodeIds(input.asInstanceOf[UTF8String], model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val modelRef = ctx.addReferenceObj("bpeModel", model, classOf[Bpe.Model].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.BpeEncode.encodeIds($c, $modelRef);""")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeEncode {

  private val MaxMemo = 1 << 16

  /** Max distinct models memoized per executor JVM before a full reset —
    * long-lived executors running many models must not grow without bound
    * (Model.hashCode is cached, so the per-row key cost is O(1)). */
  private val MaxModels = 8

  /** word → encoded symbols, per (executor, model). Keyed by the model's
    * identity: two models in one JVM (e.g. tests) must not cross-hit. */
  private val memos =
    new ConcurrentHashMap[Bpe.Model, ConcurrentHashMap[String, Array[UTF8String]]]()

  /** word → token ids, same contract as [[memos]]. */
  private val idMemos =
    new ConcurrentHashMap[Bpe.Model, ConcurrentHashMap[String, Array[Int]]]()

  def encode(text: UTF8String, model: Bpe.Model): ArrayData = {
    if (memos.size >= MaxModels && !memos.containsKey(model)) memos.clear()
    val memo = memos.computeIfAbsent(model,
      _ => new ConcurrentHashMap[String, Array[UTF8String]]())
    val words = text.toString.trim.split("\\s+")
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    var i = 0
    while (i < words.length) {
      val w = words(i)
      if (w.nonEmpty) {
        var enc = memo.get(w)
        if (enc == null) {
          enc = model.encodeWord(w).map(UTF8String.fromString)
          if (memo.size >= MaxMemo) memo.clear()
          memo.put(w, enc)
        }
        out ++= enc
      }
      i += 1
    }
    new GenericArrayData(out.toArray[Any])
  }

  def encodeIds(text: UTF8String, model: Bpe.Model): ArrayData = {
    if (idMemos.size >= MaxModels && !idMemos.containsKey(model)) idMemos.clear()
    val memo = idMemos.computeIfAbsent(model,
      _ => new ConcurrentHashMap[String, Array[Int]]())
    val words = text.toString.trim.split("\\s+")
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    var i = 0
    while (i < words.length) {
      val w = words(i)
      if (w.nonEmpty) {
        var enc = memo.get(w)
        if (enc == null) {
          enc = model.encodeWord(w)
            .map(s => model.tokenIds.getOrElse(s, model.unkId))
          if (memo.size >= MaxMemo) memo.clear()
          memo.put(w, enc)
        }
        out ++= enc
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  def bpeEncode(c: Column, model: Bpe.Model): Column =
    Bridge.column(BpeEncode(Bridge.expression(c), model))

  def bpeEncodeIds(c: Column, model: Bpe.Model): Column =
    Bridge.column(BpeEncodeIds(Bridge.expression(c), model))
}
