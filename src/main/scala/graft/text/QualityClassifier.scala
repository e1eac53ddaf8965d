package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{NgramScore, NgramScoreFn}

/** The curation funnel's trained-model quality gate: a broadcast linear
  * model over hashed word n-grams (fastText-style), scored by the
  * codegen'd [[graft.functions.HashedNgramScore]] in one scan pass.
  *
  * At 100 TB this is the shape you want for model-based filtering: the
  * weight table (a few KB–MB) rides the serialized plan to every executor
  * once; scoring is a shuffle-free projection fused into whole-stage
  * codegen, so the gate adds ~zero cost to whatever scan feeds it. Scores
  * are integer sums (d19 float policy) — reproducible bit-for-bit across
  * engines, partitionings, and reruns.
  */
object QualityClassifier {

  /** Deterministic demo weights, derivable by any engine that has md5:
    * w(i) = first32bits(md5("w:" || i)) mod 2001 − 1000 ∈ [−1000, 1000].
    * Stands in for offline-trained quantized weights (the oracle query
    * recomputes the same table in SQL). */
  def seededModel(dim: Int = 1024, bias: Long = 0L): NgramScoreFn.Model =
    NgramScoreFn.Model(
      (0 until dim).map(i => NgramScoreFn.md5Top32("w:" + i) % 2001 - 1000),
      bias)

  /** struct(score, n_feats) for `textCol` under `model`. */
  def scoreCol(textCol: Column, model: NgramScoreFn.Model): Column =
    NgramScore.hashedNgramScore(textCol, model)

  /** Per-document scores: (idCol, score, n_feats, keep). Documents with no
    * tokens are dropped (no features → no evidence either way) — gated on
    * the cheap equivalent `trim(text) <> ''` BEFORE scoring: a filter on
    * `n_feats > 0` would be pushed below the projection and re-evaluate the
    * whole scoring expression a second time per row. */
  def scored(df: DataFrame, idCol: String, textCol: String,
             model: NgramScoreFn.Model, threshold: Long): DataFrame =
    df.filter(regexp_replace(col(textCol), "\\s", "") =!= "")
      .select(col(idCol), scoreCol(col(textCol), model).as("__s"))
      .select(col(idCol),
        col("__s.score").as("score"),
        col("__s.n_feats").as("n_feats"))
      .withColumn("keep", (col("score") >= threshold).cast("int"))

  /** Filter `df` to rows the model keeps — the one-liner a funnel stage
    * composes in front of dedup/sampling. */
  def gate(df: DataFrame, textCol: String,
           model: NgramScoreFn.Model, threshold: Long): DataFrame =
    df.filter(scoreCol(col(textCol), model).getField("score") >= threshold)
}
