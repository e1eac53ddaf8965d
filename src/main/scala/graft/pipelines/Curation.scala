package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.MinHashLsh
import graft.text.TextMetrics

/** End-to-end training-data curation: quality filter → exact dedup →
  * near-dup removal — the composition a 100 TB pretraining pipeline runs,
  * built from this library's operators.
  *
  * Near-dup removal keeps each pair's lower doc id (greedy by id): every
  * doc named as `id_b` of a near-dup pair is dropped. This is the standard
  * linear-pass approximation of connected-component dedup — chains collapse
  * onto their minimum id if the pairs are transitive at the threshold.
  */
object Curation {

  final case class Report(
      nInput: Long, nAfterQuality: Long, nAfterExact: Long, nAfterNearDup: Long)

  def curate(docs: DataFrame, idCol: String, textCol: String,
             minQuality: Double = 0.3,
             minEstJaccard: Double = 0.5): (DataFrame, Report) = {
    val nInput = docs.count()

    // 1. quality gate (tokens materialized once)
    val scored = docs
      .withColumn("__toks", TextMetrics.tokens(col(textCol)))
      .withColumn("__q", TextMetrics.qualityScoreFromTokens(col("__toks"), col(textCol)))
      .filter(col("__q") >= minQuality)
      .drop("__toks")
    val nQuality = scored.count()

    // 2. exact dedup: canonical (minimum) id per fingerprint
    val canonical = scored
      .withColumn("__fp", TextMetrics.fingerprint(col(textCol)))
      .withColumn("__keep", min(col(idCol)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("__fp"))))
      .filter(col(idCol) === col("__keep"))
      .drop("__fp", "__keep")
    val nExact = canonical.count()

    // 3. near-dup removal via MinHash LSH (drop the higher id of each pair)
    val pairs = MinHashLsh.nearDuplicates(canonical, idCol, textCol, minEstJaccard)
    val drop = pairs.select(col("id_b").as(idCol)).distinct()
    val survivors = canonical.join(drop, Seq(idCol), "left_anti").drop("__q")
    val nNear = survivors.count()

    (survivors, Report(nInput, nQuality, nExact, nNear))
  }
}
