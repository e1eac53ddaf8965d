package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-statistics fluency scoring — the n-gram-LM quality proxy
  * (the Gopher/C4 pipelines filter on a language-model signal; the
  * shape of that signal, minus the neural model, is "how typical are
  * this document's transitions of the corpus"). A document's score is
  * the mean conditional bigram probability
  * `P(w2 | w1) = count(w1 w2) / count(w1 ·)` over its token stream,
  * in scaled-INTEGER arithmetic: `(count(bigram) · S) div
  * count(prefix)`, integer-averaged per document — no logs, no floats,
  * so the score is bit-identical on any engine (the d09 tf-idf design
  * rule) while ordering documents the same way a log-prob mean would
  * order nearly-uniform-length ones. Boilerplate-heavy or repetitive
  * docs score HIGH, word-soup scores LOW — both tails are curation
  * signals.
  *
  * Scale shape: one generator pass over the corpus (bigram instances),
  * two vocabulary²-bounded count aggregations, one join back keyed by
  * bigram (AQE broadcasts the counts when they fit), one per-document
  * aggregation. No stage holds more than the corpus's bigram instances.
  */
object Fluency {

  val Scale = 1000000L

  /** (id, n_bigrams, fluency) per document; docs with < 2 tokens get
    * (0, 0). */
  def bigramFluency(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val base = df
      .select(col(idCol), TextMetrics.tokens(col(textCol)).as("__toks"))
      .select(col(idCol), expr(
        // size < 2 must short-circuit: sequence(1, 0) is the DESCENDING
        // [1, 0] and element_at(toks, 0) throws
        """CASE WHEN size(__toks) >= 2 THEN
          |  transform(sequence(1, size(__toks) - 1),
          |    i -> struct(element_at(__toks, i) AS w1, element_at(__toks, i + 1) AS w2))
          |ELSE CAST(array() AS array<struct<w1:string,w2:string>>) END
          |""".stripMargin).as("__bgs"))
      // explode_outer: keeps empty docs AND keeps InferFiltersFromGenerate
      // from re-inlining the interpreted bigram lambda below (the d15
      // lesson — the inferred size(__bgs) > 0 filter is the same trap)
      .select(col(idCol), explode_outer(col("__bgs")).as("bg"))
      .select(col(idCol), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val bigramCounts = base.where(col("w1").isNotNull)
      .groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
    val prefixCounts = base.where(col("w1").isNotNull)
      .groupBy("w1").agg(count(lit(1)).as("cp"))
    val scored = base
      .join(bigramCounts, Seq("w1", "w2"), "left")
      .join(prefixCounts, Seq("w1"), "left")
      .withColumn("s", expr(s"(cb * ${Scale}L) div cp"))
    scored.groupBy(col(idCol))
      .agg(
        count(col("s")).as("n_bigrams"),
        coalesce(expr("sum(s) div greatest(count(s), 1)"), lit(0L)).as("fluency"))
  }
}
