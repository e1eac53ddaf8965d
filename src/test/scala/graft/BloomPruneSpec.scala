package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.BloomPrune

/** Bloom-pruned exact semi-join: result equality with the plain semi-join,
  * no false negatives, measured pruning, codegen'd probe. */
class BloomPruneSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("equals the plain left-semi join on the corpus") {
    val probe = docs.filter(col("doc_id") % 7 === 0)
      .select(col("text").as("probe_text"))
    val want = docs.join(probe, col("text") === col("probe_text"), "left_semi")
    val got = BloomPrune.semiJoin(docs, "text", probe, "probe_text",
      expectedItems = 100)
    assert(got.count() == want.count())
    assert(got.select("doc_id").except(want.select("doc_id")).isEmpty)
    assert(want.select("doc_id").except(got.select("doc_id")).isEmpty)
  }

  test("works when both sides name the key identically") {
    // the common semi-join shape: same column name on both sides used to
    // throw an ambiguous-reference AnalysisException before the internal
    // probe-key alias
    val probe = docs.filter(col("doc_id") % 7 === 0).select("text")
    val want = docs.filter(col("doc_id") % 7 === 0).count()
    val got = BloomPrune.semiJoin(docs, "text", probe, "text",
      expectedItems = 100)
    assert(got.count() >= want && got.count() > 0)
  }

  test("no false negatives even with an absurdly undersized filter") {
    val probe = docs.select(col("text").as("probe_text")) // everything matches
    val got = BloomPrune.semiJoin(docs, "text", probe, "probe_text",
      expectedItems = 2, fpp = 0.5) // tiny bloom, huge fpp
    assert(got.count() == docs.count())
  }

  test("the bloom actually prunes: survivors ~= matches + fpp of the rest") {
    val n = 100000L
    val big = spark.range(n).select(col("id").as("k"))
    val small = spark.range(50).select((col("id") * 2000).as("pk")) // 50 keys
    val bloom = BloomPrune.buildBloom(small, col("pk"), 50, 0.01)
    val survivors = big.filter(BloomPrune.mightContain(bloom, col("k"))).count()
    // 50 true hits + ~1% of 99950 false positives; allow 3x headroom
    assert(survivors >= 50, s"missed true keys: $survivors")
    assert(survivors <= 50 + (0.03 * n).toLong,
      s"bloom pruned nothing: $survivors of $n survive")
    // and the exact join removes every false positive
    val exact = BloomPrune.semiJoin(big, "k", small, "pk", 50, 0.01)
    assert(exact.count() == 50)
  }

  test("probe stays codegen'd in the scan filter (no UDF, no extra exchange)") {
    val small = spark.range(50).select((col("id") * 97).as("pk"))
    val bloom = BloomPrune.buildBloom(small, col("pk"), 50, 0.01)
    val plan = spark.range(10000).select(col("id").as("k"))
      .filter(BloomPrune.mightContain(bloom, col("k")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"bloom probe missing from plan:\n$plan")
    assert(!plan.contains("Exchange"), s"prefilter must not shuffle:\n$plan")
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
      s"probe must be native:\n$plan")
  }
}
