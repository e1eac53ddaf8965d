package graft

import org.scalatest.funsuite.AnyFunSuite

/** Cross-query containment invariants for the semantic-dedup family. */
class SemDedupSpec extends AnyFunSuite {
  import SparkTestSession._

  test("e11's cell-restricted pairs are a subset of e02's exact near-dup " +
       "pairs (same threshold; clustering only restricts candidates)") {
    def pairs(q: String) = SparkEntry.queries(q)(spark, sf)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val e11 = pairs("e11_semdedup_kmeans")
    val e02 = pairs("e02_cosine_neardup")
    assert(e11.nonEmpty, "vacuous: no within-cell near pairs in the fixture")
    assert(e11.subsetOf(e02),
      "a within-cell pair failed the global exact threshold: " +
        (e11 -- e02).take(5))
    // and the restriction must actually bite (some cross-cell pair exists),
    // else the fixture cannot distinguish e11 from e02
    assert(e11 != e02, "fixture degenerate: clustering restricted nothing")
  }
}
