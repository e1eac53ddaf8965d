package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression tests: the 100 TB story depends on these plans
  * keeping their shape (pushdown, pruning, broadcast, codegen), so assert
  * it — a future edit that silently drops a broadcast or widens a scan
  * fails here, not on a cluster. */
class PlanQualitySpec extends AnyFunSuite {
  import SparkTestSession._

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("semi-join pushes the price filter into the orders scan") {
    val p = plan("q03_semi_join")
    assert(p.contains("PushedFilters: [IsNotNull(o_totalprice), GreaterThan(o_totalprice,200000.0)"), p)
    assert(p.contains("LeftSemi"), p)
  }

  test("lineage join broadcasts every dimension") {
    val p = plan("q02_lineage_join")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), "dimensions should broadcast at this scale\n" + p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("scans are column-pruned to what the query needs") {
    val p = plan("q16_value_counts")
    assert(p.contains("ReadSchema: struct<o_custkey:bigint,o_orderpriority:string>"), p)
  }

  test("FK lookup stays a broadcast join") {
    val p = plan("q27_fk_lookup")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("token stats are a shuffle-free pruned projection") {
    // (array-lambda HOFs keep the projection itself out of whole-stage
    // codegen — the invariants that matter at scale are: no shuffle, and a
    // scan pruned to exactly the two consumed columns)
    val p = plan("d01_token_stats")
    assert(!p.contains("Exchange"), "a pure projection must not shuffle\n" + p)
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), p)
  }

  test("jaccard pipeline has no cartesian product") {
    val p = plan("d04_ngram_jaccard")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("anti-join seeding compiles to a broadcast or shuffled anti join") {
    val p = plan("q04_anti_join")
    assert(p.contains("LeftAnti"), p)
  }
}
