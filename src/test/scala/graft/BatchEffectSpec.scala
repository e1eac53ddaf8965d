package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipelines.BatchEffect

class BatchEffectSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  // gene-count-matrix shape: gene x (lane1, lane2, lane3); lane2 = 2*lane1
  private lazy val counts = Seq(
    ("g1", 10.0, 20.0, 5.0),
    ("g2", 30.0, 60.0, 2.0),
    ("g3", 5.0, 10.0, 40.0),
    ("g4", 55.0, 110.0, 1.0))
    .toDF("gene", "lane1", "lane2", "lane3")

  test("CPM columns each sum to 1e6") {
    val c = BatchEffect.cpm(counts, Seq("lane1", "lane2", "lane3"))
    val sums = c.agg(sum("lane1"), sum("lane2"), sum("lane3")).head()
    (0 until 3).foreach(i => assert(math.abs(sums.getDouble(i) - 1e6) < 1e-6))
  }

  test("correlation matrix: perfectly correlated lanes hit 1.0") {
    val m = BatchEffect.correlationMatrix(counts, Seq("lane1", "lane2", "lane3"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(math.abs(m(("lane1", "lane2")) - 1.0) < 1e-12)
    assert(math.abs(m(("lane1", "lane1")) - 1.0) < 1e-12)
    assert(m(("lane1", "lane3")) < 0.0) // anti-correlated by construction
    assert(math.abs(m(("lane1", "lane3")) - m(("lane3", "lane1"))) < 1e-12)
  }

  test("PCA produces 2 components per row") {
    val p = BatchEffect.pca2(counts, Seq("lane1", "lane2", "lane3"), "gene")
    assert(p.columns.toSeq == Seq("gene", "pc1", "pc2"))
    assert(p.count() == 4)
    assert(p.agg(max(abs(col("pc1")))).head().getDouble(0) > 0.0)
  }
}
