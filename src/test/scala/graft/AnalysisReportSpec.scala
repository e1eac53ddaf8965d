package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.meta.MetadataStar
import graft.pipelines.AnalysisReport

/** Analysis report over the derived star: finished-entity probe, EAV
  * transpose, gviz rendering (project_analysis_utils.py:94-313). */
class AnalysisReportSpec extends AnyFunSuite {
  import SparkTestSession._

  private val star = MetadataStar(spark, sf)

  test("finished probe keeps only collections of FINISHED-seeded experiments") {
    val fin = AnalysisReport.finishedCollections(
      star.collection, star.run, star.pipeline, star.pipelineSeed,
      "PrimaryAnalysisCombinedPipeline").cache()
    assert(fin.count() > 0)
    // every kept collection's run belongs to a FINISHED seed of pipeline 1
    val finishedExp = star.pipelineSeed
      .filter(col("status") === "FINISHED" && col("pipeline_id") === 1)
      .select(col("seed_id").as("experiment_id"))
    val viaRun = fin.join(star.run.select(col("run_igf_id").as("name"),
        col("experiment_id")), Seq("name"))
      .join(finishedExp, Seq("experiment_id"), "left_anti")
    assert(viaRun.count() == 0, "collection kept without a finished seed")
    fin.unpersist()
  }

  test("attribute matrix is one row per collection with QC columns") {
    val fin = AnalysisReport.finishedCollections(
      star.collection, star.run, star.pipeline, star.pipelineSeed,
      "PrimaryAnalysisCombinedPipeline")
    val m = AnalysisReport.attributeMatrix(fin, star.collectionAttribute,
      Seq("total_reads", "mean_q30")).cache()
    assert(m.columns.toSeq == Seq("name", "total_reads", "mean_q30"))
    assert(m.count() == fin.count())
    assert(m.filter(col("total_reads").isNull || col("mean_q30").isNull).count() == 0)
    m.unpersist()
  }

  test("gviz analysis report renders valid JSON") {
    val fin = AnalysisReport.finishedCollections(
      star.collection, star.run, star.pipeline, star.pipelineSeed,
      "PrimaryAnalysisCombinedPipeline")
    val json = AnalysisReport.gvizAnalysisReport(
      AnalysisReport.attributeMatrix(fin.limit(50), star.collectionAttribute,
        Seq("total_reads", "mean_q30")))
    import org.json4s.jackson.JsonMethods
    val parsed = JsonMethods.parse(json)
    assert((parsed \ "cols").children.size == 3)
    assert((parsed \ "rows").children.nonEmpty)
  }
}
