package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.meta.MetadataStar
import graft.pipelines.StatusReport

/** Status Gantt report over the derived metadata star: task shapes,
  * dependency wiring, completion math, and a well-formed gviz document
  * (project_status_utils.py:75-313). */
class StatusReportSpec extends AnyFunSuite {
  import SparkTestSession._

  private val star = MetadataStar(spark, sf)

  test("seqrun tasks: two per run, demux depends on sequencing") {
    val tasks = StatusReport.seqrunTasks(star.seqrun, workDays = 2).cache()
    assert(tasks.count() == star.seqrun.count() * 2)
    val demux = tasks.filter(col("resource") === "Demultiplexing")
    assert(demux.filter(col("dependencies").startsWith("Run ")).count() == demux.count())
    // rejected runs surface as incomplete demultiplexing
    val rejected = star.seqrun.filter(col("reject_run") === "Y").count()
    assert(demux.filter(col("percent_complete") === 0).count() == rejected)
    // the YYMMDD prefix of the derived ids parses to a real date
    assert(tasks.filter(col("start_date").isNull).count() == 0)
    tasks.unpersist()
  }

  test("analysis tasks: completion fraction from seed statuses") {
    val t = StatusReport.analysisTasks(star.pipeline, star.pipelineSeed).head()
    // the star seeds pipeline 1 with statuses cycling SEEDED/RUNNING/
    // FINISHED/FAILED -> 25% finished
    assert(t.getAs[String]("task_name") == "PrimaryAnalysisCombinedPipeline")
    assert(t.getAs[Int]("percent_complete") == 25)
  }

  test("gviz report is valid JSON with the reference column order") {
    val json = StatusReport.gvizStatusReport(
      star.seqrun, star.pipeline, star.pipelineSeed)
    import org.json4s.jackson.JsonMethods
    val parsed = JsonMethods.parse(json)
    val cols = (parsed \ "cols").children.map(c =>
      (c \ "id").values.toString)
    assert(cols == StatusReport.columnOrder.toList)
    assert((parsed \ "rows").children.nonEmpty)
  }
}
