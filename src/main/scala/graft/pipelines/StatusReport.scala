package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.scalars.Genomics

/** Project status Gantt report (project_status_utils.py:75-313) — the
  * seqrun + analysis task rows a project status page plots, ending in the
  * same gviz DataTable JSON sink as the pooling report.
  *
  * The reference assembles the task list with per-row python dict edits
  * (_add_seqrun_info / _reformat_seqrun_data); here each task class is one
  * DataFrame projection and the report is their union — the heavy side
  * (scanning runs/seeds) stays distributed, and only the final per-project
  * task list (small by construction) collects into the gviz string.
  */
object StatusReport {

  val columnOrder: Seq[String] = Seq("task_id", "task_name", "resource",
    "start_date", "end_date", "duration", "percent_complete", "dependencies")

  /** Two tasks per seqrun, like _reformat_seqrun_data: the sequencing run
    * itself (resource "Sequencing", always complete, start from the
    * YYMMDD prefix of seqrun_igf_id) and its demultiplexing (resource
    * "Demultiplexing", dependent on the run; incomplete when the run is
    * rejected). Duration is milliseconds, gviz-style. */
  def seqrunTasks(seqrun: DataFrame, workDays: Int = 2): DataFrame = {
    val start = Genomics.seqrunDate(col("seqrun_igf_id")).cast("date")
    val end = date_add(start, workDays)
    val durationMs = lit(workDays.toLong * 86400000L)
    val runTask = seqrun.select(
      concat(lit("Run "), col("flowcell_id")).as("task_id"),
      concat(lit("Run "), col("flowcell_id")).as("task_name"),
      lit("Sequencing").as("resource"),
      start.as("start_date"), end.as("end_date"),
      durationMs.as("duration"),
      lit(100).as("percent_complete"),
      lit(null).cast("string").as("dependencies"))
    val demuxTask = seqrun.select(
      col("flowcell_id").as("task_id"),
      concat(lit("Flowcell "), col("flowcell_id")).as("task_name"),
      lit("Demultiplexing").as("resource"),
      start.as("start_date"), end.as("end_date"),
      durationMs.as("duration"),
      when(col("reject_run") === "N", 100).otherwise(0).as("percent_complete"),
      concat(lit("Run "), col("flowcell_id")).as("dependencies"))
    runTask.unionByName(demuxTask)
  }

  /** One task per pipeline with completion from its seed statuses
    * (get_analysis_info over pipeline_seed; FINISHED counts as done). */
  def analysisTasks(pipeline: DataFrame, pipelineSeed: DataFrame,
                    asOf: Column = current_date()): DataFrame =
    pipelineSeed.join(broadcast(pipeline.select(col("pipeline_id"),
        col("pipeline_name"))), Seq("pipeline_id"))
      .groupBy("pipeline_name")
      .agg(count(lit(1)).as("n_seeds"),
        count(when(col("status") === "FINISHED", 1)).as("n_done"))
      .select(
        concat(lit("Analysis "), col("pipeline_name")).as("task_id"),
        col("pipeline_name").as("task_name"),
        lit("Analysis").as("resource"),
        asOf.cast("date").as("start_date"),
        asOf.cast("date").as("end_date"),
        lit(0L).as("duration"),
        round(col("n_done") * 100.0 / col("n_seeds"), 0).cast("int")
          .as("percent_complete"),
        lit(null).cast("string").as("dependencies"))

  /** Full status report as gviz DataTable JSON (the reference's
    * generate_gviz_json_file shape: seqrun tasks then analysis tasks). */
  def gvizStatusReport(seqrun: DataFrame, pipeline: DataFrame,
                       pipelineSeed: DataFrame, workDays: Int = 2,
                       asOf: Column = current_date()): String = {
    val tasks = seqrunTasks(seqrun, workDays)
      .unionByName(analysisTasks(pipeline, pipelineSeed, asOf))
      .select(columnOrder.map(col): _*)
    PoolingReport.gvizJson(tasks)
  }
}
