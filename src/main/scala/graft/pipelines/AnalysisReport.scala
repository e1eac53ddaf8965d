package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Eav

/** Project analysis report (project_analysis_utils.py:94-313): collection
  * QC attributes of pipeline-finished entities, pivoted wide and rendered
  * to the gviz/CSV sinks.
  *
  * The reference fetches the EAV records with a 5-way subquery and
  * transposes per collection in a pandas loop; here the finished-entity
  * probe is one semi-join and the transpose is [[Eav.pivot]] — a single
  * hash aggregation with an explicit attribute registry.
  */
object AnalysisReport {

  /** Collection names of entities whose pipeline seed reached
    * `finishedStatus` for `pipelineName` (the reference's experiment-table
    * branch: seed_id = experiment_id, collection keyed downstream). */
  def finishedCollections(collection: DataFrame, run: DataFrame,
                          pipeline: DataFrame, pipelineSeed: DataFrame,
                          pipelineName: String,
                          finishedStatus: String = "FINISHED",
                          collectionTypes: Seq[String] = Seq("demultiplexed_fastq")): DataFrame = {
    val finishedSeeds = pipelineSeed
      .join(broadcast(pipeline.filter(col("pipeline_name") === pipelineName)
        .select(col("pipeline_id"))), Seq("pipeline_id"))
      .filter(col("seed_table") === "experiment" &&
        col("status") === finishedStatus)
      .select(col("seed_id").as("experiment_id"))
    collection
      .filter(col("type").isin(collectionTypes: _*))
      .join(run.select(col("run_igf_id").as("name"), col("experiment_id")),
        Seq("name"))
      .join(finishedSeeds, Seq("experiment_id"), "left_semi")
      .select(col("collection_id"), col("name"))
  }

  /** Wide attribute matrix: one row per finished collection, one column
    * per QC attribute (project_analysis_utils.py:146-166's transpose).
    * LEFT join: a finished collection whose QC attributes haven't landed
    * yet still appears, with null columns — dropping it would silently
    * hide the entity from the report. */
  def attributeMatrix(finished: DataFrame, collectionAttribute: DataFrame,
                      attributes: Seq[String]): DataFrame =
    Eav.pivot(
      finished.join(collectionAttribute, Seq("collection_id"), "left_outer")
        .select(col("name"), col("attribute_name"), col("attribute_value")),
      idCols = Seq("name"), names = attributes)

  /** gviz DataTable JSON of the analysis matrix (the reference's
    * gviz_out=True branch). */
  def gvizAnalysisReport(matrix: DataFrame): String =
    PoolingReport.gvizJson(matrix.orderBy(col("name")))
}
