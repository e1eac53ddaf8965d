package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.meta.CosmxStar

/** Cosmx spatial-omics queries over the derived cosmx star
  * (igfTables.py:1250-1504, cosmxutils.py) — the QC rollup a slide report
  * runs and the fov-range parser, both oracle-backed. */
object CosmxQ {

  /** Per-slide RNA QC rollup: run → slide → RNA FOVs → rna_qc metrics.
    * DECIMAL(10,2) metrics round-trip to integer cents (metric × 100) so
    * every aggregate is integer-exact; averages close in double with the
    * identical IEEE expression on both engines. */
  def slideRnaQc(s: SparkSession, dir: String): DataFrame = {
    val m = CosmxStar(s, dir)
    val cents = (c: String) => (col(c) * 100).cast("long")
    m.cosmxRun.select(col("cosmx_run_id"), col("cosmx_run_igf_id"))
      .join(m.cosmxSlide.select(col("cosmx_slide_id"), col("cosmx_slide_igf_id"),
        col("cosmx_run_id")), Seq("cosmx_run_id"))
      .join(m.cosmxFov.filter(col("slide_type") === "RNA")
        .select(col("cosmx_fov_id"), col("cosmx_slide_id")), Seq("cosmx_slide_id"))
      .join(m.cosmxFovRnaQc.select(col("cosmx_fov_id"),
        col("mean_transcript_per_cell"), col("number_non_empty_cells"),
        col("pct_non_empty_cells")), Seq("cosmx_fov_id"))
      .groupBy("cosmx_run_igf_id", "cosmx_slide_igf_id")
      .agg(
        count(lit(1)).as("n_fov"),
        sum(cents("mean_transcript_per_cell")).as("sum_transcript_cents"),
        sum(col("number_non_empty_cells")).as("total_cells"),
        (sum(cents("pct_non_empty_cells")).cast("double") /
          count(lit(1)) / lit(100.0)).as("avg_pct_non_empty"))
  }

  /** FOV-range parsing (cosmxutils.py:189-211): the slide's JSON metadata
    * carries `fov_range`; extract, parse to the fov list, explode. Both
    * accepted shapes ("a-b" ranges and comma lists) appear in the data. */
  def fovRangeExplode(s: SparkSession, dir: String): DataFrame =
    CosmxStar(s, dir).cosmxSlide
      .select(col("cosmx_slide_igf_id"),
        get_json_object(col("slide_metadata"), "$.fov_range").as("fov_range"))
      .select(col("cosmx_slide_igf_id"), col("fov_range"),
        explode(graft.scalars.Genomics.fovRangeToList(col("fov_range")))
          .as("fov_n"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q40_cosmx_slide_qc" -> (slideRnaQc _),
    "q41_fov_range"      -> (fovRangeExplode _))

  private def cte = CosmxStar.oracleCte

  val oracles: Map[String, String] = Map(
    "q40_cosmx_slide_qc" ->
      s"""WITH $cte
         |SELECT r.cosmx_run_igf_id, sl.cosmx_slide_igf_id,
         |       count(*) AS n_fov,
         |       CAST(SUM(CAST(q.mean_transcript_per_cell * 100 AS BIGINT)) AS BIGINT) AS sum_transcript_cents,
         |       CAST(SUM(q.number_non_empty_cells) AS BIGINT) AS total_cells,
         |       CAST(SUM(CAST(q.pct_non_empty_cells * 100 AS BIGINT)) AS DOUBLE) / count(*) / 100.0 AS avg_pct_non_empty
         |FROM cosmx_run r
         |JOIN cosmx_slide sl ON sl.cosmx_run_id = r.cosmx_run_id
         |JOIN cosmx_fov f ON f.cosmx_slide_id = sl.cosmx_slide_id AND f.slide_type = 'RNA'
         |JOIN cosmx_fov_rna_qc q ON q.cosmx_fov_id = f.cosmx_fov_id
         |GROUP BY 1, 2""".stripMargin,
    "q41_fov_range" ->
      s"""WITH $cte
         |SELECT cosmx_slide_igf_id, fov_range, CAST(u.x AS INT) AS fov_n
         |FROM cosmx_slide, UNNEST(
         |  CASE WHEN contains(fov_range, ',')
         |       THEN list_transform(string_split(fov_range, ','),
         |                           x -> CAST(trim(x) AS BIGINT))
         |       ELSE generate_series(
         |         CAST(regexp_extract(fov_range, '^(\\d+)-(\\d+)$$', 1) AS BIGINT),
         |         CAST(regexp_extract(fov_range, '^(\\d+)-(\\d+)$$', 2) AS BIGINT))
         |  END) AS u(x)""".stripMargin)
}
