package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.meta.MetadataStar

/** The reference's deepest metadata join chains, bound to the typed star
  * (graft.meta) as oracle-backed queries — SURVEY §2.3's 6-way/7-way rows.
  *
  * Join-shape notes for 100 TB: project/seqrun/pipeline are dimension
  * tables (≤ thousands of rows) and broadcast explicitly; sample/experiment
  * broadcast at test scale and AQE keeps or demotes that at cluster scale;
  * run/collection/collection_group/file/run_attribute are fact-sized and
  * shuffle on their join keys, each exactly once.
  */
object Lineage {

  /** 6-way read-count lineage (projectutils.py:46-67): project → sample →
    * experiment → run → seqrun + Run_attribute EAV filter, ACTIVE-status
    * gates on every hop. */
  def lineage6ReadCount(s: SparkSession, dir: String): DataFrame = {
    val m = MetadataStar(s, dir)
    m.project.select(col("project_id"), col("project_igf_id"))
      .join(m.sample.filter(col("status") === "ACTIVE")
        .select(col("sample_id"), col("sample_igf_id"), col("project_id")),
        Seq("project_id"))
      .join(m.experiment.filter(col("status") === "ACTIVE")
        .select(col("experiment_id"), col("sample_id")), Seq("sample_id"))
      .join(m.run.filter(col("status") === "ACTIVE")
        .select(col("run_id"), col("experiment_id"), col("seqrun_id")),
        Seq("experiment_id"))
      .join(broadcast(m.seqrun.select(col("seqrun_id"), col("flowcell_id"))),
        Seq("seqrun_id"))
      .join(m.runAttribute.filter(col("attribute_name") === "R1_READ_COUNT")
        .select(col("run_id"), col("attribute_value")), Seq("run_id"))
      .select("project_igf_id", "sample_igf_id", "flowcell_id", "attribute_value")
  }

  /** 7-way fastq-backed-experiment discovery (pipelineadaptor.py:604-629):
    * experiment → sample → project → run → collection (STRING key:
    * run_igf_id = collection.name) → collection_group → file, anti-joined
    * against already-seeded experiments (pipeline_seed ⋈ pipeline), with
    * species / library_source / collection-type filters. */
  def lineage7FastqExperiments(s: SparkSession, dir: String): DataFrame = {
    val m = MetadataStar(s, dir)
    val seeded = m.pipelineSeed
      .join(broadcast(m.pipeline
        .filter(col("pipeline_name") === "PrimaryAnalysisCombinedPipeline")
        .select(col("pipeline_id"))), Seq("pipeline_id"))
      .filter(col("seed_table") === "experiment" &&
        col("status").isin("SEEDED", "RUNNING", "FINISHED"))
      .select(col("seed_id").as("experiment_id"))
    m.experiment.filter(col("status") === "ACTIVE" &&
        col("library_source").isin("GENOMIC", "TRANSCRIPTOMIC",
          "TRANSCRIPTOMIC_SINGLE_CELL"))
      .select(col("experiment_id"), col("sample_id"))
      .join(m.sample.filter(col("species_name").isin("HG38", "MM10"))
        .select(col("sample_id"), col("project_id")), Seq("sample_id"))
      .join(broadcast(m.project.select(col("project_id"), col("project_igf_id"))),
        Seq("project_id"))
      .join(m.run.filter(col("status") === "ACTIVE")
        .select(col("experiment_id"), col("run_igf_id")), Seq("experiment_id"))
      .join(m.collection.filter(col("type") === "demultiplexed_fastq")
        .select(col("name").as("run_igf_id"), col("collection_id")),
        Seq("run_igf_id"))
      .join(m.collectionGroup.select(col("collection_id"), col("file_id")),
        Seq("collection_id"))
      .join(m.file.select(col("file_id")), Seq("file_id"))
      .join(seeded, Seq("experiment_id"), "left_anti")
      .select(col("experiment_id"), col("project_igf_id"))
      .distinct()
  }

  /** EAV-attribute-filtered rollup: per-project census of validated ACTIVE
    * samples via the sample_attribute long table (the metadata-validation
    * census idiom, reformat_metadata_file.py:550-559, over igfTables' EAV
    * side tables). */
  def eavValidatedCensus(s: SparkSession, dir: String): DataFrame = {
    val m = MetadataStar(s, dir)
    m.sampleAttribute
      .filter(col("attribute_name") === "validated" &&
        col("attribute_value") === "yes")
      .select(col("sample_id"))
      .join(m.sample.filter(col("status") === "ACTIVE")
        .select(col("sample_id"), col("species_name"), col("project_id")),
        Seq("sample_id"))
      .join(broadcast(m.project.select(col("project_id"), col("project_igf_id"))),
        Seq("project_id"))
      .groupBy("project_igf_id")
      .agg(count(lit(1)).as("n_validated"),
        countDistinct(col("species_name")).as("n_species"))
  }

  /** 7-way project-cleanup listing (projectutils.py:495-512): ACTIVE
    * projects' runs with their data-authority user, non-rejected seqruns
    * only. Adds the user/project_user dimension hop to the lineage
    * chains. */
  def projectUserRuns(s: SparkSession, dir: String): DataFrame = {
    val m = MetadataStar(s, dir)
    m.project.filter(col("status") === "ACTIVE")
      .select(col("project_id"), col("project_igf_id"))
      .join(broadcast(m.projectUser.filter(col("data_authority") === "T")
        .select(col("project_id"), col("user_id"))), Seq("project_id"))
      .join(broadcast(m.user.select(col("user_id"), col("name"), col("email_id"))),
        Seq("user_id"))
      .join(m.sample.select(col("sample_id"), col("sample_igf_id"),
        col("project_id")), Seq("project_id"))
      .join(m.experiment.select(col("experiment_id"), col("experiment_igf_id"),
        col("sample_id")), Seq("sample_id"))
      .join(m.run.select(col("run_id"), col("run_igf_id"), col("lane_number"),
        col("experiment_id"), col("seqrun_id")), Seq("experiment_id"))
      .join(broadcast(m.seqrun.filter(col("reject_run") === "N")
        .select(col("seqrun_id"), col("seqrun_igf_id"))), Seq("seqrun_id"))
      .select("project_igf_id", "name", "email_id", "sample_igf_id",
        "experiment_igf_id", "run_igf_id", "lane_number", "seqrun_igf_id")
  }

  /** seqrun_stats JSON round-trip (igfTables.py:411-452, the Stats.json
    * barcode census shape): the star SERIALIZES {barcode: count} JSON into
    * undetermined_barcodes; this query parses it back with from_json and
    * explodes the map — the oracle computes the expected rows directly
    * from the same key arithmetic, so any divergence in the JSON
    * build/parse path fails the hash gate. */
  def seqrunStatsBarcodes(s: SparkSession, dir: String): DataFrame = {
    val m = MetadataStar(s, dir)
    m.seqrunStats.select(col("seqrun_id"), col("lane_number"),
        explode(from_json(col("undetermined_barcodes"),
          org.apache.spark.sql.types.MapType(
            org.apache.spark.sql.types.StringType,
            org.apache.spark.sql.types.LongType)))
          .as(Seq("barcode", "n")))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q37_lineage6_readcount" -> (lineage6ReadCount _),
    "q38_lineage7_fastq"     -> (lineage7FastqExperiments _),
    "q39_eav_validated"      -> (eavValidatedCensus _),
    "q42_project_user_runs"  -> (projectUserRuns _),
    "q43_seqrun_stats_json"  -> (seqrunStatsBarcodes _))

  private def cte = MetadataStar.oracleCte

  val oracles: Map[String, String] = Map(
    "q37_lineage6_readcount" ->
      s"""WITH $cte
         |SELECT p.project_igf_id, s.sample_igf_id, sq.flowcell_id, ra.attribute_value
         |FROM project p
         |JOIN sample s ON s.project_id = p.project_id AND s.status = 'ACTIVE'
         |JOIN experiment e ON e.sample_id = s.sample_id AND e.status = 'ACTIVE'
         |JOIN run r ON r.experiment_id = e.experiment_id AND r.status = 'ACTIVE'
         |JOIN seqrun sq ON sq.seqrun_id = r.seqrun_id
         |JOIN run_attribute ra ON ra.run_id = r.run_id
         |WHERE ra.attribute_name = 'R1_READ_COUNT'""".stripMargin,
    "q38_lineage7_fastq" ->
      s"""WITH $cte,
         |seeded AS (
         |  SELECT ps.seed_id FROM pipeline_seed ps
         |  JOIN pipeline p ON p.pipeline_id = ps.pipeline_id
         |  WHERE p.pipeline_name = 'PrimaryAnalysisCombinedPipeline'
         |    AND ps.seed_table = 'experiment'
         |    AND ps.status IN ('SEEDED', 'RUNNING', 'FINISHED'))
         |SELECT DISTINCT e.experiment_id, p.project_igf_id
         |FROM experiment e
         |JOIN sample s ON s.sample_id = e.sample_id
         |JOIN project p ON p.project_id = s.project_id
         |JOIN run r ON r.experiment_id = e.experiment_id AND r.status = 'ACTIVE'
         |JOIN collection c ON c.name = r.run_igf_id AND c.type = 'demultiplexed_fastq'
         |JOIN collection_group cg ON cg.collection_id = c.collection_id
         |JOIN mfile f ON f.file_id = cg.file_id
         |WHERE e.status = 'ACTIVE'
         |  AND e.library_source IN ('GENOMIC', 'TRANSCRIPTOMIC', 'TRANSCRIPTOMIC_SINGLE_CELL')
         |  AND s.species_name IN ('HG38', 'MM10')
         |  AND e.experiment_id NOT IN (SELECT seed_id FROM seeded)""".stripMargin,
    "q39_eav_validated" ->
      s"""WITH $cte
         |SELECT p.project_igf_id, count(*) AS n_validated,
         |       count(DISTINCT s.species_name) AS n_species
         |FROM sample_attribute sa
         |JOIN sample s ON s.sample_id = sa.sample_id AND s.status = 'ACTIVE'
         |JOIN project p ON p.project_id = s.project_id
         |WHERE sa.attribute_name = 'validated' AND sa.attribute_value = 'yes'
         |GROUP BY 1""".stripMargin,
    "q42_project_user_runs" ->
      s"""WITH $cte
         |SELECT p.project_igf_id, u.name, u.email_id, s.sample_igf_id,
         |       e.experiment_igf_id, r.run_igf_id, r.lane_number, sq.seqrun_igf_id
         |FROM project p
         |JOIN project_user pu ON pu.project_id = p.project_id
         |  AND pu.data_authority = 'T'
         |JOIN iuser u ON u.user_id = pu.user_id
         |JOIN sample s ON s.project_id = p.project_id
         |JOIN experiment e ON e.sample_id = s.sample_id
         |JOIN run r ON r.experiment_id = e.experiment_id
         |JOIN seqrun sq ON sq.seqrun_id = r.seqrun_id AND sq.reject_run = 'N'
         |WHERE p.status = 'ACTIVE'""".stripMargin,
    "q43_seqrun_stats_json" ->
      s"""WITH $cte
         |SELECT seqrun_id, lane_number, barcode, CAST(n AS BIGINT) AS n
         |FROM seqrun_stats_flat""".stripMargin)
}
