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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q37_lineage6_readcount" -> (lineage6ReadCount _),
    "q38_lineage7_fastq"     -> (lineage7FastqExperiments _),
    "q39_eav_validated"      -> (eavValidatedCensus _))

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
         |GROUP BY 1""".stripMargin)
}
