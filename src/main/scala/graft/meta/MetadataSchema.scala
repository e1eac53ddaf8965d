package graft.meta

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's genomics metadata schema as typed Spark StructTypes.
  *
  * Transcribed from the 30 SQLAlchemy tables in igfTables.py:12-1504
  * (22 core + 8 cosmx spatial-omics), including every enum domain — the
  * 40-value library_strategy and 70-value experiment_type lists
  * (igfTables.py:632-656) ship in full. MySQL types map as:
  * INTEGER(unsigned) → LongType (unsigned 32-bit exceeds IntegerType),
  * String(n)/TEXT → StringType, TIMESTAMP/DATETIME → TimestampType,
  * Enum(...) → StringType + a domain in [[enums]] (validated by
  * [[MetadataSchema.violations]], since Spark has no column CHECK
  * constraints), JSON → StringType (parse with from_json at use sites),
  * DECIMAL(p,s) → DecimalType(p,s).
  *
  * At 100 TB the big tables (run, file, collection, *_attribute) are the
  * fact side — schemas here mark the join keys the star derivations and
  * lineage queries co-partition on.
  */
object MetadataSchema {

  // ---- enum domains (igfTables.py, cited per table) -----------------------

  val projectStatus = Seq("ACTIVE", "FINISHED", "WITHDRAWN")
  val projectDeliverable = Seq("FASTQ", "ALIGNMENT", "ANALYSIS", "COSMX")
  val userCategory = Seq("HPC_USER", "NON_HPC_USER", "EXTERNAL")
  val userStatus = Seq("ACTIVE", "BLOCKED", "WITHDRAWN")
  val sampleSex = Seq("FEMALE", "MALE", "MIXED", "UNKNOWN")
  val entityStatus = Seq("ACTIVE", "FAILED", "WITHDRAWN") // sample/experiment/run
  val biomaterialType = Seq("PRIMARY_TISSUE", "PRIMARY_CELL",
    "PRIMARY_CELL_CULTURE", "CELL_LINE", "SINGLE_NUCLEI", "UNKNOWN")
  val platformModel = Seq("HISEQ2500", "HISEQ4000", "MISEQ", "NEXTSEQ",
    "NEXTSEQ2000", "NOVASEQ6000", "NANOPORE_MINION", "DNBSEQ-G400",
    "DNBSEQ-G50", "DNBSEQ-T7", "SEQUEL2")
  val platformVendor = Seq("ILLUMINA", "NANOPORE", "MGI", "PACBIO")
  val platformSoftware = Seq("RTA", "UNKNOWN")
  val barcodeRule = Seq("NO_CHANGE", "REVCOMP", "UNKNOWN")
  val yesNo = Seq("Y", "N")
  val laneNumber = Seq("1", "2", "3", "4", "5", "6", "7", "8")

  /** igfTables.py:633-637 (9 values). */
  val librarySource = Seq("GENOMIC", "TRANSCRIPTOMIC", "GENOMIC_SINGLE_CELL",
    "METAGENOMIC", "METATRANSCRIPTOMIC", "TRANSCRIPTOMIC_SINGLE_CELL",
    "SYNTHETIC", "VIRAL_RNA", "UNKNOWN")

  /** igfTables.py:638-643 (40 values, verbatim incl. 'CHIRP SEQ' spacing). */
  val libraryStrategy = Seq(
    "WGS", "WXS", "WGA", "RNA-SEQ", "CHIP-SEQ", "ATAC-SEQ", "MIRNA-SEQ",
    "NCRNA-SEQ", "FL-CDNA", "EST", "HI-C", "DNASE-SEQ", "WCS", "RAD-SEQ",
    "CLONE", "POOLCLONE", "AMPLICON", "CLONEEND", "FINISHING", "MNASE-SEQ",
    "DNASE-HYPERSENSITIVITY", "BISULFITE-SEQ", "CTS", "MRE-SEQ", "MEDIP-SEQ",
    "MBD-SEQ", "TN-SEQ", "VALIDATION", "FAIRE-SEQ", "SELEX", "RIP-SEQ",
    "CHIA-PET", "SYNTHETIC-LONG-READ", "TARGETED-CAPTURE", "TETHERED",
    "NOME-SEQ", "CHIRP SEQ", "4-C-SEQ", "5-C-SEQ", "UNKNOWN")

  /** igfTables.py:644-656 (70 values). */
  val experimentType = Seq(
    "POLYA-RNA", "POLYA-RNA-3P", "TOTAL-RNA", "SMALL-RNA", "WGS", "WGA",
    "WXS", "WXS-UTR", "RIBOSOME-PROFILING", "RIBODEPLETION", "16S",
    "NCRNA-SEQ", "FL-CDNA", "EST", "HI-C", "DNASE-SEQ", "WCS", "RAD-SEQ",
    "CLONE", "POOLCLONE", "AMPLICON", "CLONEEND", "FINISHING",
    "DNASE-HYPERSENSITIVITY", "RRBS-SEQ", "WGBS", "CTS", "MRE-SEQ",
    "MEDIP-SEQ", "MBD-SEQ", "TN-SEQ", "VALIDATION", "FAIRE-SEQ", "SELEX",
    "RIP-SEQ", "CHIA-PET", "SYNTHETIC-LONG-READ", "TARGETED-CAPTURE",
    "TETHERED", "NOME-SEQ", "CHIRP-SEQ", "4-C-SEQ", "5-C-SEQ", "METAGENOMIC",
    "METATRANSCRIPTOMIC", "TF", "H3K27ME3", "H3K27AC", "H3K9ME3", "H3K36ME3",
    "H3F3A", "H3K4ME1", "H3K79ME2", "H3K79ME3", "H3K9ME1", "H3K9ME2",
    "H4K20ME1", "H2AFZ", "H3AC", "H3K4ME2", "H3K4ME3", "H3K9AC",
    "HISTONE-NARROW", "HISTONE-BROAD", "CHIP-INPUT", "ATAC-SEQ",
    "TENX-TRANSCRIPTOME-3P", "TENX-TRANSCRIPTOME-5P",
    "DROP-SEQ-TRANSCRIPTOME", "UNKNOWN")

  val libraryLayout = Seq("SINGLE", "PAIRED", "UNKNOWN")
  val experimentPlatform = Seq("HISEQ2500", "HISEQ4000", "MISEQ", "NEXTSEQ",
    "NANOPORE_MINION", "NOVASEQ6000", "DNBSEQ-G400", "DNBSEQ-G50",
    "DNBSEQ-T7", "NEXTSEQ2000", "SEQUEL2", "UNKNOWN")
  val collectionTable = Seq("sample", "experiment", "run", "file", "project",
    "seqrun", "analysis", "unknown")
  val fileLocation = Seq("ORWELL", "HPC_PROJECT", "ELIOT", "IRODS", "UNKNOWN")
  val fileStatus = Seq("ACTIVE", "WITHDRAWN")
  val pipelineType = Seq("EHIVE", "AIRFLOW", "NEXTFLOW", "UNKNOWN")
  val pipelineSeedTable = Seq("project", "sample", "experiment", "run",
    "file", "seqrun", "analysis", "collection", "unknown")
  val pipelineSeedStatus = Seq("SEEDED", "RUNNING", "FINISHED", "FAILED", "UNKNOWN")
  val slideType = Seq("RNA", "PROTEIN", "UNKNOWN")
  val tissueSpecies = Seq("HUMAN", "MOUSE", "UNKNOWN")

  // ---- table StructTypes --------------------------------------------------

  private def f(n: String, t: DataType, nullable: Boolean = true) =
    StructField(n, t, nullable)
  private val L = LongType; private val S = StringType; private val T = TimestampType

  /** igfTables.py:12-64 */
  val project: StructType = StructType(Seq(
    f("project_id", L, nullable = false), f("project_igf_id", S, nullable = false),
    f("project_name", S), f("start_timestamp", T), f("description", S),
    f("status", S, nullable = false), f("deliverable", S)))

  /** igfTables.py:66-137 */
  val user: StructType = StructType(Seq(
    f("user_id", L, nullable = false), f("user_igf_id", S),
    f("name", S, nullable = false), f("email_id", S, nullable = false),
    f("username", S), f("hpc_username", S), f("twitter_user", S),
    f("orcid_id", S), f("category", S, nullable = false),
    f("status", S, nullable = false), f("date_created", T),
    f("password", S), f("encryption_salt", S), f("ht_password", S)))

  /** igfTables.py:138-171 */
  val projectUser: StructType = StructType(Seq(
    f("project_user_id", L, nullable = false), f("project_id", L, nullable = false),
    f("user_id", L, nullable = false), f("data_authority", S)))

  /** igfTables.py:172-263 */
  val sample: StructType = StructType(Seq(
    f("sample_id", L, nullable = false), f("sample_igf_id", S, nullable = false),
    f("sample_submitter_id", S), f("taxon_id", L), f("scientific_name", S),
    f("species_name", S), f("donor_anonymized_id", S), f("description", S),
    f("phenotype", S), f("sex", S, nullable = false),
    f("status", S, nullable = false), f("biomaterial_type", S, nullable = false),
    f("cell_type", S), f("tissue_type", S), f("cell_line", S),
    f("date_created", T), f("project_id", L)))

  /** igfTables.py:264-325 */
  val platform: StructType = StructType(Seq(
    f("platform_id", L, nullable = false), f("platform_igf_id", S, nullable = false),
    f("model_name", S, nullable = false), f("vendor_name", S, nullable = false),
    f("software_name", S, nullable = false), f("software_version", S, nullable = false),
    f("date_created", T)))

  /** igfTables.py:326-368 */
  val flowcellBarcodeRule: StructType = StructType(Seq(
    f("flowcell_rule_id", L, nullable = false), f("platform_id", L),
    f("flowcell_type", S, nullable = false), f("index_1", S, nullable = false),
    f("index_2", S, nullable = false)))

  /** igfTables.py:369-410 */
  val seqrun: StructType = StructType(Seq(
    f("seqrun_id", L, nullable = false), f("seqrun_igf_id", S, nullable = false),
    f("reject_run", S, nullable = false), f("date_created", T),
    f("flowcell_id", S, nullable = false), f("platform_id", L)))

  /** igfTables.py:411-452 */
  val seqrunStats: StructType = StructType(Seq(
    f("seqrun_stats_id", L, nullable = false), f("seqrun_id", L, nullable = false),
    f("lane_number", S, nullable = false), f("bases_mask", S),
    f("undetermined_barcodes", S), f("known_barcodes", S),
    f("undetermined_fastqc", S)))

  /** igfTables.py:453-678 */
  val experiment: StructType = StructType(Seq(
    f("experiment_id", L, nullable = false), f("experiment_igf_id", S, nullable = false),
    f("project_id", L), f("sample_id", L), f("library_name", S, nullable = false),
    f("library_source", S, nullable = false), f("library_strategy", S, nullable = false),
    f("experiment_type", S, nullable = false), f("library_layout", S, nullable = false),
    f("status", S, nullable = false), f("date_created", T),
    f("platform_name", S, nullable = false)))

  /** igfTables.py:679-728 */
  val run: StructType = StructType(Seq(
    f("run_id", L, nullable = false), f("run_igf_id", S, nullable = false),
    f("experiment_id", L), f("seqrun_id", L), f("status", S, nullable = false),
    f("lane_number", S, nullable = false), f("date_created", T)))

  /** igfTables.py:729-762 */
  val analysis: StructType = StructType(Seq(
    f("analysis_id", L, nullable = false), f("project_id", L),
    f("analysis_name", S, nullable = false), f("analysis_type", S, nullable = false),
    f("analysis_description", S)))

  /** igfTables.py:763-799 */
  val collection: StructType = StructType(Seq(
    f("collection_id", L, nullable = false), f("name", S, nullable = false),
    f("type", S, nullable = false), f("table", S, nullable = false),
    f("date_stamp", T)))

  /** igfTables.py:800-856 */
  val file: StructType = StructType(Seq(
    f("file_id", L, nullable = false), f("file_path", S, nullable = false),
    f("location", S, nullable = false), f("status", S, nullable = false),
    f("md5", S), f("size", S), f("date_created", T), f("date_updated", T)))

  /** igfTables.py:857-886 */
  val collectionGroup: StructType = StructType(Seq(
    f("collection_group_id", L, nullable = false),
    f("collection_id", L, nullable = false), f("file_id", L, nullable = false)))

  /** igfTables.py:887-937 */
  val pipeline: StructType = StructType(Seq(
    f("pipeline_id", L, nullable = false), f("pipeline_name", S, nullable = false),
    f("pipeline_db", S, nullable = false), f("pipeline_init_conf", S),
    f("pipeline_run_conf", S), f("pipeline_type", S, nullable = false),
    f("is_active", S, nullable = false), f("date_stamp", T)))

  /** igfTables.py:938-1015 */
  val pipelineSeed: StructType = StructType(Seq(
    f("pipeline_seed_id", L, nullable = false), f("seed_id", L, nullable = false),
    f("seed_table", S, nullable = false), f("pipeline_id", L, nullable = false),
    f("status", S, nullable = false), f("date_stamp", T)))

  /** igfTables.py:1037-1248 — the seven EAV side tables share one shape. */
  def attributeTable(entity: String): StructType = StructType(Seq(
    f(s"${entity}_attribute_id", L, nullable = false),
    f("attribute_name", S), f("attribute_value", S),
    f(s"${entity}_id", L, nullable = false)))

  val projectAttribute: StructType = attributeTable("project")
  val experimentAttribute: StructType = attributeTable("experiment")
  val collectionAttribute: StructType = attributeTable("collection")
  val sampleAttribute: StructType = attributeTable("sample")
  val seqrunAttribute: StructType = attributeTable("seqrun")
  val runAttribute: StructType = attributeTable("run")
  val fileAttribute: StructType = attributeTable("file")

  /** igfTables.py:1250-1504 — cosmx spatial-omics tables. */
  val cosmxPlatform: StructType = StructType(Seq(
    f("cosmx_platform_id", L, nullable = false),
    f("cosmx_platform_igf_id", S, nullable = false),
    f("cosmx_platform_name", S), f("date_created", T)))

  val cosmxRun: StructType = StructType(Seq(
    f("cosmx_run_id", L, nullable = false), f("cosmx_run_igf_id", S, nullable = false),
    f("cosmx_run_name", S), f("project_id", L, nullable = false)))

  val cosmxSlide: StructType = StructType(Seq(
    f("cosmx_slide_id", L, nullable = false), f("cosmx_slide_igf_id", S, nullable = false),
    f("cosmx_slide_name", S), f("cosmx_run_id", L, nullable = false),
    f("cosmx_platform_id", L, nullable = false), f("panel_info", S),
    f("assay_type", S), f("version", S), f("slide_run_date", T),
    f("slide_metadata", S), f("date_created", T)))

  val cosmxFov: StructType = StructType(Seq(
    f("cosmx_fov_id", L, nullable = false), f("cosmx_fov_name", S, nullable = false),
    f("cosmx_slide_id", L, nullable = false), f("slide_type", S, nullable = false)))

  val cosmxFovAnnotation: StructType = StructType(Seq(
    f("cosmx_fov_annotation_id", L, nullable = false),
    f("cosmx_fov_id", L, nullable = false), f("tissue_species", S, nullable = false),
    f("tissue_annotation", S), f("tissue_ontology", S), f("tissue_condition", S)))

  val cosmxFovRnaQc: StructType = StructType(Seq(
    f("cosmx_fov_rna_qc_id", L, nullable = false), f("cosmx_fov_id", L, nullable = false),
    f("mean_transcript_per_cell", DecimalType(10, 2)),
    f("mean_unique_genes_per_cell", DecimalType(10, 2)),
    f("number_non_empty_cells", L), f("pct_non_empty_cells", DecimalType(10, 2)),
    f("percentile_90_transcript_per_cell", DecimalType(10, 2)),
    f("percentile_10_transcript_per_cell", DecimalType(10, 2)),
    f("mean_negprobe_counts_per_cell", DecimalType(10, 3))))

  val cosmxFovProteinQc: StructType = StructType(Seq(
    f("cosmx_fov_protein_qc_id", L, nullable = false),
    f("cosmx_fov_id", L, nullable = false),
    f("mean_fluorescence_intensity", L), f("mean_unique_genes_per_cell", L),
    f("number_non_empty_cells", L), f("pct_non_empty_cells", DecimalType(10, 2)),
    f("percentile_10_fluorescence_intensity", DecimalType(10, 2)),
    f("percentile_90_fluorescence_intensity", DecimalType(10, 2)),
    f("fluorescence_intensity_mean_igg_control_intensity", DecimalType(10, 3))))

  val cosmxSlideAttribute: StructType = attributeTable("cosmx_slide")
  val cosmxFovAttribute: StructType = attributeTable("cosmx_fov")

  /** All 30 tables by reference name. */
  val tables: Map[String, StructType] = Map(
    "project" -> project, "user" -> user, "project_user" -> projectUser,
    "sample" -> sample, "platform" -> platform,
    "flowcell_barcode_rule" -> flowcellBarcodeRule, "seqrun" -> seqrun,
    "seqrun_stats" -> seqrunStats, "experiment" -> experiment, "run" -> run,
    "analysis" -> analysis, "collection" -> collection, "file" -> file,
    "collection_group" -> collectionGroup, "pipeline" -> pipeline,
    "pipeline_seed" -> pipelineSeed,
    "project_attribute" -> projectAttribute,
    "experiment_attribute" -> experimentAttribute,
    "collection_attribute" -> collectionAttribute,
    "sample_attribute" -> sampleAttribute,
    "seqrun_attribute" -> seqrunAttribute, "run_attribute" -> runAttribute,
    "file_attribute" -> fileAttribute,
    "cosmx_platform" -> cosmxPlatform, "cosmx_run" -> cosmxRun,
    "cosmx_slide" -> cosmxSlide, "cosmx_fov" -> cosmxFov,
    "cosmx_fov_annotation" -> cosmxFovAnnotation,
    "cosmx_fov_rna_qc" -> cosmxFovRnaQc,
    "cosmx_fov_protein_qc" -> cosmxFovProteinQc,
    "cosmx_slide_attribute" -> cosmxSlideAttribute,
    "cosmx_fov_attribute" -> cosmxFovAttribute)

  /** Enum-valued columns per table (table → column → allowed values). */
  val enums: Map[String, Map[String, Seq[String]]] = Map(
    "project" -> Map("status" -> projectStatus, "deliverable" -> projectDeliverable),
    "user" -> Map("category" -> userCategory, "status" -> userStatus),
    "project_user" -> Map("data_authority" -> Seq("T")),
    "sample" -> Map("sex" -> sampleSex, "status" -> entityStatus,
      "biomaterial_type" -> biomaterialType),
    "platform" -> Map("model_name" -> platformModel,
      "vendor_name" -> platformVendor, "software_name" -> platformSoftware),
    "flowcell_barcode_rule" -> Map("index_1" -> barcodeRule, "index_2" -> barcodeRule),
    "seqrun" -> Map("reject_run" -> yesNo),
    "seqrun_stats" -> Map("lane_number" -> laneNumber),
    "experiment" -> Map("library_source" -> librarySource,
      "library_strategy" -> libraryStrategy, "experiment_type" -> experimentType,
      "library_layout" -> libraryLayout, "status" -> entityStatus,
      "platform_name" -> experimentPlatform),
    "run" -> Map("status" -> entityStatus, "lane_number" -> laneNumber),
    "collection" -> Map("table" -> collectionTable),
    "file" -> Map("location" -> fileLocation, "status" -> fileStatus),
    "pipeline" -> Map("pipeline_type" -> pipelineType, "is_active" -> yesNo),
    "pipeline_seed" -> Map("seed_table" -> pipelineSeedTable,
      "status" -> pipelineSeedStatus),
    "cosmx_fov" -> Map("slide_type" -> slideType),
    "cosmx_fov_annotation" -> Map("tissue_species" -> tissueSpecies))

  // ---- validation ---------------------------------------------------------

  /** Row-level violations of `table`'s schema contract: enum columns outside
    * their domain and NOT-NULL columns that are null. Returns
    * (column, violation, value, n_rows) — a distributed aggregation, not a
    * driver-side scan, so it runs at full table scale. Spark has no CHECK
    * constraints; this is the engine-side equivalent of the reference's
    * column validation on ingest (igfTables enum/nullable declarations). */
  def violations(df: DataFrame, table: String): DataFrame = {
    val schema = tables(table)
    val enumCols = enums.getOrElse(table, Map.empty)
    val present = df.columns.toSet
    val checks: Seq[(String, String, Column)] =
      enumCols.toSeq.collect { case (c, dom) if present.contains(c) =>
        (c, "enum_violation", col(c).isNotNull && !col(c).isin(dom: _*))
      } ++
      schema.fields.toSeq.collect { case sf if !sf.nullable && present.contains(sf.name) =>
        (sf.name, "null_violation", col(sf.name).isNull)
      }
    val perCheck = checks.map { case (c, kind, pred) =>
      df.filter(pred).groupBy(col(c).cast("string").as("value"))
        .agg(count(lit(1)).as("n_rows"))
        .select(lit(c).as("column"), lit(kind).as("violation"),
          col("value"), col("n_rows"))
    }
    perCheck.reduceOption(_ unionByName _)
      .getOrElse(df.sparkSession.emptyDataFrame
        .select(lit("").as("column"), lit("").as("violation"),
          lit("").as("value"), lit(0L).as("n_rows")).limit(0))
  }

  /** True iff `df`'s columns (name+type, ignoring nullability) match the
    * declared StructType for `table`, in order. */
  def conforms(df: DataFrame, table: String): Boolean = {
    val want = tables(table).fields.map(x => (x.name, x.dataType)).toSeq
    val got = df.schema.fields.map(x => (x.name, x.dataType)).toSeq
    want == got
  }
}
