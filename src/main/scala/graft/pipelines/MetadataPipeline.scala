package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.scalars.Genomics

/** Metadata registration pipeline (SURVEY §3.2): raw user CSV → canonical
  * columns → normalization + lookup joins → validation error frames.
  *
  * The reference does this with row-wise pandas applies and first-match
  * lookups (reformat_metadata_file.py:441-510, 348-393); here every step is
  * a broadcast-join or a projection. Lookup ties resolve with the same
  * first-match rule via a priority column + min-over-window.
  */
object MetadataPipeline {

  /** Canonical 16 output columns (reformat_metadata_file.py:183-200). */
  val canonicalColumns: Seq[String] = Seq(
    "sample_igf_id", "project_igf_id", "name", "email_id",
    "sample_submitter_id", "experiment_type", "library_source",
    "library_strategy", "biomaterial_type", "expected_reads",
    "expected_lanes", "fragment_length_distribution_mean",
    "fragment_length_distribution_sd", "taxon_id", "scientific_name",
    "species_name")

  /** Inject missing canonical columns as nulls and order the projection
    * (reformat_metadata_file.py:525-534). */
  def withCanonicalColumns(df: DataFrame): DataFrame = {
    val added = canonicalColumns.foldLeft(df) { (d, c) =>
      if (d.columns.contains(c)) d else d.withColumn(c, lit(null).cast("string"))
    }
    added.select((canonicalColumns.filter(added.columns.contains) ++
      added.columns.filterNot(canonicalColumns.contains)).map(col): _*)
  }

  /** Normalization + defaults + lookups, fully declarative. The assay and
    * species resolution is [[graft.meta.AssayLookup]] — the reference's
    * FULL 85-row EXPERIMENT_TYPE_LOOKUP and 4-row SPECIES_LOOKUP with the
    * premade-library key-selection rule and first-match tie handling
    * (reformat_metadata_file.py:348-393).
    *
    * Like the reference's populate_metadata_values, the lookup OVERWRITES
    * any caller-supplied library_source / library_strategy /
    * experiment_type / biomaterial_type / taxon_id / scientific_name —
    * those columns are derived metadata, not user input
    * (reformat_metadata_file.py:441-510 assigns them unconditionally). */
  def reformat(raw: DataFrame): DataFrame = {
    val canon = withCanonicalColumns(raw)
    def existing(c: String): Column =
      if (canon.columns.contains(c)) col(c) else lit(null).cast("string")

    val prepared = canon
      .withColumn("name", Genomics.normalizePersonName(col("name")))
      .withColumn("sample_igf_id", Genomics.normalizeName(col("sample_igf_id")))
      // ':'-suffixed submitter tags are stripped first, then the id is
      // dash-normalized like the reference's sample_and_project_reformat
      .withColumn("project_igf_id",
        Genomics.normalizeName(Genomics.cleanProject(col("project_igf_id"))))

    val withAssay = graft.meta.AssayLookup.withAssayInfo(
      prepared.drop("library_source", "library_strategy", "experiment_type",
        "biomaterial_type"),
      existing("library_preparation"), existing("sample_description"),
      existing("library_type"))
    val withSpecies = graft.meta.AssayLookup.withSpeciesInfo(
      withAssay.drop("species_name", "taxon_id", "scientific_name"),
      existing("species_text"))

    withSpecies
      // defaults (reformat_metadata_file.py:499-505)
      .withColumn("expected_reads", coalesce(col("expected_reads"), lit("2000000")))
      .withColumn("expected_lanes", coalesce(col("expected_lanes"), lit("1")))
  }

  /** Drop columns whose every value is empty/UNKNOWN
    * (reformat_metadata_file.py:550-559): one aggregation, then a
    * driver-side projection decision. */
  def pruneEmptyColumns(df: DataFrame, candidates: Seq[String]): DataFrame = {
    val present = candidates.filter(df.columns.contains)
    if (present.isEmpty) df
    else {
      val counts = df.agg(
        present.map(c => count(when(
          col(c).isNotNull && col(c) =!= "" && upper(col(c)) =!= "UNKNOWN", 1)).as(c)).head,
        present.map(c => count(when(
          col(c).isNotNull && col(c) =!= "" && upper(col(c)) =!= "UNKNOWN", 1)).as(c)).tail: _*)
        .head()
      val dead = present.zipWithIndex.collect { case (c, i) if counts.getLong(i) == 0 => c }
      dead.foldLeft(df)(_ drop _)
    }
  }

  /** Row-level semantic checks (samplesheet.py:38-88, metadata_validation
    * .py:27-211): each rule is a (name, violated-when) pair; violations
    * come back as an error frame, not exceptions. */
  def semanticErrors(df: DataFrame): DataFrame = {
    val rules: Seq[(String, Column)] = Seq(
      "sample_id_equals_name" ->
        (col("Sample_ID") === col("Sample_Name")),
      "index2_without_i5" ->
        (col("index2").isNotNull && col("index2") =!= "" &&
          (col("I5_Index_ID").isNull || col("I5_Index_ID") === "")),
      "tenx_description_index_mismatch" ->
        (upper(col("Description")).isin("10X") &&
          !Genomics.is10xIndex(col("index"))),
      "index_not_atcg_or_10x" ->
        (!(col("index").rlike("^[ATCG]+$") || Genomics.is10xIndex(col("index")))))
    val msgs = rules.map { case (name, bad) =>
      when(coalesce(bad, lit(false)), lit(name)).otherwise(lit(null))
    }
    df.withColumn("errors", filter(array(msgs: _*), m => m.isNotNull))
      .filter(size(col("errors")) > 0)
  }

  /** Library-type compatibility (metadata_validation.py:389-495): each
    * (library_source, library_strategy, experiment_type) triple must be a
    * member of the allowed combinations — broadcast membership join, the
    * violations coming back as an error frame. */
  def libraryCompatibilityErrors(df: DataFrame,
      allowed: Seq[(String, String, String)]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ok = allowed.toDF("library_source", "library_strategy", "experiment_type")
    df.join(broadcast(ok),
        Seq("library_source", "library_strategy", "experiment_type"), "left_anti")
      .withColumn("errors", array(lit("incompatible_library_combination")))
  }

  /** The default compatibility universe: the triples produced by the full
    * [[graft.meta.AssayLookup.experimentTypeLookup]] (extend as data, like
    * the reference's lookup). */
  val allowedLibraryCombinations: Seq[(String, String, String)] =
    graft.meta.AssayLookup.experimentTypeLookup
      .map(r => (r.librarySource, r.libraryStrategy, r.experimentType))
      .distinct

  /** Duplicate-key error detection (metadata_validation.py:103-189). */
  def duplicateKeyErrors(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)

  /** Samplesheet-vs-metadata set comparison (metadata_validation.py:497-610):
    * ids on one side only, tagged by direction. */
  def setDifferenceErrors(samplesheet: DataFrame, metadata: DataFrame,
                          ssKey: String, mdKey: String): DataFrame = {
    val ss = samplesheet.select(col(ssKey).as("id")).distinct()
    val md = metadata.select(col(mdKey).as("id")).distinct()
    ss.except(md).withColumn("missing_in", lit("metadata"))
      .unionByName(md.except(ss).withColumn("missing_in", lit("samplesheet")))
  }
}
