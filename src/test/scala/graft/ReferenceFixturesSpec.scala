package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.meta.AssayLookup
import graft.pipelines.{JsonSchemaValidator, MetadataPipeline}

/** Parity against the reference's OWN fixtures: the shipped validation
  * schemas (data/validation_schema JSON files) and the reformat test cases
  * (test/process/reformat_metadata_file_test.py). These assert our full
  * 85-row lookup + key-selection semantics reproduce the reference's
  * expected outputs on its own inputs. */
class ReferenceFixturesSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val refData = "/root/reference/data"

  private def assayDf(prep: String, desc: String, ltype: String) =
    AssayLookup.withAssayInfo(
      Seq((prep, desc, ltype)).toDF("prep", "desc", "ltype"),
      col("prep"), col("desc"), col("ltype")).head()

  test("get_assay_info fixtures (reformat_metadata_file_test.py:23-66)") {
    // test 1: plain library_preparation match, case-insensitive
    val t1 = assayDf("Whole Genome Sequencing Human - Sample", "NA", "NA")
    assert(t1.getAs[String]("library_source") == "GENOMIC")
    assert(t1.getAs[String]("library_strategy") == "WGS")
    assert(t1.getAs[String]("experiment_type") == "WGS")
    assert(t1.getAs[String]("biomaterial_type") == "UNKNOWN")
    // test 2: single-cell 3'
    val t2 = assayDf("Single Cell -3' RNAseq- Sample", "NA", "NA")
    assert(t2.getAs[String]("library_source") == "TRANSCRIPTOMIC_SINGLE_CELL")
    assert(t2.getAs[String]("experiment_type") == "TENX-TRANSCRIPTOME-3P")
    assert(t2.getAs[String]("biomaterial_type") == "UNKNOWN")
    // test 3: nuclei variant flips biomaterial_type
    val t3 = assayDf("Single Cell -3' RNAseq- Sample Nuclei", "NA", "NA")
    assert(t3.getAs[String]("experiment_type") == "TENX-TRANSCRIPTOME-3P")
    assert(t3.getAs[String]("biomaterial_type") == "SINGLE_NUCLEI")
    // test 4: premade library routes through library_type
    val t4 = assayDf("Not Applicable", "Pre Made Library", "SINGLE CELL-3' RNA (NUCLEI)")
    assert(t4.getAs[String]("library_source") == "TRANSCRIPTOMIC_SINGLE_CELL")
    assert(t4.getAs[String]("library_strategy") == "RNA-SEQ")
    assert(t4.getAs[String]("experiment_type") == "TENX-TRANSCRIPTOME-3P")
    assert(t4.getAs[String]("biomaterial_type") == "SINGLE_NUCLEI")
  }

  test("species fixtures (reformat_metadata_file_test.py:71-79)") {
    val r = AssayLookup.withSpeciesInfo(
      Seq("human").toDF("species_text"), col("species_text")).head()
    assert(r.getAs[String]("taxon_id") == "9606")
    assert(r.getAs[String]("scientific_name") == "Homo sapiens")
    assert(r.getAs[String]("species_name") == "HG38")
  }

  test("reformat over the reference's incorrect_metadata.csv fixture") {
    // reformat_metadata_file_test.py:97-110 expectations
    val raw = spark.read.option("header", "true")
      .csv(s"$refData/metadata_validation/metadata_reformatting/incorrect_metadata.csv")
    val out = MetadataPipeline.reformat(raw).cache()
    val igf1 = out.filter(col("sample_igf_id") === "IGF1").head()
    assert(igf1.getAs[String]("library_strategy") == "TARGETED-CAPTURE")
    val igf2 = out.filter(col("sample_igf_id") === "IGF2").head()
    assert(igf2.getAs[String]("experiment_type") == "TENX-TRANSCRIPTOME-3P")
    assert(igf2.getAs[String]("biomaterial_type") == "SINGLE_NUCLEI")
    // sample ids are normalized: 'IGF3[' → IGF3 etc.
    assert(out.filter(col("sample_igf_id") === "IGF3").count() == 1)
    // project id cleanup: 'IGFQ1 scRNA-seq5primeFB' → dash-joined
    assert(out.filter(col("project_igf_id") === "IGFQ1-scRNA-seq5primeFB").count() == 5)
    out.unpersist()
  }

  test("the shipped metadata_validation.json compiles and classifies rows") {
    val schemaJson = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$refData/validation_schema/metadata_validation.json")))
    val df = Seq(
      ("IGFQ000123_user_1-2-3", "IGF0001", "Some User", "s.user@ic.ac.uk"),
      ("bad project!", "IGF0002", "Some User", "s.user@ic.ac.uk"),  // bad project pattern
      ("IGFQ000123_user_1-2-3", "IGF0003", "Some User", "not-an-email"))
      .toDF("project_igf_id", "sample_igf_id", "name", "email_id")
    val rules = JsonSchemaValidator.compile(schemaJson, df.columns.toSeq)
    assert(rules.nonEmpty, "no rules compiled from the shipped schema")
    val out = JsonSchemaValidator.withErrors(df, rules)
    val errs = out.select(col("sample_igf_id"), col("errors")).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(errs("IGF0001").isEmpty, s"clean row flagged: ${errs("IGF0001")}")
    assert(errs("IGF0002").exists(_.startsWith("pattern:project_igf_id")))
    assert(errs("IGF0003").exists(_.startsWith("pattern:email_id")))
  }

  test("the shipped samplesheet_validation.json compiles and flags bad lanes") {
    val schemaJson = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$refData/validation_schema/samplesheet_validation.json")))
    val df = Seq(
      ("1", "IGF0001", "sample-1", "ATTACTCG"),
      ("9", "IGF0002", "sample 2", "ATTACTCG")) // lane 9 invalid on every platform
      .toDF("Lane", "Sample_ID", "Sample_Name", "index")
    val rules = JsonSchemaValidator.compile(schemaJson, df.columns.toSeq)
    assert(rules.nonEmpty)
    val out = JsonSchemaValidator.withErrors(df, rules)
    val bad = out.filter(size(col("errors")) > 0)
      .select("Sample_ID").as[String].collect().toSet
    assert(!bad.contains("IGF0001"))
    assert(bad.contains("IGF0002"))
  }

  test("cosmx count-file validation against the shipped rna schema") {
    // validate_cosmx_count_file (cosmxutils.py:374-420) semantics: the
    // count json is an array of per-FOV QC records checked against
    // cosmx_rna_count_file_validation_schema.json
    val schemaJson = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(
        s"$refData/validation_schema/cosmx_rna_count_file_validation_schema.json")))
    val good = Seq(
      ("1", "250.25", "120.5", "4000", "98.20"),
      ("2", "180.00", "90.1", "3500", "97.10"))
      .toDF("fov_id", "mean_transcript_per_cell", "mean_unique_genes_per_cell",
        "number_non_empty_cells", "pct_non_empty_cells")
    val rules = JsonSchemaValidator.compile(schemaJson, good.columns.toSeq)
    assert(rules.nonEmpty)
    val flagged = JsonSchemaValidator.withErrors(good, rules)
      .filter(size(col("errors")) > 0)
    assert(flagged.count() == 0)
    assert(JsonSchemaValidator.documentErrors(good, schemaJson).isEmpty)

    // type violations surface per row; duplicate rows break uniqueItems
    val bad = Seq(("x1", "n/a", "90.1", "3500", "97.10"))
      .toDF(good.columns: _*)
    val badFlagged = JsonSchemaValidator.withErrors(bad, rules)
      .select("errors").head.getSeq[String](0)
    assert(badFlagged.exists(_.startsWith("type:fov_id")))
    assert(badFlagged.exists(_.startsWith("type:mean_transcript_per_cell")))
    assert(JsonSchemaValidator.documentErrors(good.limit(1).union(good.limit(1)),
      schemaJson) == Seq("uniqueItems"))
    assert(JsonSchemaValidator.documentErrors(good.limit(0), schemaJson)
      .exists(_.startsWith("minItems")))
  }
}
