package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipelines.{JsonSchemaValidator, MetadataPipeline}

class MetadataPipelineSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val raw = Seq(
    ("IGF sample 1", "IGFQ0001:user", "Some  User!", "u@x.org",
      "Whole Genome Sequencing - Sample", "human", null),
    ("IGF-sample-2", "IGFQ0002", "Other User", "o@x.org",
      "RNA Sequencing - Total RNA", "mouse", "5000000"))
    .toDF("sample_igf_id", "project_igf_id", "name", "email_id",
      "library_preparation", "species_text", "expected_reads")

  test("reformat: canonical columns, normalization, lookups, defaults") {
    val out = MetadataPipeline.reformat(raw)
    MetadataPipeline.canonicalColumns.foreach(c => assert(out.columns.contains(c), c))
    val r1 = out.filter(col("email_id") === "u@x.org").head()
    assert(r1.getAs[String]("sample_igf_id") == "IGF-sample-1")
    assert(r1.getAs[String]("project_igf_id") == "IGFQ0001")
    assert(r1.getAs[String]("name") == "Some-User")
    assert(r1.getAs[String]("library_strategy") == "WGS")
    assert(r1.getAs[String]("taxon_id") == "9606")
    assert(r1.getAs[String]("expected_reads") == "2000000")
    val r2 = out.filter(col("email_id") === "o@x.org").head()
    assert(r2.getAs[String]("experiment_type") == "TOTAL-RNA")
    assert(r2.getAs[String]("expected_reads") == "5000000")
  }

  test("unknown assay/species fall back to UNKNOWN/null") {
    val odd = Seq(("IGFX", "P", "n", "e@x", "Exotic Prep", "axolotl", null))
      .toDF("sample_igf_id", "project_igf_id", "name", "email_id",
        "library_preparation", "species_text", "expected_reads")
    val r = MetadataPipeline.reformat(odd).head()
    assert(r.getAs[String]("library_strategy") == "UNKNOWN")
    assert(r.getAs[String]("taxon_id") == null)
  }

  test("empty-column pruning drops all-empty/UNKNOWN columns only") {
    val df = Seq(("a", "", "UNKNOWN", "x"), ("b", "", "unknown", "")).toDF("keep1", "dead1", "dead2", "keep2")
    val out = MetadataPipeline.pruneEmptyColumns(df, Seq("dead1", "dead2", "keep2"))
    assert(out.columns.toSeq == Seq("keep1", "keep2"))
  }

  test("semantic rules flag bad samplesheet rows as an error frame") {
    val ss = Seq(
      ("IGF01", "IGF01", "ATTACTCG", "", "", ""),          // id == name
      ("IGF02", "samp2", "SI-GA-A1", "", "", ""),          // 10X index, no 10X description -> ok
      ("IGF03", "samp3", "ATTACTCG", "AGGCTATA", "", ""),  // index2 without I5 id
      ("IGF04", "samp4", "NNNNNNNN", "", "", ""),          // invalid index chars
      ("IGF05", "samp5", "ATTACTCG", "", "", "10X"))       // 10X description, non-10X index
      .toDF("Sample_ID", "Sample_Name", "index", "index2", "I5_Index_ID", "Description")
    val errs = MetadataPipeline.semanticErrors(ss)
      .select(col("Sample_ID"), explode(col("errors")).as("e"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toSet
    assert(errs == Set(
      "IGF01" -> "sample_id_equals_name",
      "IGF03" -> "index2_without_i5",
      "IGF04" -> "index_not_atcg_or_10x",
      "IGF05" -> "tenx_description_index_mismatch"))
  }

  test("duplicate keys and set differences surface as data") {
    val ss = Seq(("1", "ATTACTCG"), ("1", "ATTACTCG"), ("2", "TCCGGAGA"))
      .toDF("Lane", "index")
    val dups = MetadataPipeline.duplicateKeyErrors(ss, Seq("Lane", "index")).collect()
    assert(dups.length == 1 && dups.head.getAs[Long]("n") == 2)

    val md = Seq("P1", "P2").toDF("project_igf_id")
    val sheet = Seq("P2", "P3").toDF("Sample_Project")
    val diff = MetadataPipeline.setDifferenceErrors(sheet, md, "Sample_Project", "project_igf_id")
      .collect().map(r => r.getString(0) -> r.getString(1)).toSet
    assert(diff == Set("P3" -> "metadata", "P1" -> "samplesheet"))
  }

  test("JSON-schema compiler: pattern/enum/required/type rules") {
    val schema =
      """{
        |  "type": "object",
        |  "required": ["Sample_ID", "index"],
        |  "properties": {
        |    "Sample_ID": {"type": "string", "pattern": "^IGF[a-zA-Z0-9-_]+$"},
        |    "index": {"type": "string", "pattern": "^[ATCG]+$|^SI-[GNT][ATN]-[A-Z][0-9]+$"},
        |    "Lane": {"enum": ["1", "2", "3", "4", "5", "6", "7", "8"]},
        |    "expected_reads": {"type": "integer"}
        |  }
        |}""".stripMargin
    val df = Seq(
      ("IGF001", "ATTACTCG", "1", "2000000"),
      ("bad id", "ATTACTCG", "9", "2000000"),
      ("IGF003", "ATTQ", "2", "many"),
      (null, "SI-GA-A1", "3", "100"))
      .toDF("Sample_ID", "index", "Lane", "expected_reads")
    val rules = JsonSchemaValidator.compile(schema, df.columns.toSeq)
    assert(rules.nonEmpty)
    val errs = JsonSchemaValidator.errorRows(df, rules)
      .select(col("index"), col("errors")).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toSet).toMap
    assert(errs("ATTACTCG") == Set("pattern:Sample_ID", "enum:Lane"))
    assert(errs("ATTQ") == Set("pattern:index", "type:expected_reads"))
    assert(errs("SI-GA-A1") == Set("required:Sample_ID"))
    assert(!errs.contains("ATTACTCG") || errs.size == 3)
  }
}
