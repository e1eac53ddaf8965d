package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Eav
import graft.pipelines.{JsonSchemaValidator, MetadataPipeline}
import graft.sources.Sinks
import graft.store.MetadataStore

/** The §3.2 lifecycle end-to-end: raw CSV → reformat → validate →
  * EAV melt → store → pivot back — every stage is a module under test
  * elsewhere; this pins their composition. */
class MetadataLifecycleSpec extends AnyFunSuite {
  import SparkTestSession._

  private val rawCsv =
    """sample_igf_id,project_igf_id,name,email_id,library_preparation,species_text,expected_reads
      |IGF sample 1,IGFQ0001:user,Some  User!,u@x.org,Whole Genome Sequencing - Sample,human,
      |IGF-sample-2,IGFQ0002,Other User,o@x.org,RNA Sequencing - Total RNA,mouse,5000000
      |bad id!,IGFQ0003,Third User,bad-email,Exotic Prep,axolotl,
      |""".stripMargin

  test("csv -> reformat -> validate -> melt -> store -> pivot round-trip") {
    // 1. read raw CSV all-string
    val p = java.nio.file.Files.createTempFile("md", ".csv")
    java.nio.file.Files.writeString(p, rawCsv)
    val raw = Sinks.readCsvAllString(spark, p.toString)
    assert(raw.count() == 3)

    // 2. reformat (normalize + lookups + defaults)
    val reformatted = MetadataPipeline.reformat(raw)

    // 3. schema validation as error frames
    val schema =
      """{"required": ["sample_igf_id", "email_id"],
        |"properties": {
        |  "sample_igf_id": {"pattern": "^IGF[a-zA-Z0-9-_]+$"},
        |  "email_id": {"pattern": "^\\S+@\\S+$"},
        |  "expected_reads": {"type": "integer"}}}""".stripMargin
    val rules = JsonSchemaValidator.compile(schema, reformatted.columns.toSeq)
    val errs = JsonSchemaValidator.errorRows(reformatted, rules)
    val badRows = errs.select("sample_igf_id", "errors").collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toSet).toMap
    // 'bad id!' normalizes to 'bad-id-' -> still fails the IGF pattern,
    // and its email fails the shape check
    assert(badRows.keySet == Set("bad-id"))
    assert(badRows("bad-id").contains("pattern:sample_igf_id"))
    assert(badRows("bad-id").contains("pattern:email_id"))

    // 4. valid rows melt into (main row, EAV attributes) and store
    val valid = JsonSchemaValidator.withErrors(reformatted, rules)
      .filter(size(col("errors")) === 0).drop("errors")
    val mainCols = Seq("sample_igf_id", "project_igf_id", "name", "email_id")
    val attrCols = Seq("experiment_type", "library_source", "library_strategy",
      "expected_reads", "expected_lanes", "taxon_id")
    val store = new MetadataStore(spark,
      java.nio.file.Files.createTempDirectory("mdstore").toString)
    store.create("sample", valid.select(mainCols.map(col): _*))
    store.create("sample_attribute",
      Eav.melt(valid, Seq("sample_igf_id"), attrCols))
    assert(store.read("sample").count() == 2)
    val attrs = store.read("sample_attribute")
    assert(attrs.count() == 2 * attrCols.size) // no nulls among these

    // 5. pivot the EAV back wide and check a value survived the round trip
    val wide = Eav.pivot(attrs, Seq("sample_igf_id"), attrCols)
    val r = wide.filter(col("sample_igf_id") === "IGF-sample-1").head()
    assert(r.getAs[String]("library_strategy") == "WGS")
    assert(r.getAs[String]("expected_reads") == "2000000")
    assert(r.getAs[String]("taxon_id") == "9606")
  }
}
