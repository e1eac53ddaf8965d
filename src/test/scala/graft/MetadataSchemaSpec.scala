package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.meta.{MetadataSchema, MetadataStar}

/** The typed schema module: 30 tables, full enum domains, and the star
  * derivation conforming to them. */
class MetadataSchemaSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val star = MetadataStar(spark, sf)

  test("all 30 reference tables are declared") {
    assert(MetadataSchema.tables.size == 32) // 22 core + 2 extra attr + 8 cosmx
    // the reference's headline domains ship in full
    assert(MetadataSchema.libraryStrategy.size == 40)
    assert(MetadataSchema.experimentType.size == 70)
    assert(MetadataSchema.librarySource.size == 9)
    // spot-check verbatim oddities preserved from igfTables.py
    assert(MetadataSchema.libraryStrategy.contains("CHIRP SEQ")) // space, not dash
    assert(MetadataSchema.experimentType.contains("TENX-TRANSCRIPTOME-3P"))
  }

  test("star tables conform to the declared StructTypes") {
    for ((name, df) <- Seq(
        "project" -> star.project, "sample" -> star.sample,
        "platform" -> star.platform, "seqrun" -> star.seqrun,
        "experiment" -> star.experiment, "run" -> star.run,
        "run_attribute" -> star.runAttribute, "collection" -> star.collection,
        "collection_group" -> star.collectionGroup, "file" -> star.file,
        "pipeline" -> star.pipeline, "pipeline_seed" -> star.pipelineSeed,
        "sample_attribute" -> star.sampleAttribute,
        "user" -> star.user, "project_user" -> star.projectUser,
        "seqrun_stats" -> star.seqrunStats,
        "collection_attribute" -> star.collectionAttribute)) {
      assert(MetadataSchema.conforms(df, name), s"$name schema drift:\n${df.schema}")
    }
  }

  test("star tables satisfy their enum domains and keys are unique") {
    for ((name, df) <- Seq(
        "project" -> star.project, "sample" -> star.sample,
        "experiment" -> star.experiment, "run" -> star.run,
        "collection" -> star.collection, "file" -> star.file,
        "pipeline_seed" -> star.pipelineSeed)) {
      assert(MetadataSchema.violations(df, name).count() == 0, s"$name violations")
      val pk = MetadataSchema.tables(name).fields.head.name
      assert(df.select(pk).distinct().count() == df.count(), s"$name pk dup")
    }
  }

  test("violations flags out-of-domain enums and null NOT-NULLs") {
    val bad = Seq(
      (1L, "IGFP1", "ok", "ACTIVE", "FASTQ"),
      (2L, "IGFP2", "bad-status", "RETIRED", "FASTQ"),
      (3L, null, "null-igf-id", "ACTIVE", "PDF"))
      .toDF("project_id", "project_igf_id", "project_name", "status", "deliverable")
    val v = MetadataSchema.violations(bad, "project")
      .select("column", "violation", "value").as[(String, String, String)]
      .collect().toSet
    assert(v.contains(("status", "enum_violation", "RETIRED")))
    assert(v.contains(("deliverable", "enum_violation", "PDF")))
    assert(v.contains(("project_igf_id", "null_violation", null)))
    assert(v.size == 3)
  }

  test("the experiment fact spreads across the full enum domains") {
    // modulo indexing must cover every strategy/type value at sf >= 0.001
    val e = star.experiment
    assert(e.select("library_strategy").distinct().count() == 40)
    assert(e.select("experiment_type").distinct().count() == 70)
    assert(e.select("library_source").distinct().count() == 9)
  }
}
