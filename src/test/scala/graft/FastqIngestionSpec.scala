package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipelines.FastqIngestion
import graft.store.MetadataStore

class FastqIngestionSpec extends AnyFunSuite {
  import SparkTestSession._

  /** Write a tiny gzipped fastq with `n` 4-line records. */
  private def writeFastq(dir: java.nio.file.Path, name: String, n: Int): Unit = {
    val f = dir.resolve(name)
    val out = new java.util.zip.GZIPOutputStream(java.nio.file.Files.newOutputStream(f))
    val sb = new StringBuilder
    (1 to n).foreach { i =>
      sb.append(s"@read$i\nACGTACGTACGT\n+\nFFFFFFFFFFFF\n")
    }
    out.write(sb.toString.getBytes); out.close()
  }

  private lazy val fixtureDir = {
    val d = java.nio.file.Files.createTempDirectory("fastq")
    writeFastq(d, "sampA_S1_L001_R1_001.fastq.gz", 12)
    writeFastq(d, "sampA_S1_L001_R2_001.fastq.gz", 12)
    writeFastq(d, "sampB_S2_L002_R1_001.fastq.gz", 7)
    java.nio.file.Files.writeString(d.resolve("notes.txt"), "ignore me")
    d
  }

  private lazy val enriched = {
    val inv = FastqIngestion.scanFastqDir(spark, fixtureDir.toString)
    FastqIngestion.deriveIds(
      FastqIngestion.withChecksumAndCounts(spark,
        FastqIngestion.withParsedNames(inv)),
      platformName = "K00001", flowcellId = "HXXXXX")
  }

  test("inventory scan picks only fastq files and parses the grammar") {
    assert(enriched.count() == 3)
    val a = enriched.filter(col("file_path").endsWith("sampA_S1_L001_R1_001.fastq.gz")).head()
    assert(a.getAs[String]("sample_name") == "sampA")
    assert(a.getAs[String]("lane") == "1" && a.getAs[String]("read_type") == "R1")
  }

  test("distributed read counts match lines/4 and R1==R2 for a pair") {
    val counts = enriched.select("file_path", "n_reads").collect()
      .map(r => r.getString(0).split("/").last -> r.getLong(1)).toMap
    assert(counts("sampA_S1_L001_R1_001.fastq.gz") == 12L)
    assert(counts("sampA_S1_L001_R2_001.fastq.gz") == 12L)
    assert(counts("sampB_S2_L002_R1_001.fastq.gz") == 7L)
  }

  test("md5 matches the on-disk compressed bytes") {
    val p = fixtureDir.resolve("sampB_S2_L002_R1_001.fastq.gz")
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest(java.nio.file.Files.readAllBytes(p)).map("%02x".format(_)).mkString
    val got = enriched.filter(col("file_path").endsWith("sampB_S2_L002_R1_001.fastq.gz"))
      .head().getAs[String]("md5")
    assert(got == expected)
  }

  test("derived ids follow the reference grammar") {
    val a = enriched.filter(col("sample_name") === "sampA").head()
    assert(a.getAs[String]("experiment_igf_id") == "sampA_K00001")
    assert(a.getAs[String]("run_igf_id") == "sampA_K00001_HXXXXX_1")
  }

  test("ingest is idempotent and refreshes read-count attributes") {
    val dir = java.nio.file.Files.createTempDirectory("graft-store").toString
    val store = new MetadataStore(spark, dir)
    val n1 = FastqIngestion.ingest(store, enriched)
    assert(n1 == 3)
    assert(store.read("experiment").count() == 2)
    assert(store.read("run").count() == 2)
    assert(store.read("collection").count() == 2)
    assert(store.read("collection_group").count() == 3)
    val attrs = store.read("run_attribute").collect()
      .map(r => (r.getAs[String]("run_id"), r.getAs[String]("attribute_name")) -> r.getAs[String]("attribute_value")).toMap
    assert(attrs(("sampA_K00001_HXXXXX_1", "R1_READ_COUNT")) == "12")
    assert(attrs(("sampA_K00001_HXXXXX_1", "R2_READ_COUNT")) == "12")
    assert(attrs(("sampB_K00001_HXXXXX_2", "R1_READ_COUNT")) == "7")
    // re-ingest: nothing new inserted, attributes still correct
    val n2 = FastqIngestion.ingest(store, enriched)
    assert(n2 == 0)
    assert(store.read("file").count() == 3)
  }
}
