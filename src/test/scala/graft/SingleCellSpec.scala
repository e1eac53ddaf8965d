package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipelines.SingleCell

class SingleCellSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val plate = Map(
    "SI-GA-A1" -> Seq("GGTTTACT", "CTAAACGG", "TCGGCGTC", "AACCGTAA"))

  private val sheet = Seq(
    ("1", "IGF0003", "sc-samp", "SI-GA-A1", ""),
    ("1", "IGF0001", "bulk-samp", "ATTACTCG", "AGGCTATA"))
    .toDF("Lane", "Sample_ID", "Sample_Name", "index", "index2")

  test("10X rows explode x4 with suffixed ids and preserved originals") {
    val out = SingleCell.explodeTenX(sheet, SingleCell.plateDF(spark, plate))
    assert(out.count() == 5)
    val sc = out.filter(col("Original_Sample_ID") === "IGF0003")
      .orderBy("Sample_ID").collect()
    assert(sc.map(_.getAs[String]("Sample_ID")).toSeq ==
      Seq("IGF0003_1", "IGF0003_2", "IGF0003_3", "IGF0003_4"))
    assert(sc.map(_.getAs[String]("index")).toSeq == plate("SI-GA-A1"))
    assert(sc.forall(_.getAs[String]("Original_index") == "SI-GA-A1"))
    val bulk = out.filter(col("Sample_ID") === "IGF0001").head()
    assert(bulk.getAs[String]("index") == "ATTACTCG")
    assert(bulk.getAs[String]("Original_Sample_ID") == "IGF0001")
  }

  test("plate JSON readers parse both public formats") {
    val d = java.nio.file.Files.createTempDirectory("plates")
    val single = d.resolve("single.json")
    java.nio.file.Files.writeString(single,
      """[["SI-GA-A1", ["GGTTTACT","CTAAACGG","TCGGCGTC","AACCGTAA"]],
        | ["SI-GA-A2", ["TTTCATGA","ACGTCCCT","CGCATGTG","GAAGGAAC"]]]""".stripMargin)
    val sp = SingleCell.readSingleIndexPlate(single.toString)
    assert(sp("SI-GA-A1") == Seq("GGTTTACT", "CTAAACGG", "TCGGCGTC", "AACCGTAA"))
    assert(sp.size == 2)

    val dual = d.resolve("dual.json")
    java.nio.file.Files.writeString(dual,
      """{"SI-TT-A1": {"index(i7)": "GTAACATGCG",
        |  "index2_workflow_a(i5)": "AGTGTTACCT",
        |  "index2_workflow_b(i5)": "AGGTAACACT"}}""".stripMargin)
    val dd = SingleCell.readDualIndexPlate(spark, dual.toString).head()
    assert(dd.getAs[String]("plate_code") == "SI-TT-A1")
    assert(dd.getAs[String]("i5_workflow_b") == "AGGTAACACT")
  }

  test("dual-index replacement honours workflow and revcomp") {
    val dual = Seq(("SI-TT-A1", "GTAACATGCG", "AGTGTTACCT", "AGGTAACACT"))
      .toDF("plate_code", "i7", "i5_workflow_a", "i5_workflow_b")
    val df = Seq(("IGF9", "SI-TT-A1", "")).toDF("Sample_ID", "index", "index2")
    val a = SingleCell.replaceDualIndex(df, dual, workflowA = true, revCompI5 = false).head()
    assert(a.getAs[String]("index") == "GTAACATGCG")
    assert(a.getAs[String]("index2") == "AGTGTTACCT")
    val bRc = SingleCell.replaceDualIndex(df, dual, workflowA = false, revCompI5 = true).head()
    assert(bRc.getAs[String]("index2") == "AGTGTTACCT") // revComp(AGGTAACACT)
    val untouched = SingleCell.replaceDualIndex(
      Seq(("IGF1", "ATTACTCG", "AGGCTATA")).toDF("Sample_ID", "index", "index2"),
      dual, workflowA = true, revCompI5 = false).head()
    assert(untouched.getAs[String]("index") == "ATTACTCG")
    assert(untouched.getAs[String]("index2") == "AGGCTATA")
  }

  test("executeMerge concatenates gz fragments into one valid gzip stream") {
    val dir = java.nio.file.Files.createTempDirectory("scmerge")
    def gz(name: String, text: String): String = {
      val p = dir.resolve(name)
      val os = new java.util.zip.GZIPOutputStream(java.nio.file.Files.newOutputStream(p))
      os.write(text.getBytes); os.close(); p.toString
    }
    val f1 = gz("a_1.fastq.gz", "@r1\nACGT\n+\nFFFF\n")
    val f2 = gz("a_2.fastq.gz", "@r2\nGGTT\n+\nFFFF\n")
    val plan = Seq(("1", "IGF0003", "R1", Seq(f1, f2), 2L))
      .toDF("lane", "Original_Sample_ID", "read_type", "fragment_paths", "n_fragments")
    val out = java.nio.file.Files.createTempDirectory("scout").toString
    val merged = SingleCell.executeMerge(spark, plan, out).collect()
    assert(merged.length == 1 && merged.head.getAs[Int]("n_fragments") == 2)
    // concatenated gzip members decompress to the concatenated records
    val path = java.nio.file.Paths.get(new java.net.URI(
      merged.head.getAs[String]("merged_path")).getPath)
    val in = new java.util.zip.GZIPInputStream(java.nio.file.Files.newInputStream(path))
    val text = new String(in.readAllBytes()); in.close()
    assert(text == "@r1\nACGT\n+\nFFFF\n@r2\nGGTT\n+\nFFFF\n")
  }

  test("library compatibility violations surface as an error frame") {
    import graft.pipelines.MetadataPipeline
    val md = Seq(
      ("GENOMIC", "WGS", "WGS", "ok"),
      ("GENOMIC", "RNA-SEQ", "WGS", "bad"))
      .toDF("library_source", "library_strategy", "experiment_type", "tag")
    val errs = MetadataPipeline.libraryCompatibilityErrors(md,
      MetadataPipeline.allowedLibraryCombinations)
    assert(errs.collect().map(_.getAs[String]("tag")).toSeq == Seq("bad"))
  }

  test("merge-back groups fragments per original sample in suffix order") {
    val frags = Seq(
      ("1", "IGF0003", "IGF0003_2", "R1", "/f/p2.fastq.gz"),
      ("1", "IGF0003", "IGF0003_1", "R1", "/f/p1.fastq.gz"),
      ("1", "IGF0003", "IGF0003_4", "R1", "/f/p4.fastq.gz"),
      ("1", "IGF0003", "IGF0003_3", "R1", "/f/p3.fastq.gz"),
      ("2", "IGF0003", "IGF0003_1", "R1", "/f/q1.fastq.gz"))
      .toDF("lane", "Original_Sample_ID", "Sample_ID", "read_type", "file_path")
    val merged = SingleCell.mergeBackPlan(frags)
    assert(merged.count() == 2)
    val lane1 = merged.filter(col("lane") === "1").head()
    assert(lane1.getAs[Long]("n_fragments") == 4)
    assert(lane1.getSeq[String](merged.columns.indexOf("fragment_paths")) ==
      Seq("/f/p1.fastq.gz", "/f/p2.fastq.gz", "/f/p3.fastq.gz", "/f/p4.fastq.gz"))
  }
}
