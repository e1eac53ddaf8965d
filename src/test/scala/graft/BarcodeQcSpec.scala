package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipelines.BarcodeQc
import graft.sources.StatsJson

class BarcodeQcSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val statsJson: String =
    """{
      |  "RunId": "200101_M00001_0001_000000000-ABCDE",
      |  "ConversionResults": [
      |    {"LaneNumber": 1, "TotalClustersPF": 100000,
      |     "DemuxResults": [
      |       {"SampleId": "IGF0001", "NumberReads": 60000,
      |        "IndexMetrics": [{"IndexSequence": "ATTACTCG+AGGCTATA"}]},
      |       {"SampleId": "IGF0002", "NumberReads": 30000,
      |        "IndexMetrics": [{"IndexSequence": "TCCGGAGA+GCCTCTAT"}]}]}],
      |  "UnknownBarcodes": [
      |    {"Lane": 1, "Barcodes": {
      |       "CGAGTAAT+AGGCTATA": 4000,
      |       "ATTACTCG+TATAGCCT": 2500,
      |       "GGGGGGGG": 1500,
      |       "ATTACT": 900,
      |       "TTTTGTGT+CCCCACAC": 5}}]
      |}""".stripMargin

  private lazy val raw = {
    val path = java.nio.file.Files.createTempFile("stats", ".json")
    java.nio.file.Files.writeString(path, statsJson)
    StatsJson.readRaw(spark, path.toString)
  }

  test("Stats.json flattens to known+unknown rows with mapping ratio") {
    val frame = StatsJson.barcodeFrame(raw)
    assert(frame.filter(col("tag") === "known").count() == 2)
    assert(frame.filter(col("tag") === "unknown").count() == 5)
    val r = frame.filter(col("index") === "CGAGTAAT+AGGCTATA").head()
    assert(math.abs(r.getAs[Double]("mapping_ratio") - 0.04) < 1e-12)
    assert(r.getAs[Long]("total_read") == 100000L)
  }

  test("classifier reproduces the reference CASE semantics") {
    val known = Seq(
      (1L, 0, "ATTACTCG+AGGCTATA"),
      (1L, 1, "TCCGGAGA+GCCTCTAT")).toDF("lane", "pos", "known_index")
    val out = BarcodeQc.classify(StatsJson.barcodeFrame(raw), known, "NEXTSEQ500")
    val tags = out.filter(col("tag") === "unknown")
      .select("index", "final_tag").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    // index1 revcomp of known[0], index2 exact -> only_index_1_revcomp
    assert(tags("CGAGTAAT+AGGCTATA") == "only_index_1_revcomp")
    // index1 exact + index2 revcomp: the reference's CASE 5 is unreachable
    // (u1==k1 implies CASE 1 already matched), so this stays unknown —
    // faithfully reproduced
    assert(tags("ATTACTCG+TATAGCCT") == "unknown")
    // two-color platform, no case match, all-G index1
    assert(tags("GGGGGGGG") == "index_1_G_homopolymer")
    // shorter single unknown prefix-matches known index1 -> mix_index_match
    assert(tags("ATTACT") == "mix_index_match")
    // below mapping-ratio threshold: untouched
    assert(tags("TTTTGTGT+CCCCACAC") == "unknown")
  }

  test("classifier last-write-wins across known index order") {
    // unknown GGAATT: prefix of known pos0 (GGAATTCC) -> mix_index_match;
    // revcomp of known pos1 (AATTCC) -> index_1_revcomp. Later pos wins.
    val bc = Seq(
      ("r1", 1L, "undetermined", "GGAATT", 5000L, "unknown", 100000L))
      .toDF("runid", "lane", "sample", "index", "reads", "tag", "total_read")
      .withColumn("mapping_ratio", col("reads") / col("total_read"))
      .withColumn("log_total_read", log(10.0, col("total_read")))
    val k1 = Seq((1L, 0, "GGAATTCC"), (1L, 1, "AATTCC")).toDF("lane", "pos", "known_index")
    val o1 = BarcodeQc.classify(bc, k1, "HISEQ4000")
    assert(o1.head().getAs[String]("final_tag") == "index_1_revcomp")
    // reversed order: prefix-match now wins
    val k2 = Seq((1L, 0, "AATTCC"), (1L, 1, "GGAATTCC")).toDF("lane", "pos", "known_index")
    val o2 = BarcodeQc.classify(bc, k2, "HISEQ4000")
    assert(o2.head().getAs[String]("final_tag") == "mix_index_match")
  }

  test("CASE 1: full dual-index match tags as known; partial stays untagged") {
    val bc = Seq(
      ("r1", 1L, "undetermined", "ATTACTCG+AGGCTATA", 5000L, "unknown", 100000L),
      ("r1", 1L, "undetermined", "ATTACTCG+CCCCCCCC", 4000L, "unknown", 100000L))
      .toDF("runid", "lane", "sample", "index", "reads", "tag", "total_read")
      .withColumn("mapping_ratio", col("reads") / col("total_read"))
      .withColumn("log_total_read", log(10.0, col("total_read")))
    val known = Seq((1L, 0, "ATTACTCG+AGGCTATA")).toDF("lane", "pos", "known_index")
    val tags = BarcodeQc.classify(bc, known, "HISEQ4000")
      .collect().map(r => r.getAs[String]("index") -> r.getAs[String]("final_tag")).toMap
    assert(tags("ATTACTCG+AGGCTATA") == "known")
    // index1 equal but index2 differs (both present): CASE 1 consumes the
    // pair without assigning -> unknown, exactly like the reference
    assert(tags("ATTACTCG+CCCCCCCC") == "unknown")
  }

  test("non-two-color platform leaves G homopolymer as unknown") {
    val bc = Seq(("r1", 1L, "undetermined", "GGGGGGGG", 5000L, "unknown", 100000L))
      .toDF("runid", "lane", "sample", "index", "reads", "tag", "total_read")
      .withColumn("mapping_ratio", col("reads") / col("total_read"))
      .withColumn("log_total_read", log(10.0, col("total_read")))
    val known = Seq((1L, 0, "ATTACTCG")).toDF("lane", "pos", "known_index")
    val out = BarcodeQc.classify(bc, known, "HISEQ4000")
    assert(out.head().getAs[String]("final_tag") == "unknown")
  }

  test("lane summary aggregates reads per tag") {
    val s = BarcodeQc.laneSummary(StatsJson.barcodeFrame(raw))
      .filter(col("tag") === "unknown").head()
    assert(s.getAs[Long]("reads") == 8905L)
  }
}
