package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Eav
import graft.pipelines.{BarcodeQc, PoolingReport}
import graft.sources.{SampleSheet, StatsJson}

/** The barcode-QC lifecycle end-to-end (SURVEY §3's fourth flow): Stats.json
  * + SampleSheet → barcode frame → classifier → lane summary → gviz. */
class BarcodeLifecycleSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("stats + samplesheet to classified gviz report") {
    // samplesheet provides the lane's known indexes in order
    val sheet = SampleSheet.parse(GenomicsFixtures.sampleSheetV1)
    val known = SampleSheet.withCleanIndexes(SampleSheet.toDF(spark, sheet))
      .filter(col("Lane") === "1")
      .select(col("Lane").cast("long").as("lane"), col("c_index"))
      .collect().zipWithIndex
      .map { case (r, i) => (r.getLong(0), i, r.getString(1)) }
      .toSeq.toDF("lane", "pos", "known_index")

    val statsJson =
      """{"RunId": "r1", "ConversionResults": [
        |  {"LaneNumber": 1, "TotalClustersPF": 10000,
        |   "DemuxResults": [{"SampleId": "IGF0001", "NumberReads": 9000,
        |     "IndexMetrics": [{"IndexSequence": "ATTACTCG+AGGCTATA"}]}]}],
        | "UnknownBarcodes": [{"Lane": 1, "Barcodes": {"CGAGTAAT+AGGCTATA": 800}}]}""".stripMargin
    val p = java.nio.file.Files.createTempFile("stats", ".json")
    java.nio.file.Files.writeString(p, statsJson)

    val frame = StatsJson.barcodeFrame(StatsJson.readRaw(spark, p.toString))
    val classified = BarcodeQc.classify(frame, known, "NEXTSEQ500")
    val tag = classified.filter(col("tag") === "unknown").head().getAs[String]("final_tag")
    assert(tag == "only_index_1_revcomp")

    val summary = BarcodeQc.laneSummary(classified)
    val pcts = summary.collect().map(r => r.getAs[String]("tag") -> r.getAs[Double]("pct")).toMap
    assert(math.abs(pcts("known") + pcts("unknown") - 100.0) < 1e-9)

    val json = PoolingReport.gvizJson(summary)
    import org.json4s.jackson.JsonMethods
    assert(JsonMethods.parse(json) != null)
    assert(json.contains("\"known\""))
  }

  test("dynamic EAV pivot discovers the attribute universe") {
    val long = Seq((1L, "a", "x"), (1L, "b", "y"), (2L, "a", "z"))
      .toDF("id", "attribute_name", "attribute_value")
    assert(Eav.attributeRegistry(long) == Seq("a", "b"))
    val wide = Eav.pivotDynamic(long, Seq("id"))
    assert(wide.columns.toSeq == Seq("id", "a", "b"))
    assert(wide.filter(col("id") === 2).head().getAs[String]("b") == null)
  }
}
