package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** bcl2fastq `Stats.json` flattener (check_sequence_index_barcodes.py:33-83).
  *
  * The triple-nested document (ConversionResults[lane].DemuxResults[sample]
  * .IndexMetrics[index] + UnknownBarcodes[lane].Barcodes{seq:count}) becomes
  * one long (lane, sample, index, reads, tag, runid, total_read) frame via
  * three `explode`s — the UDTF shape of SURVEY §2.8, no custom generator.
  * The dynamic-key `Barcodes` object is typed as MapType and exploded.
  * Scales: one Stats.json per run is small, but a fleet of runs read with
  * the same schema unions into one partitioned scan.
  */
object StatsJson {

  val schema: StructType = StructType(Seq(
    StructField("RunId", StringType),
    StructField("ConversionResults", ArrayType(StructType(Seq(
      StructField("LaneNumber", LongType),
      StructField("TotalClustersPF", LongType),
      StructField("DemuxResults", ArrayType(StructType(Seq(
        StructField("SampleId", StringType),
        StructField("NumberReads", LongType),
        StructField("IndexMetrics", ArrayType(StructType(Seq(
          StructField("IndexSequence", StringType))))))))))))),
    StructField("UnknownBarcodes", ArrayType(StructType(Seq(
      StructField("Lane", LongType),
      StructField("Barcodes", MapType(StringType, LongType))))))))

  /** Read one or many Stats.json files (multiLine JSON). */
  def readRaw(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(schema).option("multiLine", true).json(path)

  /** Known-barcode rows: (runid, lane, sample, index, reads). */
  def knownBarcodes(raw: DataFrame): DataFrame =
    raw.select(col("RunId").as("runid"), explode(col("ConversionResults")).as("cr"))
      .select(col("runid"), col("cr.LaneNumber").as("lane"),
        col("cr.TotalClustersPF").as("total_read"),
        explode(col("cr.DemuxResults")).as("dr"))
      .select(col("runid"), col("lane"), col("total_read"),
        col("dr.SampleId").as("sample"), col("dr.NumberReads").as("reads"),
        explode(col("dr.IndexMetrics")).as("im"))
      .select(col("runid"), col("lane"), col("sample"),
        col("im.IndexSequence").as("index"), col("reads"),
        lit("known").as("tag"), col("total_read"))

  /** Unknown-barcode rows: (runid, lane, index, reads). */
  def unknownBarcodes(raw: DataFrame): DataFrame =
    raw.select(col("RunId").as("runid"), explode(col("UnknownBarcodes")).as("ub"))
      .select(col("runid"), col("ub.Lane").as("lane"),
        explode(col("ub.Barcodes")).as(Seq("index", "reads")))
      .select(col("runid"), col("lane"), lit("undetermined").as("sample"),
        col("index"), col("reads"), lit("unknown").as("tag"))

  /** The union frame the QC classifier consumes: per-lane total_read joined
    * onto unknown rows, mapping_ratio + log10 columns added
    * (check_sequence_index_barcodes.py:81-96,152). */
  def barcodeFrame(raw: DataFrame): DataFrame = {
    val known = knownBarcodes(raw)
    val laneTotals = known.select("runid", "lane", "total_read").distinct()
    val unknown = unknownBarcodes(raw).join(laneTotals, Seq("runid", "lane"))
    known.unionByName(unknown.select(known.columns.map(col): _*))
      .withColumn("mapping_ratio", col("reads").cast("double") / col("total_read").cast("double"))
      .withColumn("log_total_read", log(10.0, col("total_read")))
  }
}
