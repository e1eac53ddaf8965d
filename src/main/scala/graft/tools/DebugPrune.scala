package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Scratch: debug streaming segment dedup divergence (round 6). */
object DebugPrune {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = "/root/testdata/sf0.001"
    val docs = graft.Tables(spark, sf).documents
    val stageDir = java.nio.file.Files.createTempDirectory("seg-stream").toString
    for ((lo, hi) <- Seq((0L, 150L), (150L, 320L), (320L, 10000L))) {
      docs.filter(col("doc_id") >= lo && col("doc_id") < hi)
        .repartition(1).write.mode("append").parquet(stageDir)
      Thread.sleep(1100)
    }
    val registryDir = java.nio.file.Files.createTempDirectory("seg-reg").toString + "/r"
    val cleanDir = java.nio.file.Files.createTempDirectory("seg-clean").toString + "/c"
    val ckpt = java.nio.file.Files.createTempDirectory("ckpt2").toString
    val q = graft.streaming.DocStreams.segmentDedupStream(
        graft.streaming.DocStreams.readDocumentStream(spark, stageDir, Some(1)),
        "doc_id", "text", 3, registryDir, cleanDir)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.read.parquet(cleanDir)
    val batch = graft.text.Segments.segmentDedup(docs, "doc_id", "text", 3)
    println("streamed rows: " + streamed.count() + " batch rows: " + batch.count())
    println("--- streamed minus batch:")
    streamed.except(batch).orderBy("doc_id").show(10, 120)
    println("--- batch minus streamed:")
    batch.except(streamed).orderBy("doc_id").show(10, 120)
    spark.stop()
  }
}
