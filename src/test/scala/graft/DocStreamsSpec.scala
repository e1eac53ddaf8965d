package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.DocStreams

/** The incremental contamination scan converges to the batch q50 result
  * when the training corpus is replayed as a multi-batch file stream. */
class DocStreamsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("streaming contamination scan converges to the q50 batch result") {
    val docs = Tables(spark, sf).documents
    // stage the training split as several files so AvailableNow +
    // maxFilesPerTrigger=1 genuinely exercises multi-batch incremental
    // state, not a single-batch degenerate run
    val stageDir = java.nio.file.Files.createTempDirectory("doc-stream").toString
    docs.filter(col("doc_id") % 50 =!= 0).repartition(3)
      .write.mode("overwrite").parquet(stageDir)

    val stream = DocStreams.readDocumentStream(spark, stageDir,
      maxFilesPerTrigger = Some(1))
    val pairs = DocStreams.contaminationStream(
      stream, docs.filter(col("doc_id") % 50 === 0))
    val ckpt = java.nio.file.Files.createTempDirectory("ckpt").toString
    val q = pairs.writeStream
      .outputMode(OutputMode.Complete())
      .format("memory").queryName("contam_pairs")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(q.recentProgress.length >= 2,
      "expected a multi-batch incremental run, got a single micro-batch")

    def toMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_bench_docs"), r.getAs[Long]("max_shared")))).toMap
    val streamed = toMap(DocStreams.contaminationRollup(spark.table("contam_pairs")))
    val batch = toMap(SparkEntry.queries("q50_contamination")(spark, sf))
    assert(streamed == batch,
      "incremental contamination diverged from the batch oracle query")
    assert(batch.nonEmpty, "fixture produced no contaminated docs — vacuous test")
  }
}
