package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.similarity.Knn
import graft.streaming.EmbStreams

/** The streaming embedding-dedup twin converges to the batch bucket-
  * contract pair set when the corpus is replayed as multi-batch drops —
  * the embedding-modality counterpart of DocStreamsSpec's replays. */
class EmbStreamsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("streaming embedding dedup over replayed drops == full batch " +
       "bucket-contract near-dup pairs, each pair emitted exactly once") {
    val emb = Tables(spark, sf).embeddings
      .select(col("vec_id").as("id"), col("embedding").as("vec"))

    // three id-ordered drops with distinct mtimes (FileStreamSource
    // processes oldest-first)
    val stageDir = java.nio.file.Files.createTempDirectory("emb-stream").toString
    for ((lo, hi) <- Seq((0L, 60L), (60L, 130L), (130L, 100000L))) {
      Tables(spark, sf).embeddings
        .filter(col("vec_id") >= lo && col("vec_id") < hi)
        .repartition(1).write.mode("append").parquet(stageDir)
      Thread.sleep(1100)
    }

    val tmp = java.nio.file.Files.createTempDirectory("emb-dedup").toString
    val q = EmbStreams.embeddingDedupStream(
        EmbStreams.readEmbeddingStream(spark, stageDir, maxFilesPerTrigger = Some(1)),
        bucketRegistryDir = s"$tmp/buckets", vecRegistryDir = s"$tmp/vecs",
        pairsDir = s"$tmp/pairs")
      .option("checkpointLocation", s"$tmp/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(q.recentProgress.length >= 3,
      "expected a multi-batch incremental run")

    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq

    val streamed = key(spark.read.parquet(s"$tmp/pairs"))
    assert(streamed.size == streamed.toSet.size,
      "a pair was emitted by more than one drop")

    // batch twin: ALL same-bucket pairs (empty registry -> new-new pairs
    // cover the whole corpus), identical rescore
    val (cand, _) = Knn.incrementalBucketCandidates(emb,
      spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("bucket",
            org.apache.spark.sql.types.LongType)))),
      dim = 64, nPlanes = 6)
    val full = key(cand
      .join(emb.select(col("id").as("id_a"), col("vec").as("va")), Seq("id_a"))
      .join(emb.select(col("id").as("id_b"), col("vec").as("vb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"), Knn.cosine(col("va"), col("vb")).as("cos"))
      .filter(col("cos") >= 0.4))

    assert(full.nonEmpty, "fixture produced no near pairs — vacuous test")
    assert(streamed.toSet == full.toSet,
      "streamed pair set diverged from the batch bucket contract")

    // registries hold exactly the corpus: buckets == batch banding, vecs == corpus
    val bucketReg = spark.read.parquet(s"$tmp/buckets")
    val expectedBuckets = Knn.lshBuckets(emb, 64, 6).select("id", "bucket")
    assert(bucketReg.except(expectedBuckets).isEmpty &&
      expectedBuckets.except(bucketReg).isEmpty)
    assert(spark.read.parquet(s"$tmp/vecs").count() == emb.count())
  }

  test("streaming cell labels over replayed even-id drops == the stored " +
       "cellLabels registry e17b counts") {
    val evens = Tables(spark, sf).embeddings.filter(col("vec_id") % 2 === 0)
    val stageDir = java.nio.file.Files.createTempDirectory("cl-stream").toString
    for ((lo, hi) <- Seq((0L, 60L), (60L, 100000L))) {
      evens.filter(col("vec_id") >= lo && col("vec_id") < hi)
        .repartition(1).write.mode("append").parquet(stageDir)
      Thread.sleep(1100)
    }
    val tmp = java.nio.file.Files.createTempDirectory("cl-out").toString
    EmbStreams.cellLabelStream(
        EmbStreams.readEmbeddingStream(spark, stageDir, maxFilesPerTrigger = Some(1)),
        graft.store.Registries.kmeansCentroids(spark, sf), s"$tmp/labels")
      .option("checkpointLocation", s"$tmp/ckpt")
      .trigger(Trigger.AvailableNow())
      .start().awaitTermination()

    val streamed = graft.streaming.RolledSink.read(spark, s"$tmp/labels")
    val batch = graft.store.Registries.cellLabels(spark, sf)
    assert(streamed.count() == batch.count())
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty,
      "streamed labels diverged from the batch cellLabels registry")
  }
}
