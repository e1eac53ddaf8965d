package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.similarity.Knn

/** Structured-Streaming twins of the embedding-corpus operators — the
  * modality DocStreams doesn't cover: new vectors arrive in drops and
  * dedup against everything seen so far through the stored LSH bucket
  * registry (the e07b production shape), never by re-pairing history.
  */
object EmbStreams {

  /** embeddings.parquet schema (TESTDATA.md) — file streams need it fixed. */
  val embeddingSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType))))

  def readEmbeddingStream(spark: SparkSession, dir: String,
                          maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val r = spark.readStream.schema(embeddingSchema)
    maxFilesPerTrigger.fold(r)(n => r.option("maxFilesPerTrigger", n))
      .parquet(dir)
  }

  /** Streaming embedding near-dup — the daily-drop twin of the e07b
    * stored-registry query: each micro-batch of new vectors hashes to
    * LSH buckets, probes the bucket registry accumulated from all
    * previous drops ([[Knn.incrementalBucketCandidates]] — history is
    * never re-hashed, never re-paired), rescored with the decimal-exact
    * cosine at `minCos`; surviving pairs append to `pairsDir`, the
    * batch's `(id, bucket)` rows append to `bucketRegistryDir`, and the
    * batch's raw vectors append to `vecRegistryDir` (the id-keyed vector
    * store the rescore joins — in production the main vector table,
    * bucketed by id).
    *
    * Every same-bucket pair is emitted exactly ONCE, by the drop whose
    * batch carries the pair's later-arriving endpoint (the earlier one
    * is in the registry, or in the same batch for intra-drop pairs) —
    * EmbStreamsSpec replays drops and proves the union of outputs equals
    * the full bucket-contract batch pair set. Registries are append-only
    * parquet directories: same durability stance (and same at-least-once
    * caveat on retry) as [[DocStreams.segmentDedupStream]]. Write order
    * is pairs first, registries last, so a crash between writes re-emits
    * rather than silently drops. */
  def embeddingDedupStream(embStream: DataFrame, bucketRegistryDir: String,
                           vecRegistryDir: String, pairsDir: String,
                           minCos: Double = 0.4, dim: Int = 64, nPlanes: Int = 6)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    embStream.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      val spark = batch.sparkSession
      def readOr(dir: String, schema: StructType): DataFrame = {
        val p = new org.apache.hadoop.fs.Path(dir)
        val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
        if (fs.exists(p)) spark.read.parquet(dir)
        else spark.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
      }
      val newEmb = batch
        .select(col("vec_id").as("id"), col("embedding").as("vec")).persist()
      try {
        val storedBuckets = readOr(bucketRegistryDir, StructType(Seq(
          StructField("id", LongType), StructField("bucket", LongType))))
        val storedVec = readOr(vecRegistryDir, StructType(Seq(
          StructField("id", LongType),
          StructField("vec", ArrayType(FloatType)))))
        val (cand, newBuckets) =
          Knn.incrementalBucketCandidates(newEmb, storedBuckets, dim, nPlanes)
        val allVec = storedVec.unionByName(newEmb)
        val pairs = cand
          .join(allVec.select(col("id").as("id_a"), col("vec").as("va")), Seq("id_a"))
          .join(allVec.select(col("id").as("id_b"), col("vec").as("vb")), Seq("id_b"))
          .select(col("id_a"), col("id_b"),
            Knn.cosine(col("va"), col("vb")).as("cos"))
          .filter(col("cos") >= minCos)
        pairs.write.mode("append").parquet(pairsDir)
        newBuckets.write.mode("append").parquet(bucketRegistryDir)
        newEmb.write.mode("append").parquet(vecRegistryDir)
      } finally { newEmb.unpersist(); () }
    }
}
