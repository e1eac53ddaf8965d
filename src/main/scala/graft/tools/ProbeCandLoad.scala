package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Candidate-load probe (dev): counts the candidate PAIRS the fixed-plane
  * stored registry (e07b's path, 6 planes = 64 buckets forever) and the
  * adaptive-plane registry (e19's path) feed to the exact rescorer at a
  * given corpus — the growth-law evidence without paying the rescore.
  * Fixed planes: candidates ~ n²/2^p, quadratic once n outgrows the
  * calibration decade; adaptive planes: ~ n·budget, linear by law.
  *
  *   sbt "runMain graft.tools.ProbeCandLoad /root/repo/testdata_sf10"
  */
object ProbeCandLoad {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftExtensions.registerAll(spark)
    val emb = graft.Tables(spark, dir).embeddings
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val newE = emb.filter(col("id") % 2 === 1)
    val oldE = emb.filter(col("id") % 2 === 0)
    val n = emb.count()

    val fixedStored = graft.similarity.Knn.lshBuckets(oldE, dim = 64,
      nPlanes = graft.store.Registries.EmbBucketPlanes)
      .select(col("id"), col("bucket"))
    val t0 = System.nanoTime()
    val (fixedCand, _) = graft.similarity.Knn.incrementalBucketCandidates(
      newE, fixedStored, dim = 64,
      nPlanes = graft.store.Registries.EmbBucketPlanes)
    val nFixed = fixedCand.count()
    val tFixed = (System.nanoTime() - t0) / 1e9

    val p = graft.store.Registries.adaptiveEmbPlanes(spark, dir)
    val adaptStored = graft.similarity.Knn.lshBuckets(oldE, dim = 64, nPlanes = p)
      .select(col("id"), col("bucket"))
    val t1 = System.nanoTime()
    val nAdapt = graft.similarity.Knn.adaptiveBucketCandidates(
      newE, adaptStored, dim = 64, nPlanes = p, nFlip = 2).count()
    val tAdapt = (System.nanoTime() - t1) / 1e9

    println(f"n=$n%d  fixed(p=${graft.store.Registries.EmbBucketPlanes}%d): " +
      f"$nFixed%d candidates in $tFixed%.1f s  |  adaptive(p=$p%d): " +
      f"$nAdapt%d candidates in $tAdapt%.1f s")
    spark.stop()
  }
}
