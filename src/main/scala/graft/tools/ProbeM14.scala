package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** One-off probe: triple-bucket size distribution behind m14 at a given
  * SF, to pick a hot-triple cap that does not bind on the oracle corpus
  * (d04's convention: cap live in the registered query, oracle unchanged). */
object ProbeM14 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val hashes = graft.queries.MultimodalQ.videoFrameHashes(spark, dir)
    val w = Window.partitionBy(col("doc_id")).orderBy(col("frame_idx"))
    val tri = hashes
      .withColumn("d1", lead(col("dhash"), 1).over(w))
      .withColumn("d2", lead(col("dhash"), 2).over(w))
      .filter(col("d2").isNotNull)
      .select(col("doc_id"), col("dhash").as("d0"), col("d1"), col("d2"))
      .distinct()
    tri.groupBy("d0", "d1", "d2").agg(count(lit(1)).as("n"))
      .groupBy("n").agg(count(lit(1)).as("buckets"))
      .orderBy(desc("n"))
      .show(30, truncate = false)
    spark.stop()
  }
}
