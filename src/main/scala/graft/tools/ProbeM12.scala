package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** m12 scale probe (dev): distinct dHash values, docs-per-value
  * distribution, and output pair count at a given sf dir. */
object ProbeM12 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftExtensions.registerAll(spark)
    // the ONE hash derivation m12 itself pairs on — a probe measuring a
    // private copy would silently drift from the registered query
    val hashes = graft.queries.MultimodalQ.imageHashes(spark, dir)
    val byVal = hashes.groupBy("dhash").count()
    println(s"docs=${hashes.count()} distinctValues=${byVal.count()} " +
      s"maxPerValue=${byVal.agg(max("count")).first().getLong(0)} " +
      s"p95=${byVal.stat.approxQuantile("count", Array(0.95), 0.01)(0)}")
    val out = graft.queries.MultimodalQ.queries("m12_image_neardup")(spark, dir)
    println(s"m12 output pairs=${out.count()}")
    spark.stop()
  }
}
