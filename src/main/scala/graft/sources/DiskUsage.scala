package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Disk-usage source (disk_usage_utils.py:5-30, 109-147): per-path capacity
  * stats collected driver-side (it is control-plane metadata about a
  * handful of mount points) into a small DataFrame, plus the du-style
  * recursive directory size as a DISTRIBUTED binaryFile aggregation when
  * the tree is large. */
object DiskUsage {

  /** shutil.disk_usage equivalent per path. */
  def capacities(spark: SparkSession, paths: Seq[String]): DataFrame = {
    import spark.implicits._
    paths.map { p =>
      val f = new java.io.File(p)
      (p, f.getTotalSpace, f.getTotalSpace - f.getFreeSpace, f.getUsableSpace)
    }.toDF("path", "total_bytes", "used_bytes", "available_bytes")
  }

  /** `du -s` equivalent over a directory tree: file sizes via the
    * metadata-only binaryFile scan, summed per top-level child —
    * distributed, no content read (calculate_seqrun_file_size.py:4-54). */
  def treeSizes(spark: SparkSession, root: String): DataFrame =
    spark.read.format("binaryFile")
      .option("recursiveFileLookup", "true").load(root)
      .select(col("path"), col("length"))
      .withColumn("rel", regexp_replace(col("path"), s"^file:$root/?", ""))
      .withColumn("top", split(col("rel"), "/").getItem(0))
      .groupBy("top")
      .agg(sum(col("length")).as("bytes"), count(lit(1)).as("n_files"))
}
