package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch: driver-contract smoke (entry + a few queries). */
object PerfScratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = graft.SparkEntry.entry(spark).count()
    println(s"entry rows: $n")
    require(n > 0, "entry smoke failed")
    spark.stop()
  }
}
