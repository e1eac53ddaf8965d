package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: why isn't the range-clustered parquet scan pruning? */
object DebugPrune {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_orderkey"), to_date(col("l_shipdate")).as("ship_date"),
        col("l_quantity"))
    val dir = java.nio.file.Files.createTempDirectory("li-clu").toString
    graft.store.Layout.writeRangeClustered(li, dir, 8, col("ship_date"))
    val pred = col("ship_date") >= lit("1995-03-01").cast("date") &&
      col("ship_date") < lit("1995-04-01").cast("date")
    val df = spark.read.parquet(dir).filter(pred)
    df.collect()
    println(df.queryExecution.explainString(
      org.apache.spark.sql.execution.SimpleMode))
    df.queryExecution.executedPlan.collectLeaves().foreach {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        println("scan rows = " + s.metrics("numOutputRows").value)
        println("files read = " + s.metrics.get("numFiles").map(_.value))
      case _ =>
    }
    // per-file ranges
    spark.read.parquet(dir).groupBy(input_file_name())
      .agg(min("ship_date"), max("ship_date"), count(lit(1)))
      .collect().foreach(println)
    spark.stop()
  }
}
