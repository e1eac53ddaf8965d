package graft.tools

/** One-off: d21 score distribution at sf0.01/sf0.1. Dev harness. */
object ScoreDist {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftExtensions.registerAll(spark)
    for (sf <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val df = graft.SparkEntry.queries("d21_quality_score")(spark, sf)
      df.selectExpr("min(score)", "percentile(score, array(0.25,0.5,0.75))", "max(score)")
        .show(false)
    }
    spark.stop()
  }
}
