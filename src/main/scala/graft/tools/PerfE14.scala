package graft.tools

import org.apache.spark.sql.SparkSession

/** e14 timing probe (dev): times the registered recall audit at sf0.1,
  * alternated runs in one JVM, after the persist-the-probe-output fix. */
object PerfE14 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftExtensions.registerAll(spark)
    graft.store.Registries.materialize(spark, dir)
    def time(name: String): Double = {
      spark.sharedState.cacheManager.clearCache()
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, dir).collect().length
      val t = (System.nanoTime() - t0) / 1e9
      println(f"$name%-24s $t%6.3f s  ($n rows)")
      t
    }
    (1 to 3).foreach { _ => time("e14_ann_recall"); time("e10b_ivfpq_stored") }
    spark.stop()
  }
}
