package graft.tools

import org.apache.spark.sql.SparkSession

/** Single-query timing probe (dev): times any registered queries at any
  * sf dir, alternated reps in one JVM, cache cleared between runs.
  *
  *   sbt "runMain graft.tools.PerfOne /root/repo/testdata_sf1 e15_ivfpq_incr e10b_ivfpq_stored"
  */
object PerfOne {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
                else Seq("q01_pooling_census")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftExtensions.registerAll(spark)
    graft.meta.MetadataStar.materialize(spark, dir)
    graft.store.Registries.materialize(spark, dir)
    def time(name: String): Double = {
      spark.sharedState.cacheManager.clearCache()
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, dir).collect().length
      val t = (System.nanoTime() - t0) / 1e9
      println(f"$name%-28s $t%7.3f s  ($n rows)")
      t
    }
    (1 to 3).foreach { _ => names.foreach(time) }
    spark.stop()
  }
}
