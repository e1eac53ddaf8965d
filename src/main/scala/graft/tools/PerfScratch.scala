package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch profiler (round 6): q37 star population + d17 posting plan. */
object PerfScratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", 1 << 21)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftExtensions.registerAll(spark)
    val dir = "/root/testdata/sf0.1"
    def time(what: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$what: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    for (i <- 1 to 2)
      time(s"d17 $i")(graft.queries.CurationQ.sourceOverlap(spark, dir)
        .write.format("noop").mode("overwrite").save())
    val m = graft.meta.MetadataStar(spark, dir)
    time("star.run materialize")(m.run.write.format("noop").mode("overwrite").save())
    time("star.experiment materialize")(m.experiment.write.format("noop").mode("overwrite").save())
    for (i <- 1 to 2)
      time(s"q37 $i")(graft.queries.Lineage.lineage6ReadCount(spark, dir)
        .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
