package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-9 spot-timer: alternate a handful of registered queries inside
  * one JVM (min of n, bench-identical session config). Dev harness. */
object PerfR9 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names =
      if (args.nonEmpty) args.toSeq else Seq("d18_curation_funnel", "d25_model_funnel")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", 1 << 21)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftExtensions.registerAll(spark)
    graft.meta.MetadataStar.materialize(spark, dir)
    graft.store.Registries.materialize(spark, dir)
    def run(n: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(n)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    names.foreach { n => run(n); () } // warm
    val times = (1 to 3).flatMap(_ => names.map(n => n -> run(n)))
      .groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    names.foreach(n => println(f"$n%-24s ${times(n)}%.3f s (min of 3, warm)"))
    spark.stop()
  }
}
