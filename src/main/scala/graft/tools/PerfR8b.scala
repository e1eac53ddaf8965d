package graft.tools

import org.apache.spark.sql.DataFrame

/** Round-8 follow-up: timing loop for the remaining >1 s bench queries.
  * Dev harness, not driver contract. */
object PerfR8b {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("d06_minhash_dedup", "d17_source_overlap", "d18_curation_funnel",
        "d24_incr_regions", "e02_cosine_neardup", "e05_semantic_clusters",
        "q48_dup_clusters")
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", 1 << 21)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftExtensions.registerAll(spark)
    graft.store.Registries.materialize(spark, dir)

    def time(name: String)(f: => DataFrame): Unit = {
      def run(): Double = {
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      run()
      val best = (1 to 3).map(_ => run()).min
      println(f"$name%-28s $best%6.3f s")
    }
    for (q <- names) time(q)(graft.SparkEntry.queries(q)(spark, dir))
    spark.stop()
  }
}
