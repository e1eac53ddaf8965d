package graft.tools

import org.apache.spark.sql.SparkSession

/** Single-query timing probe (dev): times any registered queries at any
  * sf dir, alternated reps in one JVM, cache cleared between runs.
  *
  *   sbt "runMain graft.tools.PerfOne /root/repo/testdata_sf1 e15_ivfpq_incr e10b_ivfpq_stored"
  *
  * `--count` times `.count()` instead of `.collect()` — for queries whose
  * OUTPUT is corpus-sized (m14's pair set, e18's all-queries top-10),
  * where collect would time driver deserialization, not the plan. Use the
  * same mode at every scale an exponent compares.
  */
object PerfOne {
  def main(args: Array[String]): Unit = {
    val useCount = args.contains("--count")
    val useNoop = args.contains("--noop")
    val rest = args.filterNot(_.startsWith("--"))
    val dir = rest.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (rest.length > 1) rest.drop(1).toSeq
                else Seq("q01_pooling_census")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      // match Bench/Verify: graft's TypedImperativeAggregates are all
      // O(k)-bounded, so the sort-based fallback only costs
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", 1 << 21)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftExtensions.registerAll(spark)
    // SPARK_GRAFT_SKIP_REG=1 skips the registry build for monolithic
    // queries that never probe one (e.g. e18/e19) — at sf30 the build is
    // ~20 min of setup a probe-free timing run doesn't need
    graft.meta.MetadataStar.materialize(spark, dir)
    if (!sys.env.get("SPARK_GRAFT_SKIP_REG").contains("1"))
      graft.store.Registries.materialize(spark, dir)
    def time(name: String): Double = {
      spark.sharedState.cacheManager.clearCache()
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(name)(spark, dir)
      val n =
        if (useNoop) { // Bench methodology: full materialization, no collect
          df.write.format("noop").mode("overwrite").save(); -1L
        }
        else if (useCount) df.count()
        else df.collect().length.toLong
      val t = (System.nanoTime() - t0) / 1e9
      println(f"$name%-28s $t%7.3f s  ($n rows)")
      t
    }
    val reps = sys.env.get("SPARK_GRAFT_REPS").flatMap(_.toIntOption).getOrElse(3)
    (1 to reps).foreach { _ =>
      names.foreach(time)
      // contention stamp per rep: readers discount reps whose mt is hot
      println(f"  [calib_mt ${graft.Calib.spinMt()}%.3f]")
    }
    spark.stop()
  }
}
