package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-5 scratch profiler: cold vs warm runs of the bench's top
  * offenders, to attribute time to cache population vs steady-state work
  * (dev tool, not driver contract). */
object PerfR5 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", 1 << 21)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftExtensions.registerAll(spark)

    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q37_lineage6_readcount", "q48_dup_clusters", "e02_cosine_neardup",
      "q38_lineage7_fastq", "d04_ngram_jaccard", "q01_pooling_census",
      "q34_percentiles", "q42_project_user_runs", "q02_lineage_join",
      "d07_simhash_dedup", "d06_minhash_dedup", "q21_corr_moments")

    def run(n: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(n)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // JIT warm-up at sf0.001
    names.foreach { n =>
      graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
        .write.format("noop").mode("overwrite").save()
    }
    names.foreach { n =>
      val cold = run(n)
      val warm = run(n)
      println(f"[perf] $n%-28s cold=$cold%6.2f warm=$warm%6.2f")
    }
    spark.stop()
  }
}
