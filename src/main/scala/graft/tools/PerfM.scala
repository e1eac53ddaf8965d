package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Round-8 perf scratchpad: multimodal decode parallelism (docSeeds
  * repartition) and the m12 grouped-banding rewrite. Dev harness, not
  * driver contract. */
object PerfM {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftExtensions.registerAll(spark)

    def time(name: String)(f: => DataFrame): Unit = {
      def run(): Double = {
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      run()
      val best = (1 to 3).map(_ => run()).min
      println(f"$name%-24s $best%6.3f s")
    }

    // equality check: grouped banding == per-row banding on the m12 hashes
    {
      import org.apache.spark.sql.functions._
      val hashes = graft.queries.MultimodalQ.queries("m06_image_phash")(spark, dir)
        .select("doc_id", "dhash")
      val plain = graft.dedup.SimHash
        .hammingNearDuplicates(hashes, "doc_id", "dhash", maxDist = 2, chunks = 4, bits = 24)
        .filter(col("hamming") >= 1)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted
      val grouped = graft.dedup.SimHash
        .hammingNearDuplicatesGrouped(hashes, "doc_id", "dhash", maxDist = 2, chunks = 4, bits = 24)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted
      println(s"plain=${plain.length} grouped=${grouped.length} equal=${plain.sameElements(grouped)}")
      require(plain.sameElements(grouped), "grouped banding diverged from per-row banding")
    }

    for (q <- Seq("m02_image_decode", "m03_audio_decode", "m05_image_resize",
        "m06_image_phash", "m07_audio_fingerprint", "m08_adpcm_decode",
        "m10_video_decode", "m11_video_phash", "m12_image_neardup"))
      time(q)(graft.SparkEntry.queries(q)(spark, dir))
    spark.stop()
  }
}
