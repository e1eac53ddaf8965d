package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch profiler for the BPE query paths (round 6). */
object ProfD15 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time(what: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$what: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    for (i <- 1 to 3)
      time(s"d15_bpe_pairs $i")(
        graft.queries.CurationQ.bpePairs(spark, dir)
          .write.format("noop").mode("overwrite").save())
    for (i <- 1 to 2)
      time(s"d16_bpe_encode $i")(
        graft.queries.CurationQ.bpeEncode(spark, dir)
          .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
