package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** q01 stage decomposition: where does the ~1 s go? Dev harness. */
object PerfQ01 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftExtensions.registerAll(spark)
    val t = graft.Tables(spark, dir)

    def time(name: String)(f: => DataFrame): Unit = {
      def run(): Double = {
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      run()
      val best = (1 to 5).map(_ => run()).min
      println(f"$name%-28s $best%6.3f s")
    }
    val net = col("l_extendedprice") * (lit(1) - col("l_discount"))
    time("scan_only")(t.lineitem.select("l_orderkey", "l_extendedprice", "l_discount"))
    time("agg_dsum")(t.lineitem.groupBy("l_orderkey")
      .agg(graft.ops.Exact.dsum(net).as("a"), count(net).as("n")))
    time("agg_doublesum")(t.lineitem.groupBy("l_orderkey")
      .agg(sum(net).as("a"), count(net).as("n")))
    time("q01_full")(graft.SparkEntry.queries("q01_pooling_census")(spark, dir))
    spark.stop()
  }
}
