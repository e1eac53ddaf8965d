import org.apache.spark.sql.SparkSession
object PlanProbe {
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4")
      .config("spark.sql.session.timeZone","UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftExtensions.registerAll(spark)
    val sf = "/root/testdata/sf0.001"
    for (q <- Seq("e07b_incr_neardup_stored","d26b_incr_minhash_stored","q57b_contamination_stored","d26_incr_minhash","q57_ngram_contamination")) {
      val p = graft.SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString
      def scans(t: String) = p.sliding(t.length).count(_ == t)
      println(s"$q: emb=${scans("embeddings.parquet")} docs=${scans("documents.parquet")} reg=${scans("graft_registry")} qlsh=${p.toLowerCase.sliding(13).count(_ == "quantlshbucket".take(13))}")
    }
    spark.stop()
  }
}
