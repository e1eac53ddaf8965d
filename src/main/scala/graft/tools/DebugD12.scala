package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: attribute d12/d11 time to pipeline stages (dev tool). */
object DebugD12 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.text.LangId
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[d12] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s  rows=$n")
    }

    val norm = docs.select(col("doc_id"), LangId.normalized(col("text")).as("__s"))
    time("normalize+count")(norm.count())
    val grams0 = norm.select(col("doc_id"), LangId.charTrigrams(col("__s")).as("__g"))
    time("trigrams-arrays")(grams0.count())
    time("trigrams-arrays-2nd")(grams0.count())
    // force the transform WITHOUT explode: sum of sizes
    time("sum-of-sizes")(
      grams0.agg(sum(size(col("__g")))).collect().head.getLong(0))
    // explode alone, no extra columns
    time("explode-bare")(grams0.select(explode(col("__g"))).count())
    val exploded = grams0.select(col("doc_id"), size(col("__g")).as("n_trigrams"),
      explode(col("__g")).as("trigram"))
    time("explode")(exploded.count())
    println("=== exploded plan ===")
    println(exploded.queryExecution.executedPlan.toString.take(3000))
    import spark.implicits._
    val prof = broadcast(LangId.profiles.toDF("plang", "trigram", "weight"))
    time("join")(exploded.join(prof, Seq("trigram"), "left").count())
    time("full-classify")(LangId.classify(docs, "doc_id", "text").count())
    println(grams0.queryExecution.executedPlan.toString.take(2500))
    spark.stop()
  }
}
