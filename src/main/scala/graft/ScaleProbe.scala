package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (not driver contract): scale the document/embedding corpora
  * by replication-with-rewrite and time the sketch operators, to observe
  * how their cost curves bend well past the provided scale factors.
  * Usage: `sbt "runMain graft.ScaleProbe [factor]"`. */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t = Tables(spark, "/root/testdata/sf0.1")

    // replicate docs with per-copy id offsets and a token of divergence so
    // copies are near-dups (not exact dups) of their source
    val docs = t.documents
      .crossJoin(spark.range(factor).toDF("copy"))
      .withColumn("doc_id", col("doc_id") * factor + col("copy"))
      .withColumn("text", concat(col("text"), lit(" marker"), col("copy")))
      .drop("copy").repartition(32).cache()
    val n = docs.count()

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"$name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s   ($rows rows)")
    }
    println(s"corpus: $n documents")
    time("minhash_lsh") {
      graft.dedup.MinHashLsh.nearDuplicates(docs, "doc_id", "text", 0.5).count()
    }
    time("simhash_nocap") {
      graft.dedup.SimHash.nearDuplicates(docs, "doc_id", "text", 6, 8).count()
    }
    time("simhash_balanced") {
      graft.dedup.SimHash.nearDuplicates(docs, "doc_id", "text",
        graft.dedup.SimHash.Balanced).count()
    }
    time("exact_jaccard_nocap") {
      graft.dedup.Shingles.jaccardPairs(docs, "doc_id", "text", 3, 0.5).count()
    }
    time("exact_jaccard_cap64") {
      graft.dedup.Shingles.jaccardPairs(docs, "doc_id", "text", 3, 0.5,
        Some(64)).count()
    }
    time("token_stats") {
      graft.queries.TextQ.tokenStats(spark, "/root/testdata/sf0.1").count()
    }

    // bounded top-k vs window top-k on a replicated fact: the window sorts
    // everything in as many tasks as there are groups; the heap aggregate's
    // shuffle stays O(groups x partitions x k) regardless of factor
    val li = t.lineitem
      .crossJoin(spark.range(factor).toDF("copy"))
      .withColumn("l_orderkey", col("l_orderkey") * factor + col("copy"))
      .drop("copy").repartition(32).cache()
    println(s"lineitem x$factor: ${li.count()} rows")
    time("topk_window") {
      graft.ops.WindowOps.topK(li, Seq("l_returnflag"),
        Seq(col("l_extendedprice").desc, col("l_orderkey").asc,
          col("l_linenumber").asc), k = 3).count()
    }
    time("topk_bounded_heap") {
      graft.ops.WindowOps.topKBounded(li
          .select("l_returnflag", "l_extendedprice", "l_orderkey", "l_linenumber"),
        Seq("l_returnflag"),
        Seq(("l_extendedprice", true), ("l_orderkey", false), ("l_linenumber", false)),
        k = 3).count()
    }
    spark.stop()
  }
}
