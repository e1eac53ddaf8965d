package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler for iterating on hot queries (dev tool, not
  * driver contract). Times the dedup pipeline's stages in isolation so a
  * regression can be attributed to shingling vs join structure. */
object PerfScratch {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[scratch] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.count() // warm footer/cache

    import graft.dedup.Shingles
    // warm-up JIT on small
    val small = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    Shingles.jaccardPairs(small, "doc_id", "text", 3, 0.5).write.format("noop").mode("overwrite").save()

    time("string shingle pipeline + xxhash") {
      Shingles.explodeShingles(docs, "doc_id", "text", 3)
        .select(xxhash64(col("shingle"))).write.format("noop").mode("overwrite").save()
    }
    time("one-pass ShingleHashes") {
      Shingles.explodeShingleHashes(docs, "doc_id", "text", 3)
        .write.format("noop").mode("overwrite").save()
    }
    time("jaccardPairs no cap") {
      Shingles.jaccardPairs(docs, "doc_id", "text", 3, 0.5)
        .write.format("noop").mode("overwrite").save()
    }
    time("jaccardPairs cap=64") {
      Shingles.jaccardPairs(docs, "doc_id", "text", 3, 0.5, Some(64))
        .write.format("noop").mode("overwrite").save()
    }
    // single-exchange variant: repartition once on sh; DF-cap via window
    // (no extra shuffle); join sides + sizes reuse the same exchange
    time("jaccardPairs cap=64 single-exchange") {
      val w = org.apache.spark.sql.expressions.Window.partitionBy("sh")
      val rsh = Shingles.explodeShingleHashes(docs, "doc_id", "text", 3)
        .repartition(col("sh"))
      val kept = rsh.withColumn("__df", count(lit(1)).over(w))
        .filter(col("__df") <= 64).drop("__df")
      val sizes = kept.groupBy("doc_id").agg(count(lit(1)).as("sz"))
      val a = kept.select(col("doc_id").as("id_a"), col("sh"))
      val b = kept.select(col("doc_id").as("id_b"), col("sh"))
      val common = a.join(b, Seq("sh")).filter(col("id_a") < col("id_b"))
        .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_common"))
      common
        .join(broadcast(sizes.select(col("doc_id").as("id_a"), col("sz").as("n_a"))), Seq("id_a"))
        .join(broadcast(sizes.select(col("doc_id").as("id_b"), col("sz").as("n_b"))), Seq("id_b"))
        .withColumn("jaccard", col("n_common").cast("double") /
          (col("n_a") + col("n_b") - col("n_common")).cast("double"))
        .filter(col("jaccard") >= 0.5)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
