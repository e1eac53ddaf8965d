package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler for iterating on hot queries (not driver contract). */
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

    time("old string pipeline + xxhash") {
      Shingles.explodeShingles(docs, "doc_id", "text", 3)
        .select(xxhash64(col("shingle"))).write.format("noop").mode("overwrite").save()
    }
    time("one-pass shingle hashes") {
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
    // persisted self-join variant
    time("jaccardPairs cap=64 persisted sh") {
      val sh0 = Shingles.explodeShingleHashes(docs, "doc_id", "text", 3)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val stop = sh0.groupBy("sh").agg(count(lit(1)).as("df"))
          .filter(col("df") > 64).select("sh")
        val filtered = sh0.join(broadcast(stop), Seq("sh"), "left_anti")
        val sizes = filtered.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
        val a = filtered.select(col("doc_id").as("id_a"), col("sh"))
        val b = filtered.select(col("doc_id").as("id_b"), col("sh"))
        val common = a.join(b, Seq("sh")).filter(col("id_a") < col("id_b"))
          .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_common"))
        common
          .join(broadcast(sizes.select(col("doc_id").as("id_a"), col("sz").as("n_a"))), Seq("id_a"))
          .join(broadcast(sizes.select(col("doc_id").as("id_b"), col("sz").as("n_b"))), Seq("id_b"))
          .withColumn("jaccard", col("n_common").cast("double") /
            (col("n_a") + col("n_b") - col("n_common")).cast("double"))
          .filter(col("jaccard") >= 0.5)
          .write.format("noop").mode("overwrite").save()
      } finally sh0.unpersist(false)
    }
    // grouped-pairs variant: one shuffle on sh feeds pairs AND sizes
    time("grouped pairs cap=64 v2") {
      val sh = Shingles.explodeShingleHashes(docs, "doc_id", "text", 3)
      val lists0 = sh.groupBy("sh")
        .agg(array_sort(collect_list(col("doc_id"))).as("ids"))
        .filter(size(col("ids")) <= 64)
      val sizes = lists0.select(explode(col("ids")).as("doc_id"))
        .groupBy("doc_id").agg(count(lit(1)).as("sz"))
      val pairs = lists0.filter(size(col("ids")) >= 2)
        .select(explode(flatten(transform(
          sequence(lit(0), size(col("ids")) - 2),
          i => transform(sequence(i + 1, size(col("ids")) - 1),
            j => struct(element_at(col("ids"), i + 1).as("id_a"),
                        element_at(col("ids"), j + 1).as("id_b")))))).as("p"))
        .select(col("p.id_a"), col("p.id_b"))
        .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_common"))
      pairs
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
