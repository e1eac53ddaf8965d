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
      // every TypedImperativeAggregate in graft keeps an O(k)-bounded
      // buffer (CappedCollect, TopKRows, MinHashSig, SimHashSig), so the
      // 128-key sort-based fallback only costs (measured 2-5x on the
      // posting-list dedup paths) without protecting anything
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", 1 << 21)
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
    // granular: where does the capped path spend its time?
    val explodedG = docs
      .select(col("doc_id"), graft.functions.ShingleHashesFn.shingleHashes(col("text"), 3, distinct = true).as("__shs"))
      .select(col("doc_id"), size(col("__shs")).as("sz"), explode(col("__shs")).as("sh"))
    time("  stage: explode w/ sz") {
      explodedG.write.format("noop").mode("overwrite").save()
    }
    time("  stage: postings cappedCollect") {
      explodedG.groupBy(col("sh"))
        .agg(graft.functions.CappedCollect.cappedCollect(struct(col("doc_id").as("id"), col("sz").as("sz")), 64).as("ids"))
        .write.format("noop").mode("overwrite").save()
    }
    time("  stage: postings collect_list") {
      explodedG.groupBy(col("sh"))
        .agg(collect_list(struct(col("doc_id").as("id"), col("sz").as("sz"))).as("ids"))
        .write.format("noop").mode("overwrite").save()
    }
    time("  stage: postings count only") {
      explodedG.groupBy(col("sh")).agg(count(lit(1)).as("n"))
        .write.format("noop").mode("overwrite").save()
    }
    val postingsG = explodedG.groupBy(col("sh"))
      .agg(graft.functions.CappedCollect.cappedCollect(struct(col("doc_id").as("id"), col("sz").as("sz")), 64).as("ids"))
      .filter(size(col("ids")) <= 64)
      .select(array_sort(col("ids")).as("ids"))
    time("  stage: postings+sort+filter>=2") {
      postingsG.filter(size(col("ids")) >= 2)
        .write.format("noop").mode("overwrite").save()
    }
    val szG = size(col("ids"))
    val pairGenG = postingsG.filter(szG >= 2)
      .select(explode(flatten(transform(
        sequence(lit(0), szG - 2),
        i => transform(sequence(i + 1, szG - 1),
          j => struct(
            element_at(col("ids"), i + 1).getField("id").as("id_a"),
            element_at(col("ids"), j + 1).getField("id").as("id_b"),
            element_at(col("ids"), i + 1).getField("sz").as("n_a"),
            element_at(col("ids"), j + 1).getField("sz").as("n_b")))))).as("p"))
    time("  stage: + pair explode") {
      pairGenG.write.format("noop").mode("overwrite").save()
    }
    time("  stage: + pair groupBy (full)") {
      pairGenG.select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"),
          col("p.n_a").as("n_a"), col("p.n_b").as("n_b"))
        .groupBy("id_a", "id_b", "n_a", "n_b").agg(count(lit(1)).as("n_common"))
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
