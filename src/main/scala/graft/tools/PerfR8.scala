package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Exact

/** Round-8 perf scratchpad: plan-shape experiments for the sub-second
  * floor queries (q01/q02 join-agg ordering, AQE coalesce settings).
  * Dev harness, not driver contract. */
object PerfR8 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("AQE", "true"))
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        sys.env.getOrElse("PF", "true"))
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        sys.env.getOrElse("ADV", "64MB"))
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SP", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", 1 << 21)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftExtensions.registerAll(spark)
    val t = Tables(spark, dir)

    def time(name: String)(f: => DataFrame): Unit = {
      // warm once, then min of 3
      def run(): Double = {
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      run()
      val best = (1 to 3).map(_ => run()).min
      println(f"$name%-28s $best%6.3f s")
    }

    // ---- q01 current shape ----
    time("q01_current") {
      graft.SparkEntry.queries("q01_pooling_census")(spark, dir)
    }
    // ---- q01 agg-below-join: aggregate lineitem per orderkey FIRST ----
    time("q01_agg_first") {
      val net = col("l_extendedprice") * (lit(1) - col("l_discount"))
      val per = t.lineitem
        .groupBy(col("l_orderkey").as("o_orderkey"))
        .agg(Exact.dsum(net).as("actual"), count(lit(1)).as("n_items"))
      val rollup = t.orders.join(per, Seq("o_orderkey"), "left")
        .select(col("o_custkey"),
          col("o_totalprice").as("expected"),
          coalesce(col("actual"), lit(0.0)).as("actual"),
          coalesce(col("n_items"), lit(0L)).as("n_items"))
      t.customer.join(rollup, col("c_custkey") === col("o_custkey"))
        .groupBy(col("c_custkey"), col("c_name"))
        .agg(
          count(when(col("n_items") > 0 && col("actual") >= col("expected") * 0.5, 1)).as("n_pass"),
          count(when(col("n_items") > 0 && !(col("actual") >= col("expected") * 0.5), 1)).as("n_fail"),
          count(when(col("n_items") === 0, 1)).as("n_zero"))
    }
    // ---- q02 current ----
    time("q02_current") {
      graft.SparkEntry.queries("q02_lineage_join")(spark, dir)
    }
    // ---- q02 agg lineitem per orderkey first, then broadcast dims ----
    time("q02_agg_first") {
      // keep the per-order sum DECIMAL so the two-level sum stays exact
      // (decimal addition is associative; a double midpoint would not be)
      val per = t.lineitem.groupBy(col("l_orderkey").as("o_orderkey"))
        .agg(sum(graft.functions.FixedPointExpressions.scaledProduct(
            col("l_extendedprice").cast("double"),
            (lit(1) - col("l_discount")).cast("double"), 4)).as("rev"),
          count(lit(1)).as("n"))
      // dims: customer -> nation -> region (nation/region tiny, broadcast)
      val custDim = t.customer
        .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
        .select(col("c_custkey"), col("r_name"), col("n_name"))
      t.orders.join(per, Seq("o_orderkey"))
        .join(custDim, col("o_custkey") === col("c_custkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(sum(col("rev")).cast("double").as("revenue"), sum(col("n")).as("n_items"))
    }
    // ---- floor decomposition ----
    time("empty_job") { spark.range(1).toDF("x") }
    time("scan_lineitem_count") {
      t.lineitem.groupBy().agg(count(lit(1)).as("n"))
    }
    time("scan_li_2cols") {
      t.lineitem.select(col("l_extendedprice"), col("l_discount"))
        .groupBy().agg(sum(col("l_extendedprice")).as("s"))
    }
    time("li_agg_orderkey") {
      t.lineitem.groupBy("l_orderkey").agg(count(lit(1)).as("n"))
    }
    time("li_agg_decimal") {
      val net = col("l_extendedprice") * (lit(1) - col("l_discount"))
      t.lineitem.groupBy("l_orderkey").agg(Exact.dsum(net).as("a"))
    }
    // ---- multi-file layout: what a sane warehouse layout buys ----
    val liDir = java.nio.file.Files.createTempDirectory("li32").toString
    t.lineitem.repartition(32).write.mode("overwrite").parquet(liDir)
    val li32 = spark.read.parquet(liDir)
    time("li32_agg_decimal") {
      val net = col("l_extendedprice") * (lit(1) - col("l_discount"))
      li32.groupBy("l_orderkey").agg(Exact.dsum(net).as("a"))
    }
    time("q01_agg_first_li32") {
      val net = col("l_extendedprice") * (lit(1) - col("l_discount"))
      val per = li32
        .groupBy(col("l_orderkey").as("o_orderkey"))
        .agg(Exact.dsum(net).as("actual"), count(lit(1)).as("n_items"))
      val rollup = t.orders.join(per, Seq("o_orderkey"), "left")
        .select(col("o_custkey"),
          col("o_totalprice").as("expected"),
          coalesce(col("actual"), lit(0.0)).as("actual"),
          coalesce(col("n_items"), lit(0L)).as("n_items"))
      t.customer.join(rollup, col("c_custkey") === col("o_custkey"))
        .groupBy(col("c_custkey"), col("c_name"))
        .agg(
          count(when(col("n_items") > 0 && col("actual") >= col("expected") * 0.5, 1)).as("n_pass"),
          count(when(col("n_items") > 0 && !(col("actual") >= col("expected") * 0.5), 1)).as("n_fail"),
          count(when(col("n_items") === 0, 1)).as("n_zero"))
    }
    time("q48_dup_clusters") {
      graft.SparkEntry.queries("q48_dup_clusters")(spark, dir)
    }
    time("e05_semantic_clusters") {
      graft.SparkEntry.queries("e05_semantic_clusters")(spark, dir)
    }
    time("d28_leakfree_split") {
      graft.SparkEntry.queries("d28_leakfree_split")(spark, dir)
    }
    // ---- q57 variants ----
    time("q57_current") {
      graft.SparkEntry.queries("q57_ngram_contamination")(spark, dir)
    }
    time("q57_single_scan") {
      import org.apache.spark.sql.expressions.Window
      val docs = t.documents
      val sh = graft.dedup.Shingles.explodeShingles(
          docs.withColumn("__train", col("doc_id") % 50 =!= 0),
          "doc_id", "text", 5)
      // explodeShingles drops extra cols? check: it selects idCol + shingle — need train flag; recompute
      val sh2 = docs.select(col("doc_id"), (col("doc_id") % 50 =!= 0).as("__train"),
          explode(graft.functions.ShingleHashesFn.shingleHashes(col("text"), 5, true)).as("sh"))
      val hit = max(when(col("__train"), 1).otherwise(0))
        .over(Window.partitionBy(col("sh")))
      sh2.withColumn("__hit", hit)
        .filter(!col("__train"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_grams"), sum(col("__hit")).as("n_contaminated"))
        .withColumn("contamination",
          round(col("n_contaminated").cast("double") / col("n_grams").cast("double"), 9))
    }
    time("q57_single_scan_str") {
      import org.apache.spark.sql.expressions.Window
      val docs = t.documents
      val sh2 = graft.dedup.Shingles.explodeShingles(
          docs.select(col("doc_id"), col("text")), "doc_id", "text", 5)
        .withColumn("__train", col("doc_id") % 50 =!= 0)
      val hit = max(when(col("__train"), 1).otherwise(0))
        .over(Window.partitionBy(col("shingle")))
      sh2.withColumn("__hit", hit)
        .filter(!col("__train"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_grams"), sum(col("__hit")).as("n_contaminated"))
        .withColumn("contamination",
          round(col("n_contaminated").cast("double") / col("n_grams").cast("double"), 9))
    }
    time("q57b_registry") {
      graft.SparkEntry.queries("q57b_contamination_stored")(spark, dir)
    }
    spark.stop()
  }
}
