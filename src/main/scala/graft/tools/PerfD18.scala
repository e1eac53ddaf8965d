package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** d18 variant shoot-out inside ONE JVM, alternating runs so machine
  * drift hits both variants equally. Dev harness. */
object PerfD18 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", 1 << 21)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftExtensions.registerAll(spark)
    val s = spark

    def base() = {
      val docs = graft.Tables.spread(graft.Tables(s, dir).documents, "doc_id")
      val toks = graft.text.TextMetrics.tokens(col("text"))
      docs
        .withColumn("__toks", toks)
        .withColumn("__q",
          graft.text.TextMetrics.qualityScoreFromTokens(col("__toks"), col("text")))
        .withColumn("qual_ok", col("__q") >= 0.6)
        .withColumn("__fp", graft.text.TextMetrics.fingerprint(col("text")))
        .withColumn("__canon",
          min(when(col("qual_ok"), col("doc_id")))
            .over(org.apache.spark.sql.expressions.Window.partitionBy(col("__fp"))))
        .withColumn("exact_keep", col("qual_ok") && col("doc_id") === col("__canon"))
    }

    // OLD: full segmentDedup + join-back for source
    def vOld(): DataFrame = {
      val flagged = base()
      val survivors = flagged.filter(col("exact_keep")).select("doc_id", "source", "text")
      val seg = graft.text.Segments.segmentDedup(survivors, "doc_id", "text", 3)
        .withColumn("final_ok", col("n_kept") * 2 >= col("n_segs"))
        .join(survivors.select("doc_id", "source"), Seq("doc_id"))
      val b = flagged.groupBy("source").agg(
        count(lit(1)).as("n_total"),
        count(when(col("qual_ok"), lit(true))).as("n_quality"),
        count(when(col("exact_keep"), lit(true))).as("n_exact"))
      val fin = seg.groupBy("source")
        .agg(count(when(col("final_ok"), lit(true))).as("n_final"))
      b.join(fin, Seq("source"), "left")
        .select(col("source"), col("n_total"), col("n_quality"), col("n_exact"),
          coalesce(col("n_final"), lit(0L)).as("n_final"))
    }

    // NEW: counts-only + carried source
    def vNew(): DataFrame = {
      val flagged = base()
      val survivors = flagged.filter(col("exact_keep")).select("doc_id", "source", "text")
      val seg = graft.text.Segments.segmentKeepCounts(survivors, "doc_id", "text", 3,
          carryCols = Seq("source"))
        .withColumn("final_ok", col("n_kept") * 2 >= col("n_segs"))
      val b = flagged.groupBy("source").agg(
        count(lit(1)).as("n_total"),
        count(when(col("qual_ok"), lit(true))).as("n_quality"),
        count(when(col("exact_keep"), lit(true))).as("n_exact"))
      val fin = seg.groupBy("source")
        .agg(count(when(col("final_ok"), lit(true))).as("n_final"))
      b.join(fin, Seq("source"), "left")
        .select(col("source"), col("n_total"), col("n_quality"), col("n_exact"),
          coalesce(col("n_final"), lit(0L)).as("n_final"))
    }

    // ONE-PASS: explode every doc's segments with flags carried; rank
    // survivor segments first in the seg window; one per-doc agg then one
    // census agg — the gate pipeline evaluates exactly once
    def vOne(): DataFrame = {
      val flagged = base()
      val segs = graft.text.Segments.explodeSegments(flagged, "doc_id", "text", 3,
        Seq("source", "qual_ok", "exact_keep"))
      val firstWin = org.apache.spark.sql.expressions.Window.partitionBy(col("seg"))
        .orderBy(col("exact_keep").desc, col("doc_id"), col("seg_idx"))
      val perDoc = segs
        .withColumn("keep",
          col("exact_keep") && col("seg").isNotNull &&
            row_number().over(firstWin) === 1)
        .groupBy("doc_id", "source", "qual_ok", "exact_keep")
        .agg(
          count(when(col("exact_keep"), col("seg"))).as("n_segs"),
          count(when(col("keep"), lit(true))).as("n_kept"))
        .withColumn("final_ok",
          col("exact_keep") && col("n_kept") * 2 >= col("n_segs"))
      perDoc.groupBy("source").agg(
        count(lit(1)).as("n_total"),
        count(when(col("qual_ok"), lit(true))).as("n_quality"),
        count(when(col("exact_keep"), lit(true))).as("n_exact"),
        count(when(col("final_ok"), lit(true))).as("n_final"))
    }

    // CURRENT registered shape (r9): survivor-only explode + fused
    // fingerprint-repartition exchange — whatever CurationQ ships
    def vCur(): DataFrame =
      graft.SparkEntry.queries("d18_curation_funnel")(s, dir)
    def vCurModel(): DataFrame =
      graft.SparkEntry.queries("d25_model_funnel")(s, dir)

    def run(f: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val variants = Seq("old" -> (vOld _), "new" -> (vNew _),
      "one_r8" -> (vOne _), "cur_r9" -> (vCur _), "cur_d25" -> (vCurModel _))
    variants.foreach { case (_, f) => run(f) } // warm all
    val times = variants.map { case (n, _) =>
      n -> collection.mutable.ArrayBuffer[Double]() }.toMap
    for (_ <- 1 to 5)
      variants.foreach { case (n, f) => times(n) += run(f) }
    variants.foreach { case (n, _) =>
      val t = times(n)
      println(f"$n%-8s min=${t.min}%.3f med=${t.sorted.apply(2)}%.3f")
    }
    val a = vOld().orderBy("source").collect().toSeq
    val c = vNew().orderBy("source").collect().toSeq
    val d = vOne().orderBy("source").collect().toSeq
    val e = vCur().orderBy("source").collect().toSeq
    println(s"equal_new=${a == c} equal_one=${a == d} equal_cur=${a == e}")
    spark.stop()
  }
}
