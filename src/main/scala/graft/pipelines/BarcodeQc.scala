package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.scalars.Genomics

/** Unknown-barcode classifier (check_sequence_index_barcodes.py:247-354).
  *
  * The reference walks every unknown barcode row and, per known samplesheet
  * index of the lane (in samplesheet order), runs an if/elif CASE 1-5 chain
  * that *overwrites* the row's tag; CASE 6 (G-homopolymer on two-color
  * platforms) fires only while the tag is still 'unknown'. Net semantics,
  * reproduced here exactly:
  *
  *  - final tag = the tag assigned by the LAST known index (in list order)
  *    whose CASE 1-5 matched;
  *  - if no known index ever matched: 'index_1_G_homopolymer' when the
  *    platform is two-color and index1 is all G, else 'unknown';
  *  - rows with mapping_ratio <= threshold or tag != 'unknown' pass through.
  *
  * Spark shape: the per-row Python loop becomes ONE broadcast join of
  * unknown rows against the (lane, position, known index) list plus a
  * max-by-position aggregation — per-lane cross-match, no driver loop
  * (SURVEY §2.3 last row). The known list is samplesheet-sized, so the join
  * broadcasts; the unknown side streams at any scale.
  */
object BarcodeQc {

  private val indexRe = "^([ATGCN]+)(\\+)?([ATCGN]+)?$"

  private def part1(c: Column): Column = regexp_extract(trim(c), indexRe, 1)
  /** group 3, as null when absent (regexp_extract yields '' for no match). */
  private def part2(c: Column): Column = {
    val g = regexp_extract(trim(c), indexRe, 3)
    when(g === "", lit(null)).otherwise(g)
  }

  /** The CASE 1-5 chain for one (unknown, known) pair; null = no match.
    * Column refs: u1/u2 unknown parts, k1/k2 known parts. */
  private def pairTag(u1: Column, u2: Column, k1: Column, k2: Column): Column = {
    val bothU2K2 = u2.isNotNull && k2.isNotNull
    // CASE 1: same-length exact index1 match
    val case1 = when(u2.isNull || k2.isNull, lit("mix_index_match"))
      .when(bothU2K2 && (u2 === k2), lit("known"))
      .otherwise(lit(null)) // index1 equal but index2 present and different
    // CASE 2: unknown shorter — prefix-match sliced known
    val k2sliced = when(length(u2) < length(k2), k2.substr(lit(1), length(u2))).otherwise(k2)
    val case2 = when(bothU2K2,
        when((u1 === k1.substr(lit(1), length(u1))) && (u2 === k2sliced),
          lit("mix_index_match")).otherwise(lit(null)))
      .otherwise(when(u1 === k1.substr(lit(1), length(u1)), lit("mix_index_match"))
        .otherwise(lit(null)))
    // CASE 3: unknown longer — prefix-match sliced unknown
    val u2sliced = when(length(u2) > length(k2), u2.substr(lit(1), length(k2))).otherwise(u2)
    val case3 = when(bothU2K2,
        when((u1.substr(lit(1), length(k1)) === k1) && (u2sliced === k2),
          lit("mix_index_match")).otherwise(lit(null)))
      .otherwise(when(u1.substr(lit(1), length(k1)) === k1, lit("mix_index_match"))
        .otherwise(lit(null)))
    // CASE 4: index1 revcomp (with index2 exact / revcomp refinements)
    val case4 = when(bothU2K2 && (u2 === k2), lit("only_index_1_revcomp"))
      .when(bothU2K2 && (Genomics.revComp(u2) === k2), lit("index_1_and_index_2_revcomp"))
      .otherwise(lit("index_1_revcomp"))
    // CASE 5: index1 exact, index2 revcomp. NOTE: faithfully unreachable —
    // u1===k1 implies equal lengths, so CASE 1's guard always consumes the
    // row first, exactly as in the reference's elif chain (the tag
    // 'only_index_2_revcomp' can never be emitted there either).
    val case5 = lit("only_index_2_revcomp")

    when((length(u1) === length(k1)) && (u1 === k1), case1)
      .when(length(u1) < length(k1), case2)
      .when(length(u1) > length(k1), case3)
      .when(Genomics.revComp(u1) === k1, case4)
      .when(bothU2K2 && (Genomics.revComp(u2) === k2) && (u1 === k1), case5)
      .otherwise(lit(null))
  }

  /** Classify unknown barcodes.
    *
    * @param barcodes   frame from StatsJson.barcodeFrame (needs lane, index,
    *                   tag, mapping_ratio)
    * @param knownIndexes (lane, pos, known_index) in samplesheet order —
    *                   pos drives the reference's last-write-wins overwrite
    * @param platform   platform name; two-color platforms get CASE 6
    */
  def classify(barcodes: DataFrame, knownIndexes: DataFrame, platform: String,
               mappingRatioTh: Double = 0.0001,
               twoColorPlatforms: Seq[String] = Seq("NEXTSEQ", "NOVASEQ6000")): DataFrame = {
    val eligible = col("tag") === "unknown" && col("mapping_ratio") > mappingRatioTh
    val u1 = part1(col("index")); val u2 = part2(col("index"))
    val k1 = part1(col("known_index")); val k2 = part2(col("known_index"))

    val pairs = barcodes.filter(eligible)
      .join(broadcast(knownIndexes), Seq("lane"), "left_outer")
      .withColumn("pair_tag", pairTag(u1, u2, k1, k2))
    // last-write-wins: max pos among matching pairs
    val resolved = pairs
      .groupBy(barcodes.columns.map(col): _*)
      .agg(
        max(when(col("pair_tag").isNotNull, col("pos"))).as("last_pos"),
        count(col("known_index")).as("n_known"))
    val winner = pairs.filter(col("pair_tag").isNotNull)
      .select((barcodes.columns.map(col) :+ col("pos").as("last_pos") :+ col("pair_tag")): _*)
    val isTwoColor = twoColorPlatforms.exists(p => platform.toUpperCase.contains(p))
    val fallback =
      if (isTwoColor)
        when(col("n_known") > 0 && Genomics.isGHomopolymer(part1(col("index"))),
          lit("index_1_G_homopolymer")).otherwise(lit("unknown"))
      else lit("unknown")
    val classified = resolved
      .join(winner, barcodes.columns.toSeq :+ "last_pos", "left_outer")
      .withColumn("final_tag", coalesce(col("pair_tag"), fallback))
      .drop("last_pos", "pair_tag", "n_known")

    val untouched = barcodes.filter(!eligible).withColumn("final_tag", col("tag"))
    classified.select(untouched.columns.map(col): _*).unionByName(untouched)
  }

  /** Per-lane known/unknown read census with min/max mapping ratios, the
    * pct-known/unknown split and log2 of the read mass
    * (check_sequence_index_barcodes.py:86-96, 152-155, 225-228). */
  def laneSummary(barcodes: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("runid", "lane")
    barcodes.groupBy("runid", "lane", "tag")
      .agg(sum(col("reads")).as("reads"),
        min(col("mapping_ratio")).as("min_ratio"),
        max(col("mapping_ratio")).as("max_ratio"))
      .withColumn("pct", col("reads") * 100.0 / sum(col("reads")).over(w))
      .withColumn("log2_reads", log2(col("reads")))
  }
}
