package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.scalars.Genomics

/** 10X Chromium single-cell samplesheet processing
  * (processsinglecellsamplesheet.py:219-302 explode, :58-152 dual-index
  * replace; mergesinglecellfastq.py:74-309 merge-back).
  *
  * A 10X sample row carries a plate code (`SI-GA-A1`) standing for 4 real
  * index sequences: demultiplexing needs the row exploded ×4 with suffixed
  * ids (`_1..4`) and the originals preserved so fastq fragments can be
  * merged back per (lane, original sample) afterwards. Plates are tiny →
  * broadcast joins; the explode is a posexplode, the merge-back one
  * groupBy — no driver loops at any corpus size.
  */
object SingleCell {

  /** (plate_code → 4 index sequences), e.g. from the public Chromium plate
    * JSONs (FIXTURES.md §6 shape). */
  def plateDF(spark: SparkSession, plate: Map[String, Seq[String]]): DataFrame = {
    import spark.implicits._
    plate.toSeq.toDF("plate_code", "plate_seqs")
  }

  /** Parse the single-index plate JSON (`[["SI-GA-A1", ["GGTT...", ...]],
    * ...]` — processsinglecellsamplesheet.py:197-216's input shape). */
  def readSingleIndexPlate(path: String): Map[String, Seq[String]] = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    JsonMethods.parse(new java.io.File(path)) match {
      case JArray(entries) => entries.collect {
        case JArray(JString(code) :: JArray(seqs) :: Nil) =>
          code -> seqs.collect { case JString(s) => s }
      }.toMap
      case other => throw new IllegalArgumentException(s"unexpected plate JSON: $other")
    }
  }

  /** Parse the dual-index plate JSON (`{"SI-TT-A1": {"index(i7)": ...,
    * "index2_workflow_a(i5)": ..., "index2_workflow_b(i5)": ...}}`) into
    * the (plate_code, i7, i5_workflow_a, i5_workflow_b) frame
    * [[replaceDualIndex]] consumes. */
  def readDualIndexPlate(spark: SparkSession, path: String): DataFrame = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    import spark.implicits._
    val rows = JsonMethods.parse(new java.io.File(path)) match {
      case JObject(fields) => fields.map { case (code, spec) =>
        def str(k: String): String = spec \ k match {
          case JString(s) => s
          case _ => throw new IllegalArgumentException(s"plate $code missing $k")
        }
        (code, str("index(i7)"), str("index2_workflow_a(i5)"),
          str("index2_workflow_b(i5)"))
      }
      case other => throw new IllegalArgumentException(s"unexpected plate JSON: $other")
    }
    rows.toDF("plate_code", "i7", "i5_workflow_a", "i5_workflow_b")
  }

  /** Explode 10X rows ×4 with `_1..4` id suffixes; originals preserved in
    * Original_* columns (non-10X rows pass through with originals equal to
    * their current values). */
  def explodeTenX(df: DataFrame, plates: DataFrame): DataFrame = {
    val withOrig = df
      .withColumn("Original_Sample_ID", col("Sample_ID"))
      .withColumn("Original_Sample_Name", col("Sample_Name"))
      .withColumn("Original_index", col("index"))
    val tenx = withOrig.filter(Genomics.is10xIndex(col("index")))
      .join(broadcast(plates), col("index") === col("plate_code"), "inner")
      .select(withOrig.columns.map(col) :+
        posexplode(col("plate_seqs")).as(Seq("pos", "real_index")): _*)
      .withColumn("Sample_ID", concat(col("Original_Sample_ID"), lit("_"), col("pos") + 1))
      .withColumn("Sample_Name", concat(col("Original_Sample_Name"), lit("_"), col("pos") + 1))
      .withColumn("index", col("real_index"))
      .drop("pos", "real_index")
    val rest = withOrig.filter(!Genomics.is10xIndex(col("index")))
    tenx.unionByName(rest)
  }

  /** Dual-index plate replacement (chromium TT plates): look up the i7 and
    * workflow-dependent i5; optionally reverse-complement i5 (platforms
    * whose flowcell_barcode_rule says REVCOMP — igfTables.py:326-366). */
  def replaceDualIndex(df: DataFrame, dual: DataFrame, workflowA: Boolean,
                       revCompI5: Boolean): DataFrame = {
    val i5col = if (workflowA) col("i5_workflow_a") else col("i5_workflow_b")
    val i5 = if (revCompI5) Genomics.revComp(i5col) else i5col
    df.join(broadcast(dual), col("index") === col("plate_code"), "left_outer")
      .withColumn("index", coalesce(col("i7"), col("index")))
      .withColumn("index2", when(col("plate_code").isNotNull, i5).otherwise(col("index2")))
      .drop("plate_code", "i7", "i5_workflow_a", "i5_workflow_b")
  }

  /** Merge-back: exploded `_1..4` fastq fragments regrouped per
    * (lane, original sample) with their fragment paths collected in
    * suffix order (mergesinglecellfastq.py's grouping, minus the byte-level
    * concat which is an FS action on the collected lists). */
  def mergeBackPlan(fragments: DataFrame): DataFrame =
    fragments
      .groupBy("lane", "Original_Sample_ID", "read_type")
      .agg(
        transform(array_sort(collect_list(struct(col("Sample_ID"), col("file_path")))),
          x => x.getField("file_path")).as("fragment_paths"),
        count(lit(1)).as("n_fragments"))

  /** Execute the merge: one task per merged output streams its fragments
    * into `outDir/{orig}_L{lane}_{read}.fastq.gz`. Concatenated gzip
    * members are themselves a valid gzip stream, so fragments are copied
    * byte-for-byte — no decompression, constant memory
    * (mergesinglecellfastq.py:74-309's file stage, distributed). */
  def executeMerge(spark: org.apache.spark.sql.SparkSession,
                   plan: DataFrame, outDir: String): DataFrame = {
    import spark.implicits._
    val merged = plan
      .select(col("lane"), col("Original_Sample_ID"), col("read_type"),
        col("fragment_paths"))
      .as[(String, String, String, Seq[String])]
      .mapPartitions { it =>
        val conf = new org.apache.hadoop.conf.Configuration()
        it.map { case (lane, orig, read, paths) =>
          val out = new org.apache.hadoop.fs.Path(
            s"$outDir/${orig}_L${lane}_$read.fastq.gz")
          val fs = out.getFileSystem(conf)
          val os = fs.create(out, true)
          val buf = new Array[Byte](1 << 16)
          try paths.foreach { p =>
            val in = fs.open(new org.apache.hadoop.fs.Path(p))
            try {
              var n = in.read(buf)
              while (n > 0) { os.write(buf, 0, n); n = in.read(buf) }
            } finally in.close()
          } finally os.close()
          (lane, orig, read, out.toString, paths.size)
        }
      }
      .toDF("lane", "Original_Sample_ID", "read_type", "merged_path", "n_fragments")
    merged
  }
}
