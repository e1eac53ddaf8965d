package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.scalars.Genomics

/** Illumina SampleSheet: sectioned INI-style file with a CSV data block.
  *
  * Re-expresses the reference's `SampleSheet` class (samplesheet.py:733-801
  * parse, :697-730 write, :29-31 canonical columns, :756-764 v1/v2
  * detection). The file is KB-sized, so parsing is driver-side (SURVEY.md
  * §4: a custom FileFormat would be over-engineering); the data block
  * becomes a DataFrame so every downstream operator is a plain column op
  * that scales to millions of samplesheet rows if ever concatenated.
  */
object SampleSheet {

  /** v1 `[Data]` / v2 `[BCLConvert_Data]` canonical columns. */
  val canonicalColumns: Seq[String] = Seq(
    "Lane", "Sample_ID", "Sample_Name", "Sample_Plate", "Sample_Well",
    "I7_Index_ID", "index", "I5_Index_ID", "index2", "Sample_Project",
    "Description")

  final case class Sheet(
      sections: Seq[(String, Seq[String])], // non-data sections, raw lines, in file order
      dataSection: String,                  // "Data" or "BCLConvert_Data"
      columns: Seq[String],
      rows: Seq[Seq[String]]) {

    /** v2 sheets carry [BCLConvert_Data]; v1 carry [Data]
      * (samplesheet.py:756-764). */
    def isV2: Boolean = dataSection == "BCLConvert_Data"

    def sectionMap: Map[String, Seq[String]] = sections.toMap

    /** Round-trip writer (samplesheet.py:697-730). */
    def format: String = {
      val head = sections.map { case (name, lines) =>
        (s"[$name]" +: lines).mkString("\n")
      }
      val data = (s"[$dataSection]" +: (columns.mkString(",") +:
        rows.map(_.mkString(",")))).mkString("\n")
      (head :+ data).mkString("\n") + "\n"
    }
  }

  private val sectionRe = """^\[(.+?)\],*\s*$""".r

  def parse(text: String): Sheet = {
    val lines = text.split("\r?\n").toSeq
    // split into (sectionName, lines) preserving order
    val grouped = scala.collection.mutable.ArrayBuffer.empty[(String, scala.collection.mutable.ArrayBuffer[String])]
    lines.foreach {
      case sectionRe(name) => grouped += name -> scala.collection.mutable.ArrayBuffer.empty[String]
      case l if grouped.nonEmpty => grouped.last._2 += l
      case _ => // preamble junk before first section
    }
    val dataName = grouped.map(_._1).find(n => n == "Data" || n == "BCLConvert_Data")
      .getOrElse(throw new IllegalArgumentException("no [Data]/[BCLConvert_Data] section"))
    val dataLines = grouped.find(_._1 == dataName).get._2
      .filter(_.trim.replace(",", "").nonEmpty)
    val columns = dataLines.head.split(",", -1).toSeq.map(_.trim)
    val rows = dataLines.tail.map { l =>
      val cells = l.split(",", -1).toSeq.map(_.trim)
      cells.padTo(columns.size, "").take(columns.size)
    }
    val others = grouped.toSeq.collect {
      case (name, ls) if name != dataName =>
        name -> ls.toSeq.reverse.dropWhile(_.trim.replace(",", "").isEmpty).reverse
    }
    Sheet(others, dataName, columns, rows.toSeq)
  }

  def read(path: String): Sheet =
    parse(new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8))

  def write(sheet: Sheet, path: String): Unit =
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), sheet.format)

  /** Data block as an all-string DataFrame (EAV-style: values are strings,
    * casts happen at use sites, matching the reference's dtype=object). */
  def toDF(spark: SparkSession, sheet: Sheet): DataFrame = {
    val schema = StructType(sheet.columns.map(c => StructField(c, StringType, nullable = true)))
    val rows = sheet.rows.map(r => org.apache.spark.sql.Row(r: _*))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
  }

  /** Case-insensitive include/exclude row filter
    * (samplesheet.py:662-694 filter_sample_data). */
  def filterRows(df: DataFrame, column: String, value: String,
                 include: Boolean = true): DataFrame = {
    val cond = upper(col(column)) === value.toUpperCase
    df.filter(if (include) cond else !cond)
  }

  /** Pseudo-lane explode (samplesheet.py:319-363): MiSeq/single-lane gets
    * lane '1'; NextSeq replicates each row across 4 pseudo-lanes. */
  def pseudoLaneExplode(df: DataFrame, platform: String): DataFrame =
    platform.toUpperCase match {
      case p if p.contains("NEXTSEQ") =>
        df.withColumn("PseudoLane", explode(array((1 to 4).map(i => lit(i.toString)): _*)))
      case _ =>
        df.withColumn("PseudoLane", lit("1"))
    }

  /** Index hygiene: strip Ns + whitespace (samplesheet.py:135-167, 279-280),
    * composite dual index (samplesheet.py:288-316). */
  def withCleanIndexes(df: DataFrame): DataFrame = {
    val i1 = Genomics.stripN(trim(col("index")))
    val i2 = if (df.columns.contains("index2")) Genomics.stripN(trim(col("index2"))) else lit("")
    df.withColumn("index", i1)
      .withColumn("index2", i2)
      .withColumn("c_index", Genomics.compositeIndex(col("index"), col("index2")))
  }

  /** Per-index-column length census (samplesheet.py:263-285
    * get_index_count): Map(column -> Map(length -> row count)). */
  def indexLengthCensus(df: DataFrame): Map[String, Map[Int, Long]] = {
    val idxCols = df.columns.filter(c => c == "index" || c == "index2")
    idxCols.map { c =>
      val counts = df
        .select(length(Genomics.stripN(trim(col(c)))).as("len"))
        .groupBy("len").count()
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      c -> counts
    }.toMap
  }

  /** Per-lane samplesheet extraction (samplesheet_utils.py:13-149): filter
    * one lane, truncate both indexes to the lane-minimum length, rebuild
    * the composite index and dedup on it. Returns the deduped rows; the
    * caller emits the file + bases mask from [[indexLengthCensus]]. */
  def perLaneSheet(df: DataFrame, lane: String): DataFrame = {
    val inLane = filterRows(df, "Lane", lane)
    val cleaned = withCleanIndexes(inLane)
    // min NON-EMPTY length per column (an absent index2 on some rows must
    // not truncate everyone to zero); samplesheet-sized data, so the
    // global window's single partition is fine.
    val w = org.apache.spark.sql.expressions.Window.partitionBy(lit(1))
    val truncated = Seq("index", "index2").foldLeft(cleaned) { (d, c) =>
      val minLen = min(when(length(col(c)) > 0, length(col(c)))).over(w)
      d.withColumn(c,
        when(minLen.isNotNull && length(col(c)) > 0,
          col(c).substr(lit(1), minLen)).otherwise(col(c)))
    }
    truncated
      .withColumn("c_index", Genomics.compositeIndex(col("index"), col("index2")))
      .dropDuplicates("c_index")
  }

  /** Split rows into per-index-length groups (samplesheet.py:135-167):
    * adds `idx_len`, callers partition/write by it. */
  def groupByIndexLength(df: DataFrame): DataFrame =
    df.withColumn("idx_len",
      length(Genomics.stripN(trim(col("index")))) +
        (if (df.columns.contains("index2"))
          length(Genomics.stripN(trim(col("index2")))) else lit(0)))
}
