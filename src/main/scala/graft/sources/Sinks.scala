package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Remaining SURVEY §2.1 source/sink surface: metadata CSV reading with the
  * reference's dtype=object semantics, and the small-output sinks. */
object Sinks {

  /** CSV read with every column as string (pandas `dtype=object`,
    * reformat_metadata_file.py:521) — casts happen at use sites, exactly
    * like the EAV convention. */
  def readCsvAllString(spark: SparkSession, path: String,
                       skipRows: Int = 0): DataFrame = {
    // multiLine: metadata CSVs are KB-sized, so the non-splittable quoted-
    // newline mode costs nothing here; large machine-generated CSVs should
    // come through the default splittable reader instead.
    val base = spark.read.option("header", true).option("mode", "PERMISSIVE")
      .option("multiLine", true).option("escape", "\"")
    if (skipRows == 0) {
      val df = base.csv(path)
      df.select(df.columns.map(c => col(c).cast(StringType).as(c)): _*)
    } else {
      // skiprows via text-read + monotonic line index (driver-documented:
      // only for single-file, small inputs like count matrices)
      val lines = spark.read.text(path).collect().map(_.getString(0)).drop(skipRows)
      val header = lines.head.split(",", -1).map(_.trim)
      val rows = lines.tail.map { l =>
        org.apache.spark.sql.Row(
          l.split(",", -1).map(_.trim).padTo(header.length, "").take(header.length): _*)
      }
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows.toSeq, 1),
        StructType(header.map(StructField(_, StringType, nullable = true))))
    }
  }

  /** Small-result CSV sink (reformat output, error reports, manifests —
    * reformat_metadata_file.py:568): one file, header included. */
  def writeCsvSingle(df: DataFrame, path: String): Unit = {
    val rows = df.collect()
    val cols = df.columns
    def cell(v: Any): String = v match {
      case null => ""
      case s: String if s.contains(",") || s.contains("\"") || s.contains("\n") =>
        "\"" + s.replace("\"", "\"\"") + "\""
      case x => x.toString
    }
    val sb = new StringBuilder(cols.mkString(",")).append('\n')
    rows.foreach(r => sb.append(cols.indices.map(i => cell(r.get(i))).mkString(",")).append('\n'))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), sb.toString)
  }

  /** JSON-records sink (`to_json(orient='records')`,
    * project_data_display_utils.py:177). */
  def toJsonRecords(df: DataFrame): String =
    df.toJSON.collect().mkString("[", ",", "]")
}
