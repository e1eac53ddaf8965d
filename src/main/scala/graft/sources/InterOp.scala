package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Illumina InterOp summary dump: multi-section CSV where each section
  * starts with a `# SectionName` header line followed by its own column
  * header (interop.py:4-41). Driver-side parse (KB-scale file) →
  * Map(section -> DataFrame) so each section joins/aggregates like any
  * other table. */
object InterOp {

  final case class Section(name: String, columns: Seq[String], rows: Seq[Seq[String]])

  def parse(text: String): Seq[Section] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Section]
    var name: Option[String] = None
    var cols: Seq[String] = Nil
    var rows = scala.collection.mutable.ArrayBuffer.empty[Seq[String]]
    def flush(): Unit = name.foreach { n =>
      out += Section(n, cols, rows.toSeq); rows = scala.collection.mutable.ArrayBuffer.empty
    }
    text.split("\r?\n").foreach { line =>
      if (line.startsWith("#")) {
        flush()
        name = Some(line.dropWhile(_ == '#').trim)
        cols = Nil
      } else if (line.trim.nonEmpty) {
        val cells = line.split(",", -1).toSeq.map(_.trim)
        if (cols.isEmpty) cols = cells else rows += cells.padTo(cols.size, "").take(cols.size)
      }
    }
    flush()
    out.toSeq
  }

  def read(path: String): Seq[Section] =
    parse(new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8))

  def toDFs(spark: SparkSession, sections: Seq[Section]): Map[String, DataFrame] =
    sections.map { s =>
      val schema = StructType(s.columns.map(c => StructField(c, StringType, nullable = true)))
      s.name -> spark.createDataFrame(
        spark.sparkContext.parallelize(s.rows.map(r => org.apache.spark.sql.Row(r: _*)), 1),
        schema)
    }.toMap
}
