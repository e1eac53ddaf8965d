package graft.pipelines

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Reporting lifecycle (SURVEY §3.3, project_pooling_info.py:143-181):
  * the heavy join+census runs as one Spark plan (graft.ops.Census); this
  * module is the driver-side serialization tail — results are one row per
  * project, so `collect()` is correct and the gviz DataTable assembly
  * (gviz_utils.py:3-24) stays a driver-side string build, exactly like the
  * reference. */
object PoolingReport {

  /** Google-charts DataTable JSON from a collected result frame. */
  def gvizJson(df: DataFrame): String = {
    val schema = df.schema
    def gvizType(dt: DataType): String = dt match {
      case _: ByteType | _: ShortType | _: IntegerType | _: LongType |
           _: FloatType | _: DoubleType | _: DecimalType => "number"
      case _: BooleanType => "boolean"
      case _ => "string"
    }
    def q(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
      } + "\""
    val cols = schema.fields.map { f =>
      s"""{"id":${q(f.name)},"label":${q(f.name)},"type":"${gvizType(f.dataType)}"}"""
    }.mkString("[", ",", "]")
    val rows = df.collect().map { r =>
      val cells = schema.fields.zipWithIndex.map { case (f, i) =>
        val v = r.get(i)
        val cell =
          if (v == null) "null"
          else f.dataType match {
            case _: NumericType | _: BooleanType => v.toString
            // dates, timestamps, strings, and anything else renders as a
            // quoted string — a bare 2018-06-10 is not valid JSON
            case _ => q(v.toString)
          }
        s"""{"v":$cell}"""
      }.mkString("[", ",", "]")
      s"""{"c":$cells}"""
    }.mkString("[", ",", "]")
    s"""{"cols":$cols,"rows":$rows}"""
  }

  /** HTML link wrapping for report columns (project_pooling_info.py:123-141
    * idiom) — a pure column function. */
  def htmlLink(url: org.apache.spark.sql.Column, label: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.format_string("<a href=\"%s\">%s</a>", url, label)
}
