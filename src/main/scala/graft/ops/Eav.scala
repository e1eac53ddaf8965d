package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Entity–attribute–value reshape, the reference's core metadata operator.
  *
  * The reference splits every incoming wide record into (main-table row,
  * attribute rows) — a melt — in
  * `BaseAdaptor.divide_data_to_table_and_attribute` (baseadaptor.py:148-195)
  * and inverts it in reporting with a transpose pivot
  * (project_analysis_utils.py:158-166).
  *
  * Both directions are single-shuffle here: melt is a narrow explode over an
  * array of structs (no shuffle at all), pivot is one hash aggregation
  * because the attribute-name list is supplied explicitly — Spark's
  * `pivot(col)` without values would run an extra distinct job, which at
  * 100 TB is a full pass over the long table. Callers keep an attribute-name
  * registry instead (SURVEY.md §7.4).
  */
object Eav {

  /** Wide → long. Null values are dropped, matching the reference's
    * "empty values are not stored as attributes" rule (baseadaptor.py:39-44).
    * Values are stringified — EAV stores strings, numerics are cast back at
    * aggregation time (project_pooling_info.py:73,100). */
  def melt(
      df: DataFrame, idCols: Seq[String], valueCols: Seq[String],
      nameCol: String = "attribute_name",
      valueCol: String = "attribute_value"): DataFrame = {
    val pairs = valueCols.map(c =>
      struct(lit(c).as("n"), col(c).cast("string").as("v")))
    df.select(idCols.map(col) :+ explode(array(pairs: _*)).as("nv"): _*)
      .select(idCols.map(col) :+ col("nv.n").as(nameCol) :+ col("nv.v").as(valueCol): _*)
      .filter(col(valueCol).isNotNull)
  }

  /** Long → wide. `names` is the explicit attribute universe; one shuffle.
    * `first` matches the reference's behaviour on the unique
    * (entity, attribute_name) pairs the schema enforces. */
  def pivot(
      long: DataFrame, idCols: Seq[String], names: Seq[String],
      nameCol: String = "attribute_name",
      valueCol: String = "attribute_value"): DataFrame =
    long.groupBy(idCols.map(col): _*)
      .pivot(nameCol, names)
      .agg(first(col(valueCol)))

  /** The attribute-name universe of a long table — SURVEY §7.4's answer to
    * "pivot needs a value list": collect it ONCE (one small distinct job)
    * and persist it as a registry table alongside the EAV store so routine
    * pivots skip the extra pass. */
  def attributeRegistry(long: DataFrame,
      nameCol: String = "attribute_name"): Seq[String] =
    long.select(col(nameCol)).distinct()
      .collect().map(_.getString(0)).sorted.toSeq

  /** Pivot with a dynamically discovered attribute universe. Costs one
    * extra distinct job over the long table — prefer [[pivot]] with a
    * maintained registry on hot paths. */
  def pivotDynamic(
      long: DataFrame, idCols: Seq[String],
      nameCol: String = "attribute_name",
      valueCol: String = "attribute_value"): DataFrame =
    pivot(long, idCols, attributeRegistry(long, nameCol), nameCol, valueCol)
}
