package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.FixedPointExpressions

/** The reference's sort+pick idioms (SURVEY.md §2.5) as window functions.
  *
  * The reference has no SQL windows; it sorts pandas frames and takes
  * `.values[0]` / slices (projectutils.py:518-531,
  * check_sequence_index_barcodes.py:69, samplesheet_utils.py:90-106). Each
  * becomes one `Window.partitionBy` — a single shuffle on the partition key,
  * no driver-side iteration, AQE-skew-splittable at scale.
  *
  * Every helper demands an explicit total order: a non-deterministic
  * tie-break is invisible at 6k rows and a correctness bug at 100 TB.
  */
object WindowOps {

  /** First row per group under `order` (projectutils.py:518-531). */
  def firstAfterSort(df: DataFrame, part: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(part.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Top-k rows per group, rank column kept as `rankCol`. */
  def topK(df: DataFrame, part: Seq[String], order: Seq[Column], k: Int,
           rankCol: String = "rk"): DataFrame = {
    val w = Window.partitionBy(part.map(col): _*).orderBy(order: _*)
    df.withColumn(rankCol, row_number().over(w)).filter(col(rankCol) <= k)
  }

  /** Bounded top-k per group — the scale-correct form of [[topK]].
    *
    * [[topK]]'s window sorts every row and lands each group on one task;
    * with few groups that is a handful of giant tasks at 100 TB. This
    * version aggregates a k-bounded heap ([[graft.functions.TopKRows]])
    * with map-side combine: each scan partition contributes ≤ k rows per
    * group to the shuffle, and the rank falls out of `posexplode` over the
    * heap's sorted dump. `order` maps column name → descending?, and must
    * be a total order within each group.
    */
  def topKBounded(df: DataFrame, part: Seq[String], order: Seq[(String, Boolean)],
                  k: Int, rankCol: String = "rk"): DataFrame = {
    val sortNames = order.map(_._1)
    val rest = df.columns.toSeq.filterNot(c => sortNames.contains(c) || part.contains(c))
    val st = struct((sortNames ++ rest).map(col): _*)
    df.groupBy(part.map(col): _*)
      .agg(graft.functions.TopKRows.topKRows(st, k, order.map(_._2)).as("__topk"))
      .select(part.map(col) :+ posexplode(col("__topk")).as(Seq("__pos", "__row")): _*)
      .select(part.map(col) ++
        (sortNames ++ rest).map(n => col(s"__row.$n").as(n)) :+
        (col("__pos") + lit(1)).as(rankCol): _*)
  }

  /** Decimal-exact running sum (order-stable across engines, see [[Exact]]).
    * `order` must be a total order or frame contents are undefined.
    * The per-row double→decimal conversion is the codegen'd
    * [[graft.functions.ScaledDecimal]]: inside WindowExec the frame
    * processor evaluates the input expression once per row, so the
    * string-free cast is what keeps the running sum off the BigDecimal
    * slow path. */
  def runningSumExact(df: DataFrame, part: Seq[String], order: Seq[Column],
                      value: Column, as: String): DataFrame = {
    val w = Window.partitionBy(part.map(col): _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(as,
      sum(FixedPointExpressions.scaledDecimal(value.cast("double"), 18, 4))
        .over(w).cast("double"))
  }

  /** Truncate a string column to its group-minimum length — the reference's
    * per-lane index truncation (samplesheet_utils.py:90-106). */
  def truncateToGroupMin(df: DataFrame, part: Seq[String], strCol: String,
                         as: String): DataFrame = {
    val w = Window.partitionBy(part.map(col): _*)
    df.withColumn("__minlen", min(length(col(strCol))).over(w))
      .withColumn(as, col(strCol).substr(lit(1), col("__minlen")))
      .drop("__minlen")
  }
}
