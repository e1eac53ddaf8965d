package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Two-level "expected vs summed-actual" census.
  *
  * Re-expresses the reference's pooling report (project_pooling_info.py:55-69
  * SQL stage, :78-121 driver-side census): a parent/child/item hierarchy
  * where each child has an expected value and its items sum to an actual
  * value, and each parent counts its children into pass / fail / zero
  * buckets.
  *
  * The reference runs the join+group in the database and then walks nested
  * pandas groupbys single-threaded. Here the whole thing is one declarative
  * plan: two hash aggregations and two joins, so Catalyst plans map-side
  * partial aggregation and (for a small parent dimension) a broadcast join.
  * No driver-side iteration; scales with the item table.
  */
object Census {

  /** Stage 1: per-child rollup. Left-outer so children with no items survive
    * with n_items = 0 (the reference keeps them as "zero" samples). */
  def perChildRollup(
      child: DataFrame, childKeys: Seq[String],
      items: DataFrame, joinKey: String,
      expected: Column, actual: Column): DataFrame = {
    child
      .join(items, Seq(joinKey), "left_outer")
      .groupBy(childKeys.map(col): _*)
      .agg(
        max(expected).as("expected"),
        Exact.dsum(actual).as("actual"),
        count(actual).as("n_items"))
  }

  /** Stage 2: per-parent pass/fail/zero census over the stage-1 rollup.
    * pass  = has items and actual >= expected * passRatio
    * fail  = has items and actual <  expected * passRatio
    * zero  = no items at all. */
  def passFailZero(
      parent: DataFrame, parentKeys: Seq[String],
      rollup: DataFrame, joinKey: String,
      passRatio: Double): DataFrame = {
    val hasItems = col("n_items") > 0
    val passed   = col("actual") >= col("expected") * lit(passRatio)
    parent
      .join(rollup, Seq(joinKey))
      .groupBy(parentKeys.map(col): _*)
      .agg(
        count(when(hasItems && passed, 1)).as("n_pass"),
        count(when(hasItems && !passed, 1)).as("n_fail"),
        count(when(!hasItems, 1)).as("n_zero"))
  }
}
