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
    * with n_items = 0 (the reference keeps them as "zero" samples).
    *
    * Aggregate-before-join: items are reduced to one row per `joinKey`
    * FIRST (map-side-combinable, so the shuffle carries one row per child,
    * not one per item), then joined to the child table — the join-then-
    * group formulation shuffles every item row through the join and again
    * into the aggregation, which at fact scale doubles the dominant
    * shuffle. Requires `child` unique on `joinKey` (it is the child PK in
    * every reference shape — sample_id, run_id, orderkey); under that key
    * the rewrite is exactly the SQL join+group semantics, including
    * n_items = 0 and a null `actual` for childless rows. */
  def perChildRollup(
      child: DataFrame, childKeys: Seq[String],
      items: DataFrame, joinKey: String,
      expected: Column, actual: Column): DataFrame = {
    val perKey = items
      .groupBy(col(joinKey))
      .agg(
        Exact.dsum(actual).as("actual"),
        count(actual).as("__n_items"))
    child
      .join(perKey, Seq(joinKey), "left_outer")
      .select((childKeys.map(col) ++ Seq(
        expected.as("expected"),
        col("actual"),
        coalesce(col("__n_items"), lit(0L)).as("n_items"))): _*)
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
