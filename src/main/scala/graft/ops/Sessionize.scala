package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization: split each key's event stream into sessions at
  * inactivity gaps > `gap`. The batch twin of
  * [[graft.streaming.EventStreams]]'s mapGroupsWithState sessionizer —
  * same gap semantics, so the streaming job's converged output can be
  * validated against this (the pattern q23 uses for windowed aggs).
  *
  * Classic two-window formulation: flag rows whose gap to the previous
  * event exceeds the threshold, then a running sum of flags numbers the
  * sessions. Both windows share ONE partitioning (the key) and ONE sort
  * order — Spark plans a single Exchange + single Sort, and the 100 TB
  * cost is exactly one shuffle of the events table. The sort key includes
  * the unique event id as a tiebreaker so simultaneous events produce a
  * total order (the WindowOps contract: no nondeterministic window orders).
  */
object Sessionize {

  /** Assign `session_idx` (0-based per key) to every event row.
    *
    * @param tsCol   integer event time (microseconds in the events table)
    * @param tieCol  unique-per-key column completing the total order
    * @param gapUs   inactivity threshold in the same unit as tsCol
    */
  def byGap(df: DataFrame, keyCol: String, tsCol: String, tieCol: String,
            gapUs: Long): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    df.withColumn("__prev", lag(col(tsCol), 1).over(w))
      .withColumn("__new",
        when(col("__prev").isNull || col(tsCol) - col("__prev") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_idx",
        sum(col("__new")).over(w.rowsBetween(Window.unboundedPreceding, 0)) - 1L)
      .drop("__prev", "__new")
  }

  /** Per-session rollup: event count, span, bounds. Reuses the byGap
    * partitioning, so the groupBy introduces no second shuffle of the raw
    * events (AQE coalesces the already-key-clustered map output). */
  def sessions(df: DataFrame, keyCol: String, tsCol: String, tieCol: String,
               gapUs: Long): DataFrame =
    byGap(df, keyCol, tsCol, tieCol, gapUs)
      .groupBy(col(keyCol), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(tsCol)).as("start_us"),
        max(col(tsCol)).as("end_us"))
      .withColumn("dur_us", col("end_us") - col("start_us"))
}
