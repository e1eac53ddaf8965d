package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot differencing — the reference's ongoing-run file-growth tracking
  * (ongoing_seqrun_processing.py:116+, calculate_seqrun_file_size.py:4-54):
  * it re-lists a run directory and diffs sizes against the previous JSON
  * snapshot. Here both snapshots are DataFrames (e.g. two binaryFile
  * scans or two MetadataStore versions) and the diff is one full-outer
  * join — added / removed / changed rows come back tagged, at any scale. */
object SnapshotDiff {

  /** Diff two snapshots on `key`; `watchCols` are compared for change.
    * Output: key cols + old/new watch values + `change` in
    * {added, removed, changed, unchanged}. */
  def diff(prev: DataFrame, curr: DataFrame, key: Seq[String],
           watchCols: Seq[String]): DataFrame = {
    val p = watchCols.foldLeft(prev)((d, c) => d.withColumnRenamed(c, s"old_$c"))
      .withColumn("__in_prev", lit(1))
    val c = watchCols.foldLeft(curr)((d, c0) => d.withColumnRenamed(c0, s"new_$c0"))
      .withColumn("__in_curr", lit(1))
    val joined = p.join(c, key, "full_outer")
    val anyChanged = watchCols
      .map(w => col(s"old_$w") =!= col(s"new_$w"))
      .reduceOption(_ || _).getOrElse(lit(false))
    joined.withColumn("change",
        when(col("__in_prev").isNull, "added")
          .when(col("__in_curr").isNull, "removed")
          .when(coalesce(anyChanged, lit(true)), "changed")
          .otherwise("unchanged"))
      .drop("__in_prev", "__in_curr")
  }
}
