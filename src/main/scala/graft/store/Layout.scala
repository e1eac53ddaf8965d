package graft.store

import org.apache.spark.sql.{Column, DataFrame}

/** Data-layout writer for range-pruned scans — the storage-side half of
  * the 100 TB story: predicate pushdown only pays off when the parquet
  * row-group/file min-max statistics are TIGHT, and they are only tight
  * when the data is range-clustered on the filter column.
  *
  * `writeRangeClustered` range-partitions on the cluster columns and sorts
  * within each partition, so every output file owns a narrow slice of the
  * key space. A filter on those columns then skips whole files (via
  * min-max in the footer) instead of scanning everything — LayoutSpec
  * measures the scan's actual output-row metric shrinking ~proportionally
  * to the selected range, against an identical-content shuffled layout
  * that reads everything. Same idea as Delta's OPTIMIZE ZORDER restricted
  * to one dimension (for multi-dimension clustering, interleave bits of
  * the key columns into a z-value column and cluster on that).
  */
object Layout {

  /** Caveat found measuring this (LayoutSpec): Spark reads the synthetic
    * tables' TIMESTAMP columns as TIMESTAMP_NTZ, and while NTZ predicates
    * DO appear under PushedFilters, row-group stats skipping silently does
    * nothing for them (measured: full scan despite perfectly clustered
    * files). Cluster and filter on DATE or integer epoch columns — both
    * prune as expected — or cast before writing. */
  def writeRangeClustered(df: DataFrame, dir: String, numFiles: Int,
                          clusterCols: Column*): Unit =
    df.repartitionByRange(numFiles, clusterCols: _*)
      .sortWithinPartitions(clusterCols: _*)
      .write.mode("overwrite").parquet(dir)
}
