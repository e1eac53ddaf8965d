package graft.store

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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

  /** Multi-dimension clustering (Delta OPTIMIZE ZORDER shape): quantile-
    * bucket each cluster column, interleave the bucket bits into a
    * Z-value, range-cluster on it. Every output file then owns a compact
    * HYPER-RECTANGLE of the key space, so min-max pruning works on EACH
    * dimension — where single-column range clustering prunes only its
    * lead column and leaves a filter on any other dimension scanning
    * everything (LayoutSpec measures exactly this contrast).
    *
    * Quantile boundaries come from `approxQuantile` (one sampling pass);
    * they only shape the layout — a skewed or stale boundary set degrades
    * pruning, never correctness. The bucket lookup is an O(buckets)
    * codegen'd comparison chain per dimension — write-side cost only.
    * Columns must be numeric (cast dates to epoch days first; see the
    * TIMESTAMP_NTZ caveat above). */
  def writeZOrdered(df: DataFrame, dir: String, numFiles: Int,
                    zCols: Seq[String], bitsPerDim: Int = 6): Unit = {
    require(zCols.nonEmpty && bitsPerDim >= 1 && bitsPerDim <= 16,
      s"need >=1 z columns and 1..16 bits, got $zCols / $bitsPerDim")
    require(zCols.size * bitsPerDim <= 62, "z-value must fit a signed long")
    val buckets = 1 << bitsPerDim
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    val doubled = zCols.zipWithIndex.foldLeft(df) { case (d, (c, i)) =>
      d.withColumn(s"__zd$i", col(c).cast("double"))
    }
    // one sampling pass for ALL dimensions — the multi-column overload;
    // a per-column call would re-scan the input once per z dimension
    val boundSets: Seq[Array[Double]] = doubled.stat
      .approxQuantile(zCols.indices.map(i => s"__zd$i").toArray, probs, 0.001)
      .map(_.distinct).toSeq
    // bucket index = #boundaries <= value (null -> bucket 0, sorts first)
    val bucketCols: Seq[Column] = boundSets.zipWithIndex.map { case (bs, i) =>
      coalesce(
        size(filter(lit(bs), b => b <= col(s"__zd$i"))).cast("long"), lit(0L))
    }
    val dims = bucketCols.size
    // bit i of dim d lands at position i*dims + (dims-1-d): low bits of
    // every dimension stay low in the z-value, which is what makes a
    // z-range a hyper-rectangle
    val zval = (0 until bitsPerDim).flatMap { i =>
      bucketCols.zipWithIndex.map { case (b, d) =>
        shiftleft(shiftright(b, i).bitwiseAND(lit(1L)),
          i * dims + (dims - 1 - d))
      }
    }.reduce(_ + _)
    doubled.withColumn("__zval", zval)
      .repartitionByRange(numFiles, col("__zval"))
      .sortWithinPartitions(col("__zval"))
      .drop((zCols.indices.map(i => s"__zd$i") :+ "__zval"): _*)
      .write.mode("overwrite").parquet(dir)
  }
}
