package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact global ordering operators without a single-partition window.
  *
  * `Window.orderBy(...)` with no partition key moves the whole input to one
  * task (Spark's own "No Partition Defined" warning) — fine for a
  * samplesheet, a stall at 100 TB. The scale-correct equivalent is the
  * classic two-phase rank: range-partition on the order key, count rows per
  * partition (a few hundred longs to the driver), then add each partition's
  * prefix offset to a partition-local `row_number`. Sorting stays fully
  * parallel; the only global state is the tiny offset map.
  *
  * Determinism: both passes observe the same range partitioning (Spark's
  * RangePartitioner samples with a fixed seed over the same input), and the
  * caller must supply a TOTAL order — the same contract as
  * [[graft.ops.WindowOps]].
  */
object GlobalOrder {

  private val PidCol = "__go_pid"
  private val LrnCol = "__go_lrn"

  /** Global `row_number() over (order by orderCols)` as `as`, computed with
    * partition-parallel sorts. `numPartitions` bounds sort-task size at
    * scale (default: spark.sql.shuffle.partitions). */
  def withGlobalRank(df: DataFrame, orderCols: Seq[Column], as: String,
                     numPartitions: Option[Int] = None): DataFrame =
    withGlobalRankAndTotal(df, orderCols, as, numPartitions)._1

  /** [[withGlobalRank]] plus the total row count, which the counts pass
    * computes anyway — callers needing N (ntile) avoid a separate count
    * job. */
  def withGlobalRankAndTotal(df: DataFrame, orderCols: Seq[Column], as: String,
                             numPartitions: Option[Int] = None): (DataFrame, Long) = {
    val n = numPartitions.getOrElse(
      df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200").toInt)
    // PERSIST the range-partitioned input before the counts pass: the
    // RangePartitioner's reservoir sampling is seeded per RDD instance, so
    // two separate actions over an unmaterialized repartitionByRange can
    // sample DIFFERENT boundaries once partitions exceed the sample size —
    // pass-1 offsets would then describe pass-2 partitions incorrectly
    // (duplicate/gapped ranks). The counts action below materializes the
    // cache; the rank pass reads the same physical partitioning.
    val ranged = df.repartitionByRange(n, orderCols: _*)
      .withColumn(PidCol, spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // pass 1: per-partition row counts → prefix offsets (driver-side, ≤ n longs)
    val counts = ranged.groupBy(PidCol).count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets: Map[Int, Long] = {
      val sorted = counts.toSeq.sortBy(_._1)
      sorted.map(_._1).zip(sorted.map(_._2).scanLeft(0L)(_ + _)).toMap
    }
    // pass 2: partition-local row_number (parallel: one window group per
    // range partition) + literal offset array indexed by pid (dense 0..max;
    // empty partitions contribute 0 rows and a 0 offset delta)
    val offsetCol =
      if (offsets.isEmpty) lit(0L)
      else {
        val maxPid = offsets.keys.max
        val dense = (0 to maxPid).map(p => lit(offsets.getOrElse(p, 0L)))
        element_at(array(dense: _*), col(PidCol) + 1)
      }
    val w = Window.partitionBy(col(PidCol)).orderBy(orderCols: _*)
    // the cached `ranged` stays pinned for the session (CacheManager
    // dedupes identical plans, so repeated calls share one entry); the
    // returned frame reads it lazily, so an eager unpersist here would
    // silently reintroduce the two-sample race
    val ranked = ranged
      .withColumn(LrnCol, row_number().over(w).cast("long"))
      .withColumn(as, offsetCol + col(LrnCol))
      .drop(PidCol, LrnCol)
    (ranked, counts.values.sum)
  }

  /** Exact balanced n-tile over a global order — same output as
    * `ntile(n) over (order by ...)` (first `N mod n` tiles get the extra
    * row), derived from the global rank in closed form. */
  def ntileBalanced(df: DataFrame, orderCols: Seq[Column], tiles: Int,
                    as: String, numPartitions: Option[Int] = None): DataFrame = {
    require(tiles > 0)
    val rankCol = "__go_rank"
    // N comes from the rank pass's per-partition counts — no separate
    // count() job
    val (ranked, n) = withGlobalRankAndTotal(df, orderCols, rankCol, numPartitions)
    val base = n / tiles
    val rem = n % tiles
    val tile =
      if (base == 0) col(rankCol) // fewer rows than tiles: rank IS the tile
      else when(col(rankCol) <= lit(rem * (base + 1)),
          (col(rankCol) - 1) / lit(base + 1) + 1)
        .otherwise(lit(rem) + (col(rankCol) - 1 - lit(rem * (base + 1))) / lit(base) + 1)
    ranked.withColumn(as, tile.cast("int")).drop(rankCol)
  }
}
