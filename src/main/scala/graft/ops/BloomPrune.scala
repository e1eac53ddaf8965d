package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter-pruned exact semi-join — the decontamination /
  * membership-probe shape when the probe set is too large to broadcast
  * as an exact hash table but its BLOOM FILTER still fits everywhere.
  *
  * A broadcast hash semi-join dies when the small side stops being small
  * (a benchmark suite of 10^8 shingles at 8 bytes is already ~1 GB of
  * exact hashes per executor); the fallback shuffle semi-join pays a full
  * exchange of the 100 TB side. The middle path: aggregate the probe keys
  * into ONE bloom filter (mergeable buffers — a map-side-combined
  * aggregation whose shuffle is `numBits/8` bytes per partition, not per
  * row), ship it as a plan literal, and filter the big side IN THE SCAN
  * PROJECTION before any join machinery. Only the ~fpp false-positive
  * survivors reach the exact semi-join that makes the result precise, so
  * the exchange carries `match_rate + fpp` of the corpus instead of all
  * of it. Catalyst end to end ([[BloomFilterAggregate]] +
  * [[BloomFilterMightContain]], both codegen'd) — no UDF, no driver-side
  * sketch object in the row path.
  *
  * Correctness does not depend on the bloom (no false negatives by
  * construction; false positives are removed by the exact join) — the
  * spec still proves result equality against the plain semi-join, plus
  * the measured pruning rate the plan exists for.
  */
object BloomPrune {

  /** Exact `big LEFT SEMI JOIN small ON bigKey = smallKey`, with the big
    * side pre-filtered by a bloom of the small side's keys.
    *
    * @param expectedItems sizing for the filter (distinct small keys);
    *                      overestimating wastes bits, underestimating
    *                      raises fpp — both safe.
    * @param fpp           target false-positive rate (drives numBits). */
  def semiJoin(big: DataFrame, bigKey: String, small: DataFrame,
               smallKey: String, expectedItems: Long,
               fpp: Double = 0.01): DataFrame = {
    val bloom = buildBloom(small, col(smallKey), expectedItems, fpp)
    // the probe key gets an internal alias: with bigKey == smallKey (the
    // common case for a semi-join) a bare col(bigKey) === col(smallKey)
    // is an ambiguous reference and throws at analysis
    val probe = small.select(col(smallKey).as("__probe_key")).distinct()
    big.filter(mightContain(bloom, col(bigKey)))
      .join(probe, col(bigKey) === col("__probe_key"), "left_semi")
  }

  /** Aggregate `key`'s xxhash64 values into one serialized bloom filter.
    * One job; the result is a driver-held byte array sized `~1.44 ·
    * expectedItems · log2(1/fpp)` bits — ship it via [[mightContain]]. */
  def buildBloom(df: DataFrame, key: Column, expectedItems: Long,
                 fpp: Double): Array[Byte] = {
    require(expectedItems > 0, "expectedItems must be positive")
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    // numBits formula is the standard optimal sizing (same as
    // BloomFilter.optimalNumOfBits)
    val numBits = math.max(64L,
      (-expectedItems * math.log(fpp) / (math.log(2) * math.log(2))).toLong)
    val agg = Bridge.column(
      BloomFilterAggregate(
        XxHash64(Seq(Bridge.expression(key)), 42L),
        Literal(expectedItems), Literal(numBits), 0, 0).toAggregateExpression())
    df.select(agg.as("bloom")).head.getAs[Array[Byte]]("bloom")
  }

  /** Codegen'd bloom membership probe of `key` (no false negatives). */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    Bridge.column(BloomFilterMightContain(
      Literal.create(bloom, BinaryType),
      XxHash64(Seq(Bridge.expression(key)), 42L)))
}
