package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketized interval (range) join: match point rows to interval rows with
  * `start <= point <= end` and NO equi-key. Spark plans a bare range
  * predicate as BroadcastNestedLoopJoin — a full cartesian scan per
  * partition, the classic 100 TB scale-killer.
  *
  * The fix is the standard coarse-bucket equi-join: pick a bucket width
  * `>=` the longest interval, explode every interval to the (at most two)
  * buckets it can overlap, map each point to its single bucket, equi-join
  * on the bucket id (one shuffle, hash join, AQE-skew-splittable) and
  * re-check the exact range predicate. Correct for ANY interval length
  * `<= bucketWidth`; fan-out is bounded at 2 rows per interval, vs the
  * unbounded fan-out of exploding to fine-grained buckets.
  */
object RangeJoin {

  /** Inner bucketized range join. `pointCol` (long) in `points` is matched
    * against `[startCol, endCol]` (longs, inclusive) in `intervals`;
    * every interval must satisfy `end - start <= bucketWidth` (enforced at
    * runtime: violating rows would silently lose matches, so they fail the
    * job instead). Output: all interval columns + all point columns.
    */
  def pointsInIntervals(intervals: DataFrame, points: DataFrame,
                        startCol: String, endCol: String, pointCol: String,
                        bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0)
    // a filter cannot be pruned away, so the width guard always evaluates;
    // null bounds DROP the row (join semantics — a null can never satisfy
    // the range predicate) rather than falling into the raise branch
    val guarded = intervals.filter(
      when(col(startCol).isNull || col(endCol).isNull, lit(false))
        .when(col(endCol) - col(startCol) <= bucketWidth, lit(true))
        .otherwise(raise_error(concat(lit(
          s"RangeJoin: interval longer than bucketWidth=$bucketWidth at start="),
          col(startCol)))))
    val iv = guarded
      .withColumn("__b", explode(sequence(
        floor(col(startCol) / bucketWidth),
        floor(col(endCol) / bucketWidth))))
    val pt = points.withColumn("__b", floor(col(pointCol) / bucketWidth))
    iv.join(pt, Seq("__b"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__b")
  }

  /** Interval×interval OVERLAP join (`a.start <= b.end && b.start <= a.end`,
    * inclusive) — the shape pointsInIntervals cannot express (both sides
    * are ranges). Same coarse-bucket trick, both sides exploded: a pair
    * that overlaps must share at least one covered bucket, so the
    * bucket equi-join is a superset of the answer; because a pair can
    * co-occur in up to TWO shared buckets, matches dedupe through a
    * groupBy on the join keys (`aKey`/`bKey` must each be unique in their
    * frame — enforced semantics, documented not checked: a duplicate key
    * would silently merge its matches). The exact predicate recheck runs
    * after dedup, and both widths are runtime-guarded like
    * [[pointsInIntervals]].
    *
    * Output: aKey, bKey, the four bound columns, and `overlap` =
    * min(aEnd,bEnd) - max(aStart,bStart) (inclusive-bound length in the
    * key unit). */
  def intervalsOverlap(a: DataFrame, b: DataFrame,
                       aKey: String, aStart: String, aEnd: String,
                       bKey: String, bStart: String, bEnd: String,
                       bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0)
    def guard(df: DataFrame, s: String, e: String) = df.filter(
      when(col(s).isNull || col(e).isNull, lit(false))
        .when(col(e) - col(s) <= bucketWidth, lit(true))
        .otherwise(raise_error(concat(lit(
          s"RangeJoin: interval longer than bucketWidth=$bucketWidth at start="),
          col(s)))))
    def explodeBuckets(df: DataFrame, s: String, e: String) =
      guard(df, s, e).withColumn("__b", explode(sequence(
        floor(col(s) / bucketWidth), floor(col(e) / bucketWidth))))
    val av = explodeBuckets(a.select(col(aKey), col(aStart), col(aEnd)), aStart, aEnd)
    val bv = explodeBuckets(b.select(col(bKey), col(bStart), col(bEnd)), bStart, bEnd)
    av.join(bv, Seq("__b"))
      .filter(col(aStart) <= col(bEnd) && col(bStart) <= col(aEnd))
      // a pair can share up to two buckets: dedupe on the unique keys
      .groupBy(col(aKey), col(bKey))
      .agg(first(col(aStart)).as(aStart), first(col(aEnd)).as(aEnd),
        first(col(bStart)).as(bStart), first(col(bEnd)).as(bEnd))
      .withColumn("overlap",
        least(col(aEnd), col(bEnd)) - greatest(col(aStart), col(bStart)))
  }

  /** Width annotation for the DECLARATIVE form: write the naive range
    * predicate `p >= s && p <= bucketedEnd(e, w)` and let
    * [[graft.plans.RangeJoinRewrite]] (installed via
    * [[graft.GraftExtensions]]) rewrite the join to the coarse-bucket
    * plan. Identity at runtime — a session without the rule still returns
    * correct rows, just through Spark's nested-loop join. */
  def bucketedEnd(end: org.apache.spark.sql.Column, width: Long): org.apache.spark.sql.Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      graft.functions.BucketedEnd(
        org.apache.spark.sql.graftbridge.Bridge.expression(end), width))

  /** The declarative twin of [[pointsInIntervals]]: a plain range-predicate
    * join carrying the [[bucketedEnd]] annotation, rewritten to the
    * bucketized equi-join by [[graft.plans.RangeJoinRewrite]] when graft's
    * extensions are installed. Output: point columns then interval columns. */
  def pointsInIntervalsAuto(intervals: DataFrame, points: DataFrame,
                            startCol: String, endCol: String, pointCol: String,
                            bucketWidth: Long): DataFrame =
    points.join(intervals,
      points(pointCol) >= intervals(startCol) &&
        points(pointCol) <= bucketedEnd(intervals(endCol), bucketWidth))

  /** Left variant: intervals with no matching point survive with null
    * point columns (including intervals with null bounds, which can never
    * match). Implemented as the inner join plus an anti-joined union —
    * the inner path stays a pure equi-join. The inner result feeds both
    * union branches, so it is persisted (lazy — construction stays
    * plan-only, CacheManager dedupes repeated calls by canonical plan,
    * and the bucketized join remains visible in the executed plan for
    * the shape gates); the anti-join compares null-safely (`<=>`) so an
    * interval carrying a null attribute column still matches its own
    * inner rows.
    *
    * The cached inner frame stays registered with the CacheManager for the
    * session lifetime (identical plans dedupe, but calls over DIFFERENT
    * inputs each add an entry) — long-lived sessions should pass
    * `persistInner = false` to trade one recomputation per call for a
    * bounded cache, exactly like `Shingles.jaccardPairs(persistIndex)`. */
  def pointsInIntervalsLeft(intervals: DataFrame, points: DataFrame,
                            startCol: String, endCol: String, pointCol: String,
                            bucketWidth: Long,
                            persistInner: Boolean = true): DataFrame = {
    val inner0 = pointsInIntervals(intervals, points, startCol, endCol,
      pointCol, bucketWidth)
    val inner =
      if (persistInner)
        inner0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else inner0
    val matched = inner.select(intervals.columns.map(col).toSeq: _*).as("m")
    val unmatched = intervals.as("iv")
      .join(matched,
        intervals.columns.map(c => col(s"iv.$c") <=> col(s"m.$c")).reduce(_ && _),
        "left_anti")
      .select(intervals.columns.map(c => col(s"iv.$c").as(c)).toSeq: _*)
    val withNulls = points.columns.foldLeft(unmatched) { (df, c) =>
      df.withColumn(c, lit(null).cast(points.schema(c).dataType))
    }
    inner.unionByName(withNulls)
  }
}
