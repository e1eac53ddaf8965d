package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.store.Layout

/** Range-clustered layout makes parquet min-max pruning real: the same
  * filter over identical content reads a fraction of the rows it reads
  * from a shuffled layout. Also pins the approx_percentile scale path's
  * error bound against the exact q34 aggregate. */
class LayoutSpec extends AnyFunSuite {
  import SparkTestSession._

  /** Rows the parquet scan actually produced (post row-group pruning +
    * pushed filters), from the executed plan's scan metric. */
  private def scannedRows(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect()
    val scans = df.queryExecution.executedPlan.collectLeaves().collect {
      case s: FileSourceScanExec => s.metrics("numOutputRows").value
    }
    scans.sum
  }

  test("range-clustered layout prunes scans; shuffled layout cannot") {
    // DATE, not the raw TIMESTAMP_NTZ: NTZ predicates push down but do NOT
    // skip row groups (see Layout's scaladoc — measured full scans on
    // perfectly clustered files)
    val li = Tables(spark, sf).lineitem.select(col("l_orderkey"),
      to_date(col("l_shipdate")).as("ship_date"), col("l_quantity"))
    val total = li.count()
    val clustered = java.nio.file.Files.createTempDirectory("li-clustered").toString
    val shuffled = java.nio.file.Files.createTempDirectory("li-shuffled").toString
    Layout.writeRangeClustered(li, clustered, numFiles = 8, col("ship_date"))
    // identical content, key-uncorrelated layout
    li.repartition(8, col("l_orderkey")).write.mode("overwrite").parquet(shuffled)

    // ~one month of a multi-year range
    val pred = col("ship_date") >= lit("1995-03-01").cast("date") &&
      col("ship_date") < lit("1995-04-01").cast("date")
    val clusteredScan = scannedRows(spark.read.parquet(clustered).filter(pred))
    val shuffledScan = scannedRows(spark.read.parquet(shuffled).filter(pred))
    val selected = spark.read.parquet(clustered).filter(pred).count()

    assert(selected > 0, "vacuous: no rows in the probed range")
    // same answer from both layouts
    assert(spark.read.parquet(shuffled).filter(pred).count() == selected)
    // the shuffled layout's row groups all straddle the range -> reads ~all;
    // the clustered layout skips non-overlapping files/row-groups entirely
    assert(shuffledScan > (total * 0.8).toLong,
      s"shuffled layout unexpectedly pruned: $shuffledScan of $total")
    assert(clusteredScan < (total * 0.3).toLong,
      s"clustered layout did not prune: read $clusteredScan of $total rows " +
        s"for a ${selected}-row range")
  }

  test("z-order prunes on BOTH dimensions; range clustering only on its lead") {
    val li = Tables(spark, sf).lineitem.select(
      col("l_orderkey"),
      datediff(to_date(col("l_shipdate")), lit("1992-01-01").cast("date"))
        .as("ship_day"),
      col("l_partkey"), col("l_quantity"))
    val total = li.count()
    val zdir = java.nio.file.Files.createTempDirectory("li-zorder").toString
    val rdir = java.nio.file.Files.createTempDirectory("li-range").toString
    Layout.writeZOrdered(li, zdir, numFiles = 16,
      zCols = Seq("ship_day", "l_partkey"))
    Layout.writeRangeClustered(li, rdir, numFiles = 16, col("ship_day"))

    val maxDay = li.agg(max("ship_day")).head.getInt(0)
    val maxPart = li.agg(max("l_partkey")).head.getLong(0)
    val dayPred = col("ship_day") >= maxDay / 2 - maxDay / 20 &&
      col("ship_day") < maxDay / 2 + maxDay / 20 // ~10% slab in dim 1
    val partPred = col("l_partkey") >= maxPart / 2 - maxPart / 20 &&
      col("l_partkey") < maxPart / 2 + maxPart / 20 // ~10% slab in dim 2

    def scan(dir: String, pred: org.apache.spark.sql.Column): Long =
      scannedRows(spark.read.parquet(dir).filter(pred))

    // identical results from both layouts
    assert(spark.read.parquet(zdir).filter(dayPred && partPred).count() ==
      spark.read.parquet(rdir).filter(dayPred && partPred).count())
    // range layout: perfect on lead dim, blind on the other
    assert(scan(rdir, dayPred) < (total * 0.3).toLong, "range layout lead-dim pruning broken")
    assert(scan(rdir, partPred) > (total * 0.9).toLong, "test premise: range layout can't prune dim 2")
    // z-order: meaningful pruning on EACH dim alone... The bound leaves
    // headroom for run-to-run variance: the range partitioner's sampled
    // bounds break z-value ties by arrival order, so row-group min/max
    // envelopes wobble a few percent between otherwise-identical writes
    // (observed 66–75% on dim 2). The contrast that matters is vs the
    // range layout, which stays > 90% blind on dim 2 above.
    val zDay = scan(zdir, dayPred)
    val zPart = scan(zdir, partPred)
    assert(zDay < (total * 0.8).toLong, s"z-order dim-1 pruning weak: $zDay of $total")
    assert(zPart < (total * 0.8).toLong, s"z-order dim-2 pruning weak: $zPart of $total")
    // ...and multiplicative pruning on the rectangle
    val zBoth = scan(zdir, dayPred && partPred)
    assert(zBoth < (total * 0.45).toLong, s"z-order rectangle pruning weak: $zBoth of $total")
  }

  test("approx_count_distinct (vocab/cardinality scale path) within its rsd bound") {
    // d10/d17-style cardinality questions (vocabulary size, distinct
    // shingles per source) use exact counts here; the 100 TB path is the
    // HLL++ sketch, whose relative standard deviation is a parameter. Pin
    // the contract at 4 sigma so the suite catches a regression in either
    // the sketch or our assumption about it.
    val rsd = 0.02
    val docs = Tables(spark, sf).documents
    val toks = docs.select(explode(split(trim(col("text")), "\\s+")).as("t"))
      .where(col("t") =!= "")
    val exact = toks.agg(countDistinct(col("t"))).head.getLong(0)
    val approx = toks.agg(approx_count_distinct(col("t"), rsd)).head.getLong(0)
    assert(math.abs(approx - exact).toDouble <= math.max(4 * rsd * exact, 1.0),
      s"approx $approx vs exact $exact beyond 4x rsd=$rsd")
    // grouped form: per-source distinct shingle estimates
    val bySrc = docs.select(col("source"),
        explode(split(trim(col("text")), "\\s+")).as("t"))
      .where(col("t") =!= "")
      .groupBy("source")
      .agg(countDistinct(col("t")).as("exact"),
        approx_count_distinct(col("t"), rsd).as("approx"))
      .collect()
    assert(bySrc.length > 1)
    for (r <- bySrc) {
      val (e, a) = (r.getAs[Long]("exact"), r.getAs[Long]("approx"))
      assert(math.abs(a - e).toDouble <= math.max(4 * rsd * e, 2.0),
        s"${r.getAs[String]("source")}: approx $a vs exact $e")
    }
  }

  test("approx_percentile (scale path for q34) is within its accuracy bound of exact") {
    // At 100 TB a grouped exact percentile (ArrayPercentile buffers the
    // group) is the verification path; the scale path is the built-in
    // positional-accuracy sketch. Pin the contract: with accuracy N the
    // sketch's rank error is <= n/N, so its VALUE must sit between the
    // exact percentiles at rank +- n/N.
    val acc = 1000
    val lo = 0.5 - 1.0 / acc
    val hi = 0.5 + 1.0 / acc
    val li = Tables(spark, sf).lineitem
    val exact = li.groupBy("l_returnflag").agg(
      expr("percentile(l_quantity, 0.5)").as("p50_exact"),
      expr(s"percentile(l_quantity, array(CAST($lo AS DOUBLE), CAST($hi AS DOUBLE)))")
        .as("bounds"))
    val sketch = li.groupBy("l_returnflag").agg(
      expr(s"approx_percentile(l_quantity, 0.5, $acc)").as("p50_approx"))
    val joined = exact.join(sketch, "l_returnflag").collect()
    assert(joined.nonEmpty)
    for (r <- joined) {
      val lo = r.getAs[scala.collection.Seq[Double]]("bounds").head
      val hi = r.getAs[scala.collection.Seq[Double]]("bounds").last
      val approx = r.getAs[Double]("p50_approx")
      assert(approx >= lo && approx <= hi,
        s"${r.getAs[String]("l_returnflag")}: approx $approx outside [$lo, $hi]")
    }
  }
}
