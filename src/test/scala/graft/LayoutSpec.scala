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
