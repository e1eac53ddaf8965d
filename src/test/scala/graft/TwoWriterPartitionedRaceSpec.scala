package graft

import java.nio.file.Files
import java.util.concurrent.CyclicBarrier

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.BatchCommit

/** [[TwoWriterRaceSpec]]'s contended soak for the PARTITIONED append path
  * ([[BatchCommit.appendPartitioned]] — ivfCodesIngest's layout): the
  * protocol pieces are shared with the flat path (writer-private nonce
  * staging, put-if-absent root marker, entry-time rollback), but the
  * partitioned commit window is wider — per-CELL mkdirs and per-cell file
  * moves interleave across `cell=` subdirs before the single root claim —
  * so the serialize-or-fail-loudly promise deserves its own race: per
  * batch id the committed content must be exactly ONE writer's complete
  * row set IN EVERY CELL (never a per-cell mix where writer A holds
  * cell 0 and writer B holds cell 1 under one marker), the `cell=` layout
  * must stay reader-prunable, and every losing attempt skips on the
  * marker or throws. */
class TwoWriterPartitionedRaceSpec extends AnyFunSuite {
  import SparkTestSession._

  test("two writers racing partitioned appends: 20 contended batch ids " +
       "each commit one writer's complete batch across every cell dir") {
    import spark.implicits._
    val dir = Files.createTempDirectory("racep").toString + "/codes"
    val nCells = 3
    val rowsPerCell = 2
    def batchDf(writer: String, bid: Long) =
      (for { c <- 0 until nCells; i <- 0 until rowsPerCell }
        yield (writer, bid, c, s"$writer-$bid-$c-$i"))
        .toDF("writer", "bid", "cell", "payload")

    val nBids = 20
    val loudLosses = new java.util.concurrent.atomic.AtomicInteger(0)
    for (bid <- 0L until nBids.toLong) {
      val barrier = new CyclicBarrier(2)
      val errs = new java.util.concurrent.ConcurrentHashMap[String, Throwable]()
      val threads = Seq("A", "B").map { w =>
        new Thread(() => {
          val df = batchDf(w, bid)
          var attempts = 0
          var done = false
          var lastErr: Throwable = null
          val rnd = new scala.util.Random(bid * 2 + (if (w == "A") 0 else 1))
          while (!done && attempts < 10) {
            attempts += 1
            if (attempts == 1) barrier.await() // contend the first try
            else Thread.sleep(rnd.nextInt(150).toLong) // break mutual sweeps
            try {
              // a replaying micro-batch's entry sequence (rollback sweeps
              // the cell subdirs on the partitioned path)
              BatchCommit.rollback(spark, dir, bid)
              BatchCommit.appendPartitioned(df, dir, bid, "cell")
              done = true // committed or skipped-on-marker: both terminal
            } catch {
              case e: java.util.ConcurrentModificationException =>
                loudLosses.incrementAndGet(); lastErr = e
              case e: java.io.IOException => lastErr = e
              case e: org.apache.spark.SparkException => lastErr = e
              // anything else is NOT an expected race outcome: record it
              // and stop retrying so the soak fails loudly instead of
              // passing vacuously with a silently-dead writer
              case scala.util.control.NonFatal(e) =>
                errs.put(w, e); attempts = 10; lastErr = e
            }
          }
          if (!done)
            errs.put(w, if (lastErr != null) lastErr
              else new IllegalStateException(s"$w never converged"))
          ()
        }, s"pwriter-$w-b$bid")
      }
      threads.foreach(_.start())
      threads.foreach(_.join(120000))
      assert(errs.isEmpty, s"bid $bid writers did not converge: $errs")
      assert(BatchCommit.isDone(spark, dir, bid), s"bid $bid never committed")

      // one writer's complete batch, across ALL cells — a per-cell mix
      // under one marker is the partitioned-specific corruption this
      // soak exists to catch
      val got = spark.read.parquet(dir).filter(col("bid") === bid)
        .select("writer", "cell", "payload")
        .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2)))
      val writers = got.map(_._1).distinct
      assert(writers.length == 1,
        s"bid $bid committed a MERGED batch from writers ${writers.toSeq}")
      assert(got.length == nCells * rowsPerCell,
        s"bid $bid committed a holed/duplicated batch: ${got.length} rows")
      val w = writers.head
      assert(got.map(_._3).sorted.toSeq ==
        (for { c <- 0 until nCells; i <- 0 until rowsPerCell }
          yield s"$w-$bid-$c-$i").sorted,
        s"bid $bid content does not match writer $w's batch")
    }

    // afterwards: every batch stands, one writer each, and the physical
    // layout is still the prunable cell= partitioning readers rely on
    val all = spark.read.parquet(dir)
    assert(all.count() == nBids.toLong * nCells * rowsPerCell)
    assert(all.groupBy("bid").agg(countDistinct("writer").as("w"))
      .filter(col("w") > 1).count() == 0)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val cellDirs = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .filter(_.isDirectory).map(_.getPath.getName).sorted
    assert(cellDirs.toSeq == (0 until nCells).map(c => s"cell=$c"),
      s"cell layout lost: ${cellDirs.toSeq}")
    info(s"${loudLosses.get} loud claim losses across $nBids contended batches")
  }
}
