package graft

import java.nio.file.Files
import java.util.concurrent.CyclicBarrier

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.BatchCommit

/** The foreign-writer contract on ONE registry dir, soaked: two writers
  * (two pipelines mis-pointed at the same dir, their independent
  * checkpoints reusing the same batch ids) race rollback+append for 20
  * batch ids, barrier-synchronized for maximum interleaving. The claim
  * protocol ([[BatchCommit.append]]'s put-if-absent marker + post-claim
  * integrity check) promises SERIALIZE-OR-FAIL-LOUDLY: per batch id the
  * committed content is exactly ONE writer's complete row set — never a
  * merge of both, never a hole, never silence — and every losing attempt
  * either skips (marker already present: replay semantics) or throws.
  *
  * This is the race soak behind the scaladoc's claim; the single-crash
  * windows are CrashRecoverySpec's, the compaction swap races are
  * RegistryCompactSpec's. */
class TwoWriterRaceSpec extends AnyFunSuite {
  import SparkTestSession._

  test("two writers on one registry dir: 20 contended batch ids each " +
       "commit exactly one writer's complete batch, losers fail loudly") {
    import spark.implicits._
    val dir = Files.createTempDirectory("race").toString + "/reg"
    val rowsPerBatch = 3
    def batchDf(writer: String, bid: Long) =
      (0 until rowsPerBatch)
        .map(i => (writer, bid, i.toLong, s"$writer-$bid-$i"))
        .toDF("writer", "bid", "i", "payload")

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
              // a replaying micro-batch's entry sequence
              BatchCommit.rollback(spark, dir, bid)
              BatchCommit.append(df, dir, bid)
              done = true // committed or skipped-on-marker: both terminal
            } catch {
              // ConcurrentModificationException is the loud claim loss
              // the contract promises (replay then skips on the marker);
              // IOExceptions are staging/move collisions between two
              // live writers — also loud, and entry rollback makes the
              // retry clean. Any OTHER exception type fails the test.
              case e: java.util.ConcurrentModificationException =>
                loudLosses.incrementAndGet(); lastErr = e
              case e: java.io.IOException => lastErr = e
              case e: org.apache.spark.SparkException => lastErr = e
            }
          }
          if (!done)
            errs.put(w, if (lastErr != null) lastErr
              else new IllegalStateException(s"$w never converged"))
          ()
        }, s"writer-$w-b$bid")
      }
      threads.foreach(_.start())
      threads.foreach(_.join(120000))
      assert(errs.isEmpty, s"bid $bid writers did not converge: $errs")
      assert(BatchCommit.isDone(spark, dir, bid), s"bid $bid never committed")

      // serialize-or-fail-loudly, the content half: this bid's committed
      // rows are exactly ONE writer's COMPLETE batch — no merge, no hole
      val got = spark.read.parquet(dir).filter(col("bid") === bid)
        .collect().map(r => (r.getString(0), r.getLong(2), r.getString(3)))
      val writers = got.map(_._1).distinct
      assert(writers.length == 1,
        s"bid $bid committed a MERGED batch from writers ${writers.toSeq}")
      assert(got.length == rowsPerBatch,
        s"bid $bid committed a holed/duplicated batch: ${got.length} rows")
      val w = writers.head
      assert(got.map(_._3).sorted.toSeq ==
        (0 until rowsPerBatch).map(i => s"$w-$bid-$i"),
        s"bid $bid content does not match writer $w's batch")
    }

    // all 20 batches stand together afterwards, one writer each
    val all = spark.read.parquet(dir)
    assert(all.count() == nBids.toLong * rowsPerBatch)
    assert(all.groupBy("bid").agg(countDistinct("writer").as("w"))
      .filter(col("w") > 1).count() == 0)
    info(s"${loudLosses.get} loud claim losses across $nBids contended batches")
  }
}
