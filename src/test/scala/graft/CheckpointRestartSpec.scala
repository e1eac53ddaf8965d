package graft

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStreams

/** Kill-and-restart-from-checkpoint for the surfaces that ride SPARK'S
  * OWN state store (windowed agg, mapGroupsWithState sessionization,
  * flatMapGroupsWithState as-of, stream-stream interval join). The
  * foreachBatch flows have their failpoint crash matrix
  * (CrashRecoverySpec); these surfaces have no graft-side persistence to
  * fail — what needs pinning is the WIRING: that the watermark/output-
  * mode/state choices survive a mid-stream stop and a restart from the
  * checkpoint, converging to exactly the uncrashed result.
  *
  * Shape: the same time-ordered three-file drop dir is run (a) uncrashed
  * in one AvailableNow pass, (b) one-file-per-trigger, hard-stopped
  * after the first committed micro-batch, then restarted from the same
  * checkpoint to completion. Equality of (a) and (b) pins BOTH restart
  * recovery and micro-batch-boundary invariance. Output is accumulated
  * with each surface's delivery semantics (append = set, update = upsert
  * by key, complete = replace) so a replayed uncommitted batch — the
  * kill can land mid-batch — must re-emit identically to pass. */
class CheckpointRestartSpec extends AnyFunSuite {
  import SparkTestSession._

  /** Three single-file drops, globally time-ordered (the file source's
    * delivery contract for the as-of stream), written in order so file
    * mod-times and names both give the same processing order. */
  private lazy val dropDir: String = {
    val d = java.nio.file.Files.createTempDirectory("ckpt-restart-drops")
    val events = spark.read.parquet(s"$sf/events.parquet")
      .sort(col("ts").asc_nulls_first)
    val n = events.count()
    val rows = events.collect()
    val cuts = Seq(0L, n / 3, 2 * n / 3, n).map(_.toInt)
    for (i <- 0 until 3) {
      val slice = rows.slice(cuts(i), cuts(i + 1))
      val tmp = java.nio.file.Files.createTempDirectory("drop-part")
      spark.createDataFrame(
          spark.sparkContext.parallelize(slice.toIndexedSeq, 1), events.schema)
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = java.nio.file.Files.list(tmp).toArray.map(_.toString)
        .filter(_.endsWith(".parquet")).head
      java.nio.file.Files.move(java.nio.file.Paths.get(part),
        java.nio.file.Paths.get(d.toString, f"events-$i%03d.parquet"))
    }
    d.toString
  }

  private type Acc = TrieMap[String, String]

  private case class Surface(name: String, mode: String,
                             build: DataFrame => DataFrame,
                             fold: (Acc, Array[org.apache.spark.sql.Row]) => Unit)

  private def upsertByFirstCol(acc: Acc, rows: Array[org.apache.spark.sql.Row]): Unit =
    rows.foreach(r => acc.put(String.valueOf(r.get(0)), r.mkString("|")))
  private def addToSet(acc: Acc, rows: Array[org.apache.spark.sql.Row]): Unit =
    rows.foreach(r => acc.put(r.mkString("|"), ""))
  private def replaceAll(acc: Acc, rows: Array[org.apache.spark.sql.Row]): Unit = {
    acc.clear(); addToSet(acc, rows)
  }

  private val surfaces = Seq(
    Surface("windowed agg (complete)", "complete",
      df => EventStreams.hourlyCounts(df), replaceAll),
    Surface("sessionization (update)", "update",
      df => EventStreams.sessionize(spark, df, 30L * 60 * 1000 * 1000).toDF(),
      upsertByFirstCol),
    Surface("as-of stream (append)", "append",
      df => EventStreams.asofStream(spark, df).toDF(), addToSet),
    Surface("interval join (append)", "append",
      df => EventStreams.clickPurchaseJoin(df), addToSet))

  /** One streaming pass; stopEarly hard-stops after the first committed
    * micro-batch (the restart then owns whatever was in flight). */
  private def runPass(s: Surface, acc: Acc, ckpt: String,
                      maxFiles: Option[Int], stopEarly: Boolean): Unit = {
    val q = s.build(EventStreams.readEventStream(spark, dropDir, maxFiles))
      .writeStream
      .outputMode(s.mode)
      .foreachBatch { (b: DataFrame, _: Long) => s.fold(acc, b.collect()) }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    if (stopEarly) {
      val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
      while (q.isActive && System.nanoTime() < deadline &&
             !q.recentProgress.exists(_.numInputRows > 0)) Thread.sleep(20)
      q.stop()
    }
    q.awaitTermination()
  }

  for (s <- surfaces) test(s"${s.name}: mid-stream stop + checkpoint restart converges") {
    val uncrashed: Acc = TrieMap.empty
    runPass(s, uncrashed, java.nio.file.Files.createTempDirectory("ck-ref").toString,
      maxFiles = None, stopEarly = false)
    assert(uncrashed.nonEmpty, s"${s.name}: reference run produced nothing")

    val crashed: Acc = TrieMap.empty
    val ckpt = java.nio.file.Files.createTempDirectory("ck-crash").toString
    runPass(s, crashed, ckpt, maxFiles = Some(1), stopEarly = true)
    // the stop must land after the first commit (the poll guarantees it)
    // and is EXPECTED to land before the last — diagnose a too-fast box
    // where the kill degenerated into a completed run, rather than fail
    val committed = java.nio.file.Files.list(
      java.nio.file.Paths.get(ckpt, "commits")).count()
    assert(committed >= 1, s"${s.name}: stop landed before any commit")
    if (committed >= 3)
      info(s"${s.name}: all batches committed before the stop — " +
        "restart exercised as a no-op this run")
    runPass(s, crashed, ckpt, maxFiles = Some(1), stopEarly = false)

    val (c, u) = (crashed.readOnlySnapshot().toMap, uncrashed.readOnlySnapshot().toMap)
    assert(c == u,
      s"${s.name}: restart diverged — only-crashed=${(c.keySet -- u.keySet).take(3)} " +
        s"only-uncrashed=${(u.keySet -- c.keySet).take(3)}")
  }
}
