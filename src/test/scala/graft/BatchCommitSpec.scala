package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{BatchCommit, Failpoints}

/** Protocol-level crash testing of the exactly-once batch-commit
  * protocol itself — no streaming machinery, just the (rollback, append)
  * cycle a foreachBatch replay performs, killed at every internal
  * window of `append` (after staging, after EACH file move, before the
  * marker) plus randomized multi-crash sequences. Complements
  * CrashRecoverySpec, which proves the same protocol end-to-end through
  * Spark's checkpoint replay. */
class BatchCommitSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def tmp() = java.nio.file.Files.createTempDirectory("bc").toString + "/r"

  private def batchDf(bid: Long) =
    (0 until 30).map(i => (bid * 100 + i, s"b$bid-$i")).toDF("id", "v")
      .repartition(3) // several part files → real mid-move windows

  private def content(dir: String): Set[(Long, String)] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p) || !fs.listStatus(p).exists(st =>
        st.isFile && st.getPath.getName.endsWith(".parquet") &&
          !st.getPath.getName.startsWith("_"))) Set.empty
    else spark.read.parquet(dir).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
  }

  /** One replay cycle: rollback then append — what a crashed micro-batch
    * does on restart. */
  private def cycle(dir: String, bid: Long): Unit = {
    BatchCommit.rollback(spark, dir, bid)
    BatchCommit.append(batchDf(bid), dir, bid)
  }

  private def withCrashAt(dir: String, label: String, nth: Int)(f: => Unit): Boolean = {
    val hits = new java.util.concurrent.atomic.AtomicInteger(0)
    Failpoints.hook = (l, d) =>
      if (l == label && d == dir && hits.incrementAndGet() == nth)
        throw new RuntimeException(s"crash at $label#$nth")
    try { f; false }
    catch { case e: RuntimeException if e.getMessage.startsWith("crash at") => true }
    finally { Failpoints.hook = (_, _) => () }
  }

  test("append killed at every internal window replays to exactly one copy") {
    // expected content after batches 0 and 1 commit cleanly
    val ref = tmp(); cycle(ref, 0); cycle(ref, 1)
    val want = content(ref)
    assert(want.size == 60)

    for (label <- Seq("commit:staged", "commit:moved-one", "commit:pre-marker",
                      "commit:marker-created");
         nth <- 1 to 3) {
      val dir = tmp()
      cycle(dir, 0) // batch 0 committed
      val crashed = withCrashAt(dir, label, nth) { cycle(dir, 1) }
      if (crashed) cycle(dir, 1) // the replay
      assert(content(dir) == want,
        s"crash at $label#$nth: replay diverged (crashed=$crashed)")
      assert(BatchCommit.isDone(spark, dir, 1L))
    }
  }

  test("randomized multi-crash sequences converge (seeded chaos sweep)") {
    val rnd = new scala.util.Random(20260814L)
    val labels = Seq("commit:staged", "commit:moved-one", "commit:pre-marker",
      "commit:marker-created")
    val ref = tmp(); (0L to 3L).foreach(cycle(ref, _))
    val want = content(ref)
    for (trial <- 0 until 5) {
      val dir = tmp()
      for (bid <- 0L to 3L) {
        // up to 3 crashes per batch at random windows before it commits
        var attempts = 0
        var done = false
        while (!done && attempts < 6) {
          attempts += 1
          val crash = rnd.nextInt(3) > 0 && attempts <= 3
          if (crash) {
            val l = labels(rnd.nextInt(labels.length))
            val n = 1 + rnd.nextInt(3)
            if (!withCrashAt(dir, l, n) { cycle(dir, bid) }) done = true
          } else { cycle(dir, bid); done = true }
        }
        assert(done, s"trial $trial batch $bid never committed")
      }
      assert(content(dir) == want, s"trial $trial diverged")
      val _ = trial
    }
  }

  test("a batch whose append crashed before ANY move leaves the dir clean") {
    val dir = tmp()
    cycle(dir, 0)
    val before = content(dir)
    assert(withCrashAt(dir, "commit:staged", 1) { cycle(dir, 1) })
    // no marker, no tagged files — rollback has nothing to do but the
    // registry must read exactly its pre-batch content
    BatchCommit.rollback(spark, dir, 1)
    assert(content(dir) == before)
    assert(!BatchCommit.isDone(spark, dir, 1L))
  }

  test("marker pruning keeps the top two ids and never breaks the in-flight batch") {
    val dir = tmp()
    (0L to 9L).foreach(cycle(dir, _))
    def markers(): Seq[String] = new java.io.File(dir).listFiles().toSeq
      .map(_.getName).filter(n => n.startsWith("_b") && n.endsWith(".done")).sorted
    assert(markers().size == 10)
    val pruned = BatchCommit.pruneMarkers(spark, dir)
    assert(pruned == 8, s"expected 8 pruned, got $pruned")
    assert(markers() == Seq("_b000008.done", "_b000009.done"))
    // the newest batch's skip decision survives pruning: a replay of
    // batch 9 is a no-op, content unchanged
    val want = content(dir)
    cycle(dir, 9)
    assert(content(dir) == want, "replay of the retained batch re-appended")
    // an in-flight batch 10 whose append crashed mid-move still rolls
    // back cleanly after pruning, then commits exactly once on replay
    assert(withCrashAt(dir, "commit:moved-one", 1) { cycle(dir, 10) })
    cycle(dir, 10)
    assert(content(dir).size == want.size + 30)
    assert(BatchCommit.isDone(spark, dir, 10L))
    // pruning is idempotent and keeps following the moving watermark
    BatchCommit.pruneMarkers(spark, dir)
    assert(markers() == Seq("_b000009.done", "_b000010.done"))
    assert(BatchCommit.pruneMarkers(spark, dir) == 0)
    // ids past the %06d format width prune by numeric order, not lexical
    BatchCommit.append(batchDf(3).limit(0), dir, 1234567L)
    BatchCommit.pruneMarkers(spark, dir)
    assert(markers() == Seq("_b000010.done", "_b1234567.done"))
  }

  /** Pause a concurrently-running append at its pre-marker window (the
    * first hit only, so the test's own appends pass through), returning
    * (reached, gate): await `reached`, do the racing work, then open
    * `gate`. */
  private def pauseFirstPreMarker(dir: String) = {
    val reached = new java.util.concurrent.CountDownLatch(1)
    val gate = new java.util.concurrent.CountDownLatch(1)
    val first = new java.util.concurrent.atomic.AtomicBoolean(true)
    Failpoints.hook = (l, d) =>
      if (l == "commit:pre-marker" && d == dir && first.getAndSet(false)) {
        reached.countDown(); gate.await()
      }
    (reached, gate)
  }

  test("two writers racing one (dir, batchId): the marker claim picks one winner") {
    val dir = tmp()
    val (reached, gate) = pauseFirstPreMarker(dir)
    try {
      val loserErr = new java.util.concurrent.atomic.AtomicReference[Throwable]()
      val loser = new Thread(() =>
        try BatchCommit.append(batchDf(0), dir, 0)
        catch { case e: Throwable => loserErr.set(e) })
      loser.start(); reached.await()
      // a second pipeline mis-pointed at the same registry commits the
      // same batch id first — different content, same claim
      val winnerRows = (100 until 130).map(i => (i.toLong, s"w-$i"))
      BatchCommit.append(winnerRows.toDF("id", "v").repartition(3), dir, 0)
      gate.countDown(); loser.join()
      assert(loserErr.get().isInstanceOf[java.util.ConcurrentModificationException],
        s"loser got ${loserErr.get()} instead of a loud claim failure")
      // never corrupt: the dir holds exactly the winner's batch — the
      // loser's already-moved part files were withdrawn with its claim
      assert(content(dir) == winnerRows.toSet)
      assert(BatchCommit.isDone(spark, dir, 0L))
    } finally { Failpoints.hook = (_, _) => () }
  }

  test("a concurrent entry-rollback eating in-flight moves fails the commit, never holes it") {
    val dir = tmp()
    cycle(dir, 0)
    val base = content(dir)
    val (reached, gate) = pauseFirstPreMarker(dir)
    try {
      val loserErr = new java.util.concurrent.atomic.AtomicReference[Throwable]()
      val writer = new Thread(() =>
        try BatchCommit.append(batchDf(1), dir, 1)
        catch { case e: Throwable => loserErr.set(e) })
      writer.start(); reached.await()
      // the other pipeline enters ITS batch 1 and rolls back the writer's
      // uncommitted moves — without the integrity check the writer would
      // then commit a marker over a holed batch
      BatchCommit.rollback(spark, dir, 1)
      gate.countDown(); writer.join()
      assert(loserErr.get().isInstanceOf[java.util.ConcurrentModificationException])
      assert(loserErr.get().getMessage.contains("integrity"))
      // the marker was withdrawn: nothing of batch 1 is committed…
      assert(!BatchCommit.isDone(spark, dir, 1L))
      assert(content(dir) == base)
    } finally { Failpoints.hook = (_, _) => () }
    // …and the failed batch replays to exactly one clean copy
    cycle(dir, 1)
    assert(content(dir).size == base.size + 30)
  }

  test("empty-batch append commits a marker and keeps readers working") {
    val dir = tmp()
    cycle(dir, 0)
    BatchCommit.append(batchDf(1).limit(0), dir, 1)
    assert(BatchCommit.isDone(spark, dir, 1L))
    assert(content(dir).size == 30)
    // replay of the empty batch skips
    BatchCommit.rollback(spark, dir, 1)
    BatchCommit.append(batchDf(1).limit(0), dir, 1)
    assert(content(dir).size == 30)
  }

  // ---- appendPartitioned: the same protocol over cell= partition dirs ----

  private def pbatchDf(bid: Long) =
    (0 until 30).map(i => (bid * 100 + i, i % 4, s"b$bid-$i"))
      .toDF("id", "cell", "v").repartition(3)

  private def pcycle(dir: String, bid: Long): Unit = {
    BatchCommit.rollback(spark, dir, bid)
    BatchCommit.appendPartitioned(pbatchDf(bid), dir, bid, "cell")
  }

  private def pcontent(dir: String): Set[(Long, Int, String)] = {
    val root = new java.io.File(dir)
    val hasData = root.exists() && root.listFiles().exists(d =>
      d.isDirectory && d.getName.startsWith("cell=") &&
        d.listFiles().exists(_.getName.endsWith(".parquet")))
    if (!hasData) Set.empty
    else spark.read.parquet(dir)
      .select("id", "cell", "v").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
  }

  test("partitioned append killed at every internal window replays to " +
       "exactly one copy, cell layout intact") {
    val ref = tmp(); pcycle(ref, 0); pcycle(ref, 1)
    val want = pcontent(ref)
    assert(want.size == 60)
    for (label <- Seq("commit:staged", "commit:moved-one", "commit:pre-marker",
                      "commit:marker-created");
         nth <- 1 to 3) {
      val dir = tmp()
      pcycle(dir, 0)
      val crashed = withCrashAt(dir, label, nth) { pcycle(dir, 1) }
      if (crashed) pcycle(dir, 1)
      assert(pcontent(dir) == want,
        s"crash at $label#$nth: replay diverged (crashed=$crashed)")
      assert(BatchCommit.isDone(spark, dir, 1L))
      // data landed INSIDE the cell dirs, nothing loose at the root
      assert(!new java.io.File(dir).listFiles()
        .exists(f => f.isFile && f.getName.endsWith(".parquet")))
    }
  }

  test("two writers racing one partitioned (dir, batchId): one winner, " +
       "loser's per-cell moves withdrawn") {
    val dir = tmp()
    val (reached, gate) = pauseFirstPreMarker(dir)
    try {
      val loserErr = new java.util.concurrent.atomic.AtomicReference[Throwable]()
      val loser = new Thread(() =>
        try BatchCommit.appendPartitioned(pbatchDf(0), dir, 0, "cell")
        catch { case e: Throwable => loserErr.set(e) })
      loser.start(); reached.await()
      val winnerRows = (100 until 130).map(i => (i.toLong, i % 4, s"w-$i"))
      BatchCommit.appendPartitioned(
        winnerRows.toDF("id", "cell", "v").repartition(3), dir, 0, "cell")
      gate.countDown(); loser.join()
      assert(loserErr.get().isInstanceOf[java.util.ConcurrentModificationException],
        s"loser got ${loserErr.get()} instead of a loud claim failure")
      assert(pcontent(dir) == winnerRows.toSet)
      assert(BatchCommit.isDone(spark, dir, 0L))
    } finally { Failpoints.hook = (_, _) => () }
  }
}
