package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Exactly-once parquet appends for foreachBatch sinks — the idempotent
  * commit protocol the streaming twins' durable registries need under
  * crash/replay.
  *
  * Structured Streaming re-runs a failed micro-batch with the SAME
  * batchId (the offset log commits before execution), so a plain
  * `mode("append")` is at-least-once: a crash after the write but before
  * the checkpoint re-appends the batch — and worse, a flow whose LATER
  * stages read a registry its EARLIER replay already mutated recomputes
  * against poisoned state (measured: segment-dedup replay after a full
  * batch marks every segment "known" and appends garbage survivors).
  *
  * Protocol, per (sink dir, batchId):
  *  1. [[rollback]] on batch entry: delete this batch's tagged data files
  *     when no done-marker exists (a crashed partial append) — the
  *     registry is then exactly its pre-batch content before ANY reads.
  *  2. [[append]]: skip when the marker exists (the step already
  *     committed); otherwise write to a side staging dir, MOVE the part
  *     files in under a `b<id>-` name tag, then create the `_b<id>.done`
  *     marker (a single atomic create — the commit point). Underscore
  *     files are invisible to Spark readers.
  *
  * Every window: crash before the marker → rollback undoes the partial
  * files and the step re-runs on identical pre-batch state; crash after
  * → the step is skipped on replay. Recomputed-but-skipped stages are
  * safe because each flow orders its writes so a stage's CONTENT only
  * depends on registries whose this-batch delta lands in the same or a
  * later step. This is the same idea as Delta's txn-version dedup for
  * foreachBatch sinks, over plain parquet dirs.
  */
object BatchCommit {

  private def fsFor(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())

  private def markerPath(dir: String, batchId: Long) =
    new Path(dir, f"_b$batchId%06d.done")
  private[streaming] def filePrefix(batchId: Long) = f"b$batchId%06d-"

  def isDone(spark: SparkSession, dir: String, batchId: Long): Boolean =
    fsFor(spark, dir).exists(markerPath(dir, batchId))

  /** A WRITER-PRIVATE staging dir for (dir, batchId): the batch-id key
    * alone is not enough — two live writers mis-pointed at one registry
    * dir would share a staging path, and one could move the OTHER's
    * partially-committed staging files and claim them under its own
    * marker: a holed batch that passes the integrity check (every file
    * it moved survived — they were just never the whole batch). A
    * per-invocation nonce makes each append's staged content provably
    * its own complete write; [[sweepStaging]] clears abandoned nonces.
    * A crashed attempt's staging can only exist pre-claim (the staging
    * dir is deleted before the marker create), and streaming always
    * replays the failed batch — so the replaying [[append]]'s entry
    * sweep is the one cleanup point needed. */
  private def newStaging(dir: String, batchId: Long): Path =
    new Path(dir + f"__staging_b$batchId%06d_" +
      java.util.UUID.randomUUID().toString.substring(0, 8))

  /** Delete every staging dir any writer left for (dir, batchId) — a
    * crashed attempt's leftovers, or (two live writers) the other
    * flow's in-flight staging write, whose Spark job then fails LOUDLY
    * and retries; it can never silently lose rows because its commit
    * point is still the marker claim. Called at append entry, before
    * each staging write. */
  private def sweepStaging(fs: FileSystem, dir: String, batchId: Long): Unit = {
    val d = new Path(dir)
    val parent = d.getParent
    if (parent == null || !fs.exists(parent)) return
    val prefix = d.getName + f"__staging_b$batchId%06d"
    fs.listStatus(parent).foreach { st =>
      if (st.isDirectory && st.getPath.getName.startsWith(prefix)) {
        fs.delete(st.getPath, true); ()
      }
    }
  }

  /** Delete this batch's tagged data files when its marker is absent —
    * the entry-time undo of a crashed partial append. Idempotent. Also
    * sweeps ONE level of partition subdirs (`cell=3/…`) so the same undo
    * covers [[appendPartitioned]] sinks; flat registries have no
    * subdirs, so the recursion is free there. */
  def rollback(spark: SparkSession, dir: String, batchId: Long): Unit = {
    val fs = fsFor(spark, dir)
    val d = new Path(dir)
    if (!fs.exists(d) || fs.exists(markerPath(dir, batchId))) return
    val pre = filePrefix(batchId)
    fs.listStatus(d).foreach { st =>
      if (st.isFile && st.getPath.getName.startsWith(pre)) {
        fs.delete(st.getPath, false); ()
      } else if (st.isDirectory && st.getPath.getName.contains("=")) {
        fs.listStatus(st.getPath).foreach { sub =>
          if (sub.isFile && sub.getPath.getName.startsWith(pre)) {
            fs.delete(sub.getPath, false); ()
          }
        }
      }
    }
  }

  /** Exactly-once append of `df` into `dir` for `batchId` (see protocol
    * above). The caller must have [[rollback]]ed this (dir, batchId) at
    * batch entry, before reading any registry this write feeds.
    *
    * The marker create doubles as a PUT-IF-ABSENT CLAIM on (dir,
    * batchId): when two writers (two pipelines mis-pointed at one
    * registry dir — their independent checkpoints reuse the same batch
    * ids) race the same append, exactly one creates the marker; the
    * loser removes precisely the part files it moved in (part names are
    * write-UUID-unique, so the winner's files are untouched) and throws
    * [[java.util.ConcurrentModificationException]]. A loser that races
    * the other way — its [[rollback]] deleting the winner's not-yet-
    * committed moves — is caught by the post-claim integrity check: a
    * commit only stands if every file it moved survived to the marker,
    * otherwise the marker is withdrawn and the batch fails loudly for
    * replay. Concurrent flows therefore serialize per batch id or fail
    * loudly; they never commit a merged or holed batch. (A loser that
    * arrives AFTER the winner's marker skips like a self-replay — id-
    * based idempotence cannot tell foreign writers apart without a flow
    * identity, which is why one registry dir still wants one flow.) */
  def append(df: DataFrame, dir: String, batchId: Long): Unit = {
    val spark = df.sparkSession
    val fs = fsFor(spark, dir)
    if (fs.exists(markerPath(dir, batchId))) return
    sweepStaging(fs, dir, batchId)
    val staging = newStaging(dir, batchId)
    df.write.mode("overwrite").parquet(staging.toString)
    Failpoints.hit("commit:staged", dir)
    val d = new Path(dir)
    if (!fs.exists(d)) { fs.mkdirs(d); () }
    val pre = filePrefix(batchId)
    val moved = scala.collection.mutable.ArrayBuffer.empty[Path]
    fs.listStatus(staging).foreach { st =>
      val n = st.getPath.getName
      if (st.isFile && n.endsWith(".parquet")) {
        val target = new Path(d, pre + n)
        if (!fs.rename(st.getPath, target))
          throw new java.io.IOException(
            s"batch commit: move ${st.getPath} -> $dir failed")
        moved += target
        Failpoints.hit("commit:moved-one", dir)
      }
    }
    fs.delete(staging, true)
    claim(fs, dir, batchId, moved.toSeq)
  }

  /** Exactly-once append of a PARTITIONED `df` into `dir`: same protocol
    * as [[append]], but the staging write is `partitionBy(partitionCol)`
    * and each staged `col=value/part.parquet` moves into the matching
    * `dir/col=value/` subdir under the batch tag — the "append new days'
    * codes into the same cell dirs" layout [[graft.similarity.IvfPq]]
    * promises, kept partition-prunable for readers. ONE root done-marker
    * commits the whole batch across all partitions ([[rollback]] sweeps
    * the subdirs), so claim/skip stays atomic per (dir, batchId). */
  def appendPartitioned(df: DataFrame, dir: String, batchId: Long,
                        partitionCol: String): Unit = {
    val spark = df.sparkSession
    val fs = fsFor(spark, dir)
    if (fs.exists(markerPath(dir, batchId))) return
    sweepStaging(fs, dir, batchId)
    val staging = newStaging(dir, batchId)
    df.write.mode("overwrite").partitionBy(partitionCol)
      .parquet(staging.toString)
    Failpoints.hit("commit:staged", dir)
    val d = new Path(dir)
    if (!fs.exists(d)) { fs.mkdirs(d); () }
    val pre = filePrefix(batchId)
    val moved = scala.collection.mutable.ArrayBuffer.empty[Path]
    fs.listStatus(staging).foreach { part =>
      if (part.isDirectory && part.getPath.getName.startsWith(partitionCol + "=")) {
        val target = new Path(d, part.getPath.getName)
        if (!fs.exists(target)) { fs.mkdirs(target); () }
        fs.listStatus(part.getPath).foreach { st =>
          val n = st.getPath.getName
          if (st.isFile && n.endsWith(".parquet")) {
            val tf = new Path(target, pre + n)
            if (!fs.rename(st.getPath, tf))
              throw new java.io.IOException(
                s"batch commit: move ${st.getPath} -> $target failed")
            moved += tf
            Failpoints.hit("commit:moved-one", dir)
          }
        }
      }
    }
    fs.delete(staging, true)
    claim(fs, dir, batchId, moved.toSeq)
  }

  /** The commit point shared by [[append]]/[[appendPartitioned]]: create
    * the done-marker as a put-if-absent claim, then verify every moved
    * file survived to the claim. */
  private def claim(fs: FileSystem, dir: String, batchId: Long,
                    moved: Seq[Path]): Unit = {
    Failpoints.hit("commit:pre-marker", dir)
    val marker = markerPath(dir, batchId)
    // the commit point: a single atomic create = the put-if-absent claim.
    // Only an explicit ALREADY-EXISTS from the create decides the claim
    // was lost — that is the one signal that cannot mean our own create
    // half-succeeded. Any other IOException with the marker present is
    // ambiguous (on HDFS/object stores the create can succeed server-side
    // and still throw client-side on a timeout, in which case the standing
    // marker is OURS): deleting the moved files there would commit an
    // EMPTY batch under our own marker, so instead fail loudly WITHOUT
    // touching them — entry rollback replays the batch cleanly.
    val out =
      try fs.create(marker, false)
      catch {
        case e: org.apache.hadoop.fs.FileAlreadyExistsException =>
          moved.foreach { p => fs.delete(p, false); () }
          throw new java.util.ConcurrentModificationException(
            s"batch commit claim lost: $dir batch $batchId was committed by " +
              "a concurrent writer — one registry dir must have one flow", e)
        case e: java.io.IOException if fs.exists(marker) =>
          throw new java.io.IOException(
            s"batch commit: marker create for $dir batch $batchId failed " +
              "ambiguously with a marker present (ours or foreign — " +
              "undecidable); batch left for replay, moved files untouched", e)
      }
    Failpoints.hit("commit:marker-created", dir)
    // A close() failure must NOT be read as a lost claim (the old
    // single-expression form did, and deleted this batch's data files
    // while leaving our own marker behind — a committed EMPTY batch).
    // The marker is empty, so once create() returned the claim is ours
    // and the marker's existence alone is the commit; if the close
    // somehow left no marker behind, fail the batch loudly WITHOUT
    // touching the moved files — entry rollback undoes them on replay.
    try out.close()
    catch {
      case e: java.io.IOException if !fs.exists(marker) =>
        throw new java.io.IOException(
          s"batch commit: marker create for $dir batch $batchId did not " +
            "survive — batch left uncommitted for replay", e)
      case _: java.io.IOException => // marker exists: the commit stands
    }
    // post-claim integrity: a concurrent writer's entry rollback may have
    // deleted this append's moves before the claim landed — withdraw the
    // marker so the hole is never committed, and fail loudly for replay
    if (moved.exists(p => !fs.exists(p))) {
      fs.delete(marker, false)
      moved.foreach { p => fs.delete(p, false); () }
      throw new java.util.ConcurrentModificationException(
        s"batch commit integrity lost: $dir batch $batchId files were " +
          "rolled back by a concurrent writer before the claim landed")
    }
  }

  /** Read a registry dir that may not exist yet, may hold only markers
    * (all data rolled back), or may be mid-compaction-recovery: restores
    * a crashed [[graft.store.Registries.compact]] swap first, then falls
    * back to `empty` when no visible parquet data exists. */
  def readOr(spark: SparkSession, dir: String)(empty: => DataFrame): DataFrame = {
    graft.store.Registries.recover(spark, dir)
    val fs = fsFor(spark, dir)
    val d = new Path(dir)
    val hasData = fs.exists(d) && fs.listStatus(d).exists { st =>
      st.isFile && st.getPath.getName.endsWith(".parquet") &&
        !st.getPath.getName.startsWith("_") && !st.getPath.getName.startsWith(".")
    }
    if (hasData) spark.read.parquet(dir) else empty
  }

  private val MarkerName = """_b(\d+)\.done""".r

  /** Prune committed done-markers a replay can no longer consult. A
    * marker for batch `b` is only read by a replay OF batch `b`, and
    * Structured Streaming replays at most the newest batch this sink has
    * seen: the flow appending batch N at all proves batch N-1's
    * checkpoint commit completed, so every marker below this dir's
    * newest is already dead. We keep the top `keep` (default 2) marker
    * ids — one id of margin beyond that argument — and delete the rest.
    * Without pruning, a minutes-cadence flow gains one marker file per
    * micro-batch forever: unbounded small-file metadata growth in
    * exactly the dirs [[maybeCompact]] keeps bounded. Returns the number
    * of markers removed. */
  def pruneMarkers(spark: SparkSession, dir: String, keep: Int = 2): Int = {
    val fs = fsFor(spark, dir)
    val d = new Path(dir)
    if (!fs.exists(d)) return 0
    val ids = fs.listStatus(d).flatMap { st =>
      st.getPath.getName match {
        case MarkerName(id) if st.isFile => Some(id.toLong)
        case _ => None
      }
    }.sorted
    if (ids.length <= keep) return 0
    val dead = ids.dropRight(keep)
    dead.foreach { id => fs.delete(markerPath(dir, id), false); () }
    dead.length
  }

  /** Opportunistic registry maintenance: compact `dir` when its visible
    * data-file count exceeds `maxFiles` — the self-compaction the 50-drop
    * growth probe demanded (per-drop appends accumulate one small file
    * each; listing + footer + one task per file eventually dominates the
    * probe). Runs AFTER a batch's own writes; crash-safe because compact
    * uses the aside-swap + [[graft.store.Registries.recover]] on read.
    * Batch done-markers survive compaction ([[graft.store.Registries
    * .compact]] carries `_b*.done` files across the swap) so replay
    * skip/rollback decisions stay correct for the in-flight batch; dead
    * markers below the newest two batch ids are [[pruneMarkers pruned]]
    * here so TOTAL file count (data and markers) stays bounded.
    * `foldKeys` (delta-shaped registries only) additionally folds rows
    * to one per key — see [[graft.store.Registries.compact]]. */
  def maybeCompact(spark: SparkSession, dir: String, maxFiles: Int,
                   targetFiles: Int = 4, foldKeys: Seq[String] = Nil,
                   sortKeys: Seq[String] = Nil): Boolean = {
    val fs = fsFor(spark, dir)
    val d = new Path(dir)
    if (!fs.exists(d)) return false
    pruneMarkers(spark, dir)
    val n = fs.listStatus(d).count { st =>
      st.isFile && st.getPath.getName.endsWith(".parquet") &&
        !st.getPath.getName.startsWith("_") && !st.getPath.getName.startsWith(".")
    }
    if (n <= maxFiles) false
    else { graft.store.Registries.compact(spark, dir, targetFiles, foldKeys,
      sortKeys); true }
  }
}

/** Test seam: a hook invoked between a streaming twin's write steps so a
  * crash-recovery spec can kill the batch at every window. No-op in
  * production (the default). The second argument is a directory unique
  * to the run (a sink/registry dir), so a spec arming the global hook
  * kills only ITS OWN streams — suites run in parallel in one JVM. */
private[graft] object Failpoints {
  @volatile var hook: (String, String) => Unit = (_, _) => ()
  def hit(label: String, dir: String): Unit = hook(label, dir)
}
