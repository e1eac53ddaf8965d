package graft

/** Contention probes shared by the bench and soak harnesses.
  *
  * `spin` is a fixed single-thread CPU-bound loop (~100 ms quiet): it
  * detects preemption of THIS thread. `spinMt` runs the same loop on
  * every core at once: its wall time exceeds the single-thread floor
  * exactly when the cores don't deliver in parallel (host-level steal,
  * SMT oversubscription, memory-bandwidth pressure). The two are
  * independent signals — r12's driver run passed every single-thread
  * check while a co-tenant had taken half the box's parallel
  * throughput (spinMt 1.93x its quiet reference), which is exactly the
  * regime that crushes CPU-parallel queries and leaves sub-second ones
  * unscathed. Any artifact of record should carry BOTH.
  *
  * The QUIET REFERENCE the contended predicate compares against is
  * MEASURED, not compiled: every harness run folds its observed mt
  * samples into a per-box record ([[recordMtSamples]] — rolling window
  * of per-session minima with timestamps), and [[loadMtRef]] serves the
  * window's min with provenance. A compiled constant was calibrated to
  * one host's core count and SMT config (the r13 hole: 0.120 s is THIS
  * box's quiet spin; on other hardware the 1.5x/2x thresholds misfire
  * in either direction). A fresh box with no record falls back to
  * [[FallbackMtRef]] and the artifact says so; a box that permanently
  * slows (hardware change, new co-tenant baseline) ages its old fast
  * sessions out of the window instead of flagging contended forever.
  */
object Calib {
  /** Conservative fallback for a box with no recorded history (this
    * class of host measured 0.115-0.124 s quiet across r8-r12). */
  val FallbackMtRef = 0.120

  /** Sessions kept in the rolling window: long enough that one noisy
    * fortnight cannot raise the floor, short enough that a genuinely
    * slower box converges to its new floor. */
  val RefWindowSessions = 10

  /** The record lives beside the durable registry cache — per-box,
    * survives JVMs, dies with a clean (falling back conservatively). */
  def refPath: String = sys.env.getOrElse("GRAFT_REGISTRY_CACHE",
    "target/graft_registry_cache") + "/calib_mt_ref.json"

  private val SessionRe =
    """\{"t":(\d+),"mt":([0-9.eE+-]+)\}""".r

  private def readSessions(path: String): Seq[(Long, Double)] =
    try {
      val p = java.nio.file.Paths.get(path)
      if (!java.nio.file.Files.isRegularFile(p)) Nil
      else SessionRe.findAllMatchIn(new String(
          java.nio.file.Files.readAllBytes(p),
          java.nio.charset.StandardCharsets.UTF_8))
        .map(m => (m.group(1).toLong, m.group(2).toDouble)).toSeq
        .filter { case (_, v) => v > 0.01 && v < 10.0 } // sanity: a spin is ~0.1 s
    } catch { case scala.util.control.NonFatal(_) => Nil }

  /** The box's quiet all-cores reference and its provenance tag:
    * ("measured", min over the recorded session window) when a record
    * exists, ("fallback", [[FallbackMtRef]]) on a fresh box or an
    * unreadable record. */
  def loadMtRef(path: String = refPath): (Double, String) = {
    val sessions = readSessions(path)
    if (sessions.isEmpty) (FallbackMtRef, "fallback")
    else (sessions.map(_._2).min, s"measured(n=${sessions.size})")
  }

  /** Fold a session's observed mt samples into the per-box record: one
    * entry per session (the session's MIN — a contended session records
    * high and simply never becomes the window min), newest
    * [[RefWindowSessions]] kept. Atomic tmp+rename publish; failures are
    * swallowed (the record is an optimization over the fallback, never
    * load-bearing for correctness). */
  def recordMtSamples(samples: Seq[Double], path: String = refPath): Unit =
    if (samples.nonEmpty) try {
      val p = java.nio.file.Paths.get(path)
      if (p.getParent != null) {
        java.nio.file.Files.createDirectories(p.getParent); ()
      }
      val sessions = (readSessions(path) :+
        ((System.currentTimeMillis(), samples.min)))
        .sortBy(_._1).takeRight(RefWindowSessions)
      val body = sessions
        .map { case (t, v) => s"""{"t":$t,"mt":${f"$v%.4f"}}""" }
        .mkString(",")
      val json =
        s"""{"mt_ref":${f"${sessions.map(_._2).min}%.4f"},"sessions":[$body]}"""
      val tmp = java.nio.file.Paths.get(
        path + ".tmp-" + java.util.UUID.randomUUID().toString.take(8))
      java.nio.file.Files.write(tmp,
        (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      try {
        java.nio.file.Files.move(tmp, p,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        ()
      } catch { case scala.util.control.NonFatal(_) =>
        java.nio.file.Files.deleteIfExists(tmp); ()
      }
    } catch { case scala.util.control.NonFatal(_) => () }

  def spin(): Double = {
    val t0 = System.nanoTime()
    var x = 0L; var i = 0
    while (i < 300000000) { x += i * 2654435761L; i += 1 }
    if (x == 42) print("") // keep the loop alive past JIT DCE
    (System.nanoTime() - t0) / 1e9
  }

  def spinMt(): Double = {
    val n = Runtime.getRuntime.availableProcessors()
    val t0 = System.nanoTime()
    val threads = (1 to n).map { _ =>
      val t = new Thread(() => {
        var x = 0L; var i = 0
        while (i < 300000000) { x += i * 2654435761L; i += 1 }
        if (x == 42) print("")
      })
      t.start(); t
    }
    threads.foreach(_.join())
    (System.nanoTime() - t0) / 1e9
  }
}
