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
  */
object Calib {
  /** Quiet-state all-cores spin on this box (r8-r12 quiet runs:
    * 0.115-0.124 s at single-thread floor 0.105-0.109). */
  val MtRef = 0.120

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
