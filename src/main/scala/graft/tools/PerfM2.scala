package graft.tools

/** Raw codec-cost probe (no Spark): how long does the m11 render+hash
  * pipeline take single-threaded and with a local thread pool? Separates
  * codec CPU cost from Spark parallelization questions. Dev harness. */
object PerfM2 {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(5000)
    val seeds = (0 until n).map(i => (i.toLong, 100L + i % 400))
    def work(id: Long, len: Long): Int = {
      val w = (len % 13).toInt + 4
      val h = ((len / 13) % 11).toInt + 4
      val nf = (len % 5).toInt + 2
      graft.multimodal.Multimodal.MjpegAvi.frameHashes(id,
        graft.multimodal.Multimodal.MjpegAvi.renderAvi(len, nf, w, h)).size
    }
    // warm
    seeds.take(200).foreach { case (a, b) => work(a, b) }
    var t0 = System.nanoTime()
    var acc = 0L
    seeds.foreach { case (a, b) => acc += work(a, b) }
    println(f"single-thread: ${(System.nanoTime() - t0) / 1e9}%.3f s (frames=$acc)")
    t0 = System.nanoTime()
    val acc2 = new java.util.concurrent.atomic.AtomicLong()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(32)
    seeds.grouped(seeds.size / 32 + 1).foreach { chunk =>
      pool.submit(new Runnable {
        def run(): Unit = chunk.foreach { case (a, b) => acc2.addAndGet(work(a, b).toLong) }
      })
    }
    pool.shutdown()
    pool.awaitTermination(10, java.util.concurrent.TimeUnit.MINUTES)
    println(f"32-thread:     ${(System.nanoTime() - t0) / 1e9}%.3f s (frames=${acc2.get})")
  }
}
