package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Stage-level breakdown of one registered query (dev): runs the query
  * once with a listener and prints per-stage wall, task-time sum, record
  * counts, and shuffle/spill bytes — the evidence for deciding WHICH
  * stage owns a scale wall before restructuring a plan.
  *
  *   sbt "runMain graft.tools.StageProbe /root/repo/testdata_sf10 e19_incr_neardup_adaptive"
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val name = args.lift(1).getOrElse("e19_incr_neardup_adaptive")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftExtensions.registerAll(spark)
    graft.store.Registries.materialize(spark, dir)
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(ev: SparkListenerStageCompleted): Unit = {
        val si = ev.stageInfo
        val m = si.taskMetrics
        val wall = for {
          s <- si.submissionTime; c <- si.completionTime
        } yield (c - s) / 1000.0
        stages.add(
          f"stage ${si.stageId}%4d ${wall.getOrElse(-1.0)}%8.1fs wall " +
            f"${m.executorRunTime / 1000.0}%9.1fs cpuSum " +
            f"in=${m.inputMetrics.recordsRead}%12d " +
            f"sRead=${m.shuffleReadMetrics.recordsRead}%12d " +
            f"sWrite=${m.shuffleWriteMetrics.recordsWritten}%12d " +
            f"spillMB=${(m.memoryBytesSpilled + m.diskBytesSpilled) / 1e6}%9.0f " +
            f"out=${m.outputMetrics.recordsWritten}%10d  [${si.name.takeWhile(_ != '\n')}]")
        ()
      }
    })
    val t0 = System.nanoTime()
    val n = graft.SparkEntry.queries(name)(spark, dir).count()
    val secs = (System.nanoTime() - t0) / 1e9
    Thread.sleep(2000) // let listener drain
    stages.forEach(s => println(s))
    println(f"TOTAL $name $secs%.1f s ($n rows)")
    spark.stop()
  }
}
