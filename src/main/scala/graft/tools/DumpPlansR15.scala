package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dumps the formatted physical plan of every registered query (or a
  * named subset) to plans/r15/<query>_<tag>.txt — the optimization-round
  * evidence trail. Dev tool, not driver contract.
  *
  *   sbt "runMain graft.tools.DumpPlansR15 before [q01_pooling_census ...]"
  */
object DumpPlansR15 {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: DumpPlansR15 <tag> [query...]")
    val tag = args.head
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", 1 << 21)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftExtensions.registerAll(spark)
    graft.meta.MetadataStar.materialize(spark, dir)
    graft.store.Registries.materialize(spark, dir)
    val names = if (args.length > 1) args.drop(1).toSeq
                else graft.SparkEntry.queries.keys.toSeq.sorted
    val out = Paths.get("plans/r15")
    Files.createDirectories(out)
    names.foreach { n =>
      try {
        val df = graft.SparkEntry.queries(n)(spark, dir)
        val s = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(out.resolve(s"${n}_$tag.txt"), s)
        println(s"[plans] $n ok")
      } catch { case e: Throwable =>
        println(s"[plans] $n FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
