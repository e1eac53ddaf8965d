package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off: print the 24-merge model trainAuto derives from the sf0.01
  * documents corpus, in Scala-literal form — the source of the frozen
  * [[graft.text.Bpe.stableModel]] (d16's fixed vocabulary). */
object PrintBpeModel {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val docs = graft.Tables(spark, dir).documents
    val m = graft.text.Bpe.trainAuto(docs, "text", numMerges = 24)
    println("merges = Seq(")
    m.merges.foreach { case (a, b) =>
      println(s"""  ("${a.replace("\\", "\\\\")}", "${b.replace("\\", "\\\\")}"),""")
    }
    println(")")
    println("alphabet = " + m.alphabet.sorted.map(s =>
      "\"" + s.replace("\\", "\\\\") + "\"").mkString("Seq(", ", ", ")"))
    spark.stop()
  }
}
