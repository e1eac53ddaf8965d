package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.store.Registries

/** Registry compaction is content-preserving and actually reduces the
  * file count an appended registry accumulates. */
class RegistryCompactSpec extends AnyFunSuite {
  import SparkTestSession._

  test("compact preserves content and collapses per-drop append files") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("reg-compact").toString + "/r"
    for (drop <- 0 until 8)
      (0 until 10).map(i => (drop * 10L + i, s"v$drop-$i")).toDF("id", "v")
        .repartition(2).write.mode("append").parquet(dir)
    def files() = new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".parquet"))
    val before = spark.read.parquet(dir).collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(files() >= 16, s"append staging produced only ${files()} files")
    Registries.compact(spark, dir, numFiles = 3)
    assert(files() == 3, s"expected 3 files after compaction, got ${files()}")
    val after = spark.read.parquet(dir).collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(after == before, "compaction changed registry content")
    // compacting a missing dir is a no-op, not an error
    Registries.compact(spark, dir + "_missing")
  }
}
