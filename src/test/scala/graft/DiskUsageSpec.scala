package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.DiskUsage

class DiskUsageSpec extends AnyFunSuite {
  import SparkTestSession._

  test("capacities reports sane numbers for real mounts") {
    val df = DiskUsage.capacities(spark, Seq("/tmp", "/root"))
    val rows = df.collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      assert(r.getAs[Long]("total_bytes") > 0)
      assert(r.getAs[Long]("used_bytes") >= 0)
    }
  }

  test("tree sizes aggregate per top-level child without reading content") {
    val d = java.nio.file.Files.createTempDirectory("du")
    java.nio.file.Files.createDirectories(d.resolve("sub1"))
    java.nio.file.Files.createDirectories(d.resolve("sub2"))
    java.nio.file.Files.write(d.resolve("sub1/a.bin"), new Array[Byte](1000))
    java.nio.file.Files.write(d.resolve("sub1/b.bin"), new Array[Byte](500))
    java.nio.file.Files.write(d.resolve("sub2/c.bin"), new Array[Byte](42))
    val got = DiskUsage.treeSizes(spark, d.toString).collect()
      .map(r => r.getAs[String]("top") -> ((r.getAs[Long]("bytes"), r.getAs[Long]("n_files")))).toMap
    assert(got("sub1") == ((1500L, 2L)))
    assert(got("sub2") == ((42L, 1L)))
  }
}
