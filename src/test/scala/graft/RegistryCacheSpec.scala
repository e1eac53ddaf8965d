package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.store.Registries

/** Garbage collection of the durable registry cache: entries whose
  * source dir died are reaped, live entries and young stagings are not.
  * Without this, every test JVM's temp fixtures would leave immortal
  * registry entries under the (cross-session) cache root.
  */
class RegistryCacheSpec extends AnyFunSuite {
  import SparkTestSession._

  private def writeDocs(dir: String): Unit =
    spark.range(0, 20)
      .select(col("id").as("doc_id"),
        concat(lit("s"), col("id") % 3).as("source"),
        (col("id") * 7 + 11).as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

  private def rmrf(p: String): Unit = {
    import scala.jdk.CollectionConverters._
    val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(p))
    try walk.iterator().asScala.toSeq.reverse
      .foreach(java.nio.file.Files.deleteIfExists(_))
    finally walk.close()
  }

  test("entries of dead source dirs are reaped; live entries and young " +
       "stagings survive") {
    val dead = java.nio.file.Files.createTempDirectory("cache-dead").toString
    val live = java.nio.file.Files.createTempDirectory("cache-live").toString
    writeDocs(dead); writeDocs(live)
    Registries.sourceCensus(spark, dead).head(1)
    Registries.sourceCensus(spark, live).head(1)
    val deadEntry = new java.io.File(Registries.cacheEntryDir(dead))
    val liveEntry = new java.io.File(Registries.cacheEntryDir(live))
    assert(deadEntry.isDirectory && liveEntry.isDirectory)
    assert(new String(java.nio.file.Files.readAllBytes(
      deadEntry.toPath.resolve("_source"))).trim == dead,
      "entry does not record its source dir")
    // a young staging (a concurrent JVM's in-flight build) must survive
    val young = new java.io.File(liveEntry, "whatever.staging-ab12cd34")
    young.mkdirs()
    rmrf(dead)
    Registries.reapDeadEntries()
    assert(!deadEntry.exists(), "dead-source entry survived the reap")
    assert(liveEntry.isDirectory, "live entry was reaped")
    assert(young.isDirectory, "young staging was reaped")
    // an aged staging (a crashed build) is cleared
    assert(young.setLastModified(
      System.currentTimeMillis() - 25L * 3600 * 1000))
    Registries.reapDeadEntries()
    assert(!young.exists(), "day-old crashed staging survived the reap")
    assert(liveEntry.isDirectory)
  }

  test("size cap: LRU eviction reaps the coldest entries, never one in " +
       "recent use") {
    val cold = java.nio.file.Files.createTempDirectory("cache-cold").toString
    val warm = java.nio.file.Files.createTempDirectory("cache-warm").toString
    writeDocs(cold); writeDocs(warm)
    Registries.sourceCensus(spark, cold).head(1)
    Registries.sourceCensus(spark, warm).head(1)
    val coldEntry = new java.io.File(Registries.cacheEntryDir(cold))
    val warmEntry = new java.io.File(Registries.cacheEntryDir(warm))
    assert(coldEntry.isDirectory && warmEntry.isDirectory)
    assert(new java.io.File(coldEntry, "_used").isFile,
      "materialize did not stamp the LRU touch file")
    // both entries recent → over-cap but everything is inside the
    // protection window: nothing may be evicted (a twin JVM could be
    // mid-run on either)
    Registries.enforceCacheCap(maxBytes = 1L)
    assert(coldEntry.isDirectory && warmEntry.isDirectory,
      "cap eviction removed a recently-used entry")
    // age the cold entry's stamp past the protection window → it is the
    // LRU victim; the warm entry survives
    assert(new java.io.File(coldEntry, "_used").setLastModified(
      System.currentTimeMillis() - 2L * 3600 * 1000))
    Registries.enforceCacheCap(maxBytes = 1L)
    assert(!coldEntry.exists(), "cold entry survived an over-cap sweep")
    assert(warmEntry.isDirectory, "warm entry evicted despite recent use")
    // a re-read after eviction rebuilds through the normal staging-rename
    // path (the race machinery the verdict's criterion names)
    Registries.sourceCensus(spark, warm).head(1)
  }
}
