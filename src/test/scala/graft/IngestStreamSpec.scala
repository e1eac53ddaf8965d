package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.store.MetadataStore
import graft.streaming.EventStreams

class IngestStreamSpec extends AnyFunSuite {
  import SparkTestSession._

  test("streamed micro-batches merge idempotently into the store") {
    val dropDir = java.nio.file.Files.createTempDirectory("drops")
    val ckpt = java.nio.file.Files.createTempDirectory("ckpt").toString
    val store = new MetadataStore(spark,
      java.nio.file.Files.createTempDirectory("st").toString)
    java.nio.file.Files.copy(java.nio.file.Paths.get(s"$sf/events.parquet"),
      dropDir.resolve("a.parquet"))

    def runOnce(): Unit = {
      val q = EventStreams.ingestStream(
        EventStreams.readEventStream(spark, dropDir.toString),
        store, "events", Seq("event_id"), ckpt)
      q.awaitTermination()
    }
    runOnce()
    val n1 = store.read("events").count()
    assert(n1 == Tables(spark, sf).events.count())

    // same file re-delivered under a new name + restart: no duplicates
    java.nio.file.Files.copy(java.nio.file.Paths.get(s"$sf/events.parquet"),
      dropDir.resolve("b.parquet"))
    runOnce()
    assert(store.read("events").count() == n1)
  }
}
