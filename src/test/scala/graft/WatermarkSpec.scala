package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStreams

/** Watermark semantics: an event arriving further behind the stream's
  * maximum event time than the 2-hour watermark must be excluded from its
  * (already finalized) window. */
class WatermarkSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val H = 3600L * 1000 * 1000 * 1000 // one hour in nanos
  private val T0S = 472222L * 3600L          // hour-aligned epoch seconds
  private val T0 = T0S * 1000000000L         // …in nanos

  private def writeBatch(dir: java.nio.file.Path, name: String,
                         rows: Seq[(Long, Long)]): Unit = {
    // (event_id, ts_nanos) with fixed user/type/value/props. The file
    // stream source wants flat files: write to a scratch dir, move the
    // part file into place under a stable name.
    val scratch = java.nio.file.Files.createTempDirectory("wm-scratch")
    rows.map { case (id, ts) => (id, ts, 1L, "x", 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      // match the data drops' current layout: ts is timestamp[us] no-zone
      .withColumn("ts", expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)"))
      .coalesce(1).write.mode("overwrite").parquet(scratch.toString)
    val part = java.nio.file.Files.list(scratch).toArray
      .map(_.asInstanceOf[java.nio.file.Path])
      .find(_.getFileName.toString.endsWith(".parquet")).get
    java.nio.file.Files.move(part, dir.resolve(s"$name.parquet"))
  }

  test("late events behind the watermark are dropped from closed windows") {
    val dir = java.nio.file.Files.createTempDirectory("late-events")
    val ckpt = java.nio.file.Files.createTempDirectory("ckpt").toString
    // batch 1: three events in hour 0, one in hour 1
    writeBatch(dir, "b1", Seq((1L, T0 + 1), (2L, T0 + 2), (3L, T0 + 3), (4L, T0 + H + 1)))
    val stream = EventStreams.hourlyCounts(EventStreams.readEventStream(spark, dir.toString))
    val q = stream.writeStream
      .outputMode("append").format("memory").queryName("late_wm")
      .option("checkpointLocation", ckpt).start()
    q.processAllAvailable()
    // batch 2: an event at +6h — after this batch the watermark advances to
    // +4h, closing (and emitting) the hour-0 and hour-1 windows
    writeBatch(dir, "b2", Seq((6L, T0 + 6 * H)))
    q.processAllAvailable()
    // batch 3: a genuinely LATE event for hour 0 (behind the +4h watermark)
    writeBatch(dir, "b3", Seq((5L, T0 + 10)))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("late_wm").collect()
      .map(r => r.getAs[Long]("hour_ep") -> r.getAs[Long]("n")).toMap
    val hour0 = T0S
    // the late event (id 5) must NOT be counted: hour-0 window stays at 3
    assert(rows(hour0) == 3L, s"late event leaked into a closed window: $rows")
    assert(rows(hour0 + 3600) == 1L)
  }
}
