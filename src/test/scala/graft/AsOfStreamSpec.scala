package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.AsOfJoin
import graft.streaming.EventStreams

/** The streaming as-of join must converge to the batch operator's result
  * on an in-order replay of the same events. */
class AsOfStreamSpec extends AnyFunSuite {
  import SparkTestSession._

  test("streaming as-of join equals AsOfJoin.backward on replay") {
    val d = java.nio.file.Files.createTempDirectory("asof-stream")
    java.nio.file.Files.copy(java.nio.file.Paths.get(s"$sf/events.parquet"),
      d.resolve("a.parquet"))
    val ckpt = java.nio.file.Files.createTempDirectory("asof-ckpt").toString
    val q = EventStreams.asofStream(spark,
        EventStreams.readEventStream(spark, d.toString))
      .writeStream.outputMode("append").format("memory").queryName("asof")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("asof")
      .select("event_id", "c_us").collect()
      .map(r => (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Long]))).toMap

    val ev = Tables(spark, sf).events
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), expr("ts div 1000").as("p_us"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), expr("ts div 1000").as("c_us"))
    val batch = AsOfJoin.backward(purchases, clicks, Seq("user_id"), "p_us", "c_us")
      .select("event_id", "c_us").collect()
      .map(r => (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Long]))).toMap

    assert(got == batch)
    assert(got.nonEmpty && got.values.exists(_.isDefined) && got.values.exists(_.isEmpty))
  }
}
