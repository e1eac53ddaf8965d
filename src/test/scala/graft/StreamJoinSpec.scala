package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStreams

class StreamJoinSpec extends AnyFunSuite {
  import SparkTestSession._

  test("stream-stream interval join matches the batch interval join") {
    val d = java.nio.file.Files.createTempDirectory("ss-join")
    java.nio.file.Files.copy(java.nio.file.Paths.get(s"$sf/events.parquet"),
      d.resolve("a.parquet"))
    val ckpt = java.nio.file.Files.createTempDirectory("ckpt").toString
    val q = EventStreams.clickPurchaseJoin(
        EventStreams.readEventStream(spark, d.toString))
      .writeStream.outputMode("append").format("memory").queryName("ssjoin")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("ssjoin")
      .select("purchase_id", "click_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    // batch twin over the same data
    val ev = Tables(spark, sf).events.withColumn("us", expr("ts div 1000"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("us").as("cus"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"), col("us").as("pus"))
    val batch = purchases.join(clicks, Seq("user_id"))
      .filter(col("cus") <= col("pus") && col("cus") >= col("pus") - 3600L * 1000000L)
      .select("purchase_id", "click_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(got == batch)
    assert(got.nonEmpty)
  }
}
