package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStreams

class EventStreamsSpec extends AnyFunSuite {
  import SparkTestSession._

  // File stream sources need a directory: stage the events parquet file
  // into one (this is also the real deployment shape — a drop directory).
  private lazy val streamDir: String = {
    val d = java.nio.file.Files.createTempDirectory("events-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      d.resolve("events-000.parquet"))
    d.toString
  }

  test("streaming hourly window converges to the batch oracle result") {
    val src = streamDir
    val stream = EventStreams.hourlyCounts(EventStreams.readEventStream(spark, src))
    val ckpt = java.nio.file.Files.createTempDirectory("ckpt").toString
    val q = stream.writeStream
      .outputMode(OutputMode.Complete())
      .format("memory").queryName("hourly")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.table("hourly")
      .select("hour_ep", "event_type", "n", "v").collect()
      .map(r => (r.getLong(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    val batch = SparkEntry.queries("q23_events_hourly")(spark, sf).collect()
      .map(r => (r.getAs[Long]("hour_ep"), r.getAs[String]("event_type")) ->
        ((r.getAs[Long]("n"), r.getAs[Double]("v")))).toMap
    assert(got == batch)
  }

  test("stateful sessionization counts events and splits on gaps") {
    val sessions = EventStreams.sessionize(spark,
      EventStreams.readEventStream(spark, streamDir),
      gapUs = 30L * 60 * 1000 * 1000)
    val ckpt = java.nio.file.Files.createTempDirectory("ckpt").toString
    val q = sessions.toDF().writeStream
      .outputMode(OutputMode.Update())
      .format("memory").queryName("sessions")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.table("sessions").collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("n_events"), r.getAs[Long]("n_sessions")))).toMap
    // totals must match the batch per-user census
    val batch = Tables(spark, sf).events.groupBy("user_id")
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("n")).toMap
    assert(got.view.mapValues(_._1).toMap == batch)
    assert(got.values.forall { case (n, s) => s >= 1 && s <= n })
    // with a 30-minute gap over sparse synthetic events, some user must
    // have more than one session
    assert(got.values.exists(_._2 > 1))

    // full batch-twin convergence: the stateful stream's per-user session
    // count equals the q51 batch operator's (ops.Sessionize, oracle-backed)
    val batchSessions = graft.ops.Sessionize.sessions(
        Tables(spark, sf).events.withColumn("us", expr("ts div 1000")),
        "user_id", "us", "event_id", 30L * 60 * 1000 * 1000)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions")).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("n_sessions")).toMap
    assert(got.view.mapValues(_._2).toMap == batchSessions,
      "streaming session counts diverge from the batch sessionizer")
  }
}
