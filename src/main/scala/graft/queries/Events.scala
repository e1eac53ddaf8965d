package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Exact

/** Batch queries over the `events` stream table.
  *
  * Time convention: events.ts is nanosecond-precision parquet, which Spark 4
  * refuses natively ([PARQUET_TYPE_ILLEGAL]) and DuckDB silently truncates
  * to µs. [[Tables.events]] reads it via
  * `spark.sql.legacy.parquet.nanosAsLong`, and all derived times here are
  * integer microseconds (`ts div 1000` ≡ DuckDB `epoch_us(ts)`), so both
  * engines agree exactly with zero float risk.
  *
  * These are the batch twins of the Structured Streaming jobs in
  * [[graft.streaming]] — same logical aggregation, so the oracle validates
  * the streaming semantics too (a watermarked streaming run of the same
  * window agg must converge to this result).
  */
object Events {

  /** Tumbling 1-hour window aggregation per event type. */
  def hourlyWindow(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).events
      .withColumn("hour_ep", expr("((ts div 1000) div 3600000000) * 3600"))
      .groupBy("hour_ep", "event_type")
      .agg(count(lit(1)).as("n"), Exact.dsum(col("value")).as("v"))

  /** JSON property extraction + integer aggregation (seqrun_stats JSON
    * column idiom, igfTables.py:435-437). */
  def jsonExtract(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).events
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy("event_type")
      .agg(sum(col("k")).as("k_sum"), count(col("k")).as("k_n"))

  /** Per-user ordered event sequence — groupBy + ordered collect idiom
    * (check_sequence_index_barcodes.py:118-151 group walks). */
  def userJourney(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).events
      .withColumn("us", expr("ts div 1000"))
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_events"),
        min(col("us")).as("first_us"),
        max(col("us")).as("last_us"),
        // sort_array over (time, type) structs = deterministic journey string
        array_join(expr("transform(array_sort(collect_list(struct(us, event_type))), x -> x.event_type)"), ">")
          .as("journey"))

  /** Daily funnel: distinct users per event type per day — the
    * retention/conversion census a product pipeline runs. */
  def dailyFunnel(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).events
      .withColumn("day_ep", expr("((ts div 1000) div 86400000000) * 86400"))
      .groupBy("day_ep", "event_type")
      .agg(countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"))

  /** Gap-based batch sessionization (30-minute inactivity): the batch twin
    * of the streaming mapGroupsWithState sessionizer, as an oracle-backed
    * rollup. One shuffle on user_id shared by both windows and the final
    * aggregation ([[graft.ops.Sessionize]]). */
  def sessionize(s: SparkSession, dir: String): DataFrame =
    graft.ops.Sessionize.sessions(
      Tables(s, dir).events.withColumn("us", expr("ts div 1000")),
      keyCol = "user_id", tsCol = "us", tieCol = "event_id",
      gapUs = 30L * 60 * 1000000)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q51_sessionize"     -> (sessionize _),
    "q33_daily_funnel"   -> (dailyFunnel _),
    "q23_events_hourly"  -> (hourlyWindow _),
    "q24_events_json"    -> (jsonExtract _),
    "q25_user_journey"   -> (userJourney _))

  val oracles: Map[String, String] = Map(
    "q51_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
        |flagged AS (
        |  SELECT user_id, event_id, us,
        |         CASE WHEN us - lag(us) OVER w IS NULL
        |                OR us - lag(us) OVER w > 1800000000 THEN 1 ELSE 0 END AS nw
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |numbered AS (
        |  SELECT user_id, us,
        |         CAST(SUM(nw) OVER (PARTITION BY user_id ORDER BY us, event_id
        |           ROWS UNBOUNDED PRECEDING) AS BIGINT) - 1 AS session_idx
        |  FROM flagged)
        |SELECT user_id, session_idx, count(*) AS n_events,
        |       min(us) AS start_us, max(us) AS end_us,
        |       max(us) - min(us) AS dur_us
        |FROM numbered GROUP BY 1, 2""".stripMargin,
    "q33_daily_funnel" ->
      """SELECT (epoch_us(ts) // 86400000000) * 86400 AS day_ep, event_type,
        |       count(DISTINCT user_id) AS n_users, count(*) AS n_events
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q23_events_hourly" ->
      """SELECT (epoch_us(ts) // 3600000000) * 3600 AS hour_ep, event_type,
        |       count(*) AS n,
        |       CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS v
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q24_events_json" ->
      """SELECT event_type,
        |       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
        |       count(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_n
        |FROM events GROUP BY 1""".stripMargin,
    "q25_user_journey" ->
      """SELECT user_id, count(*) AS n_events,
        |       min(epoch_us(ts)) AS first_us,
        |       max(epoch_us(ts)) AS last_us,
        |       string_agg(event_type, '>' ORDER BY epoch_us(ts), event_type) AS journey
        |FROM events GROUP BY 1""".stripMargin)
}
