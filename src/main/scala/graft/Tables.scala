package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided synthetic star schema (TESTDATA.md).
  *
  * One parquet file per table under `dir` (e.g. /root/testdata/sf0.01).
  * All queries in [[SparkEntry]] read through here so the scan layer is
  * uniform: plain parquet scans that Catalyst can push filters/projections
  * into. At cluster scale the same loader would point at a partitioned
  * table root instead of a single file — call sites do not change.
  */
final class Tables(spark: SparkSession, dir: String) {
  def table(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame     = table("region")
  def nation: DataFrame     = table("nation")
  def customer: DataFrame   = table("customer")
  def supplier: DataFrame   = table("supplier")
  def part: DataFrame       = table("part")
  def orders: DataFrame     = table("orders")
  def lineitem: DataFrame   = table("lineitem")
  /** events.ts normalizes to raw Long NANOSECONDS whatever the file
    * layout: early data drops wrote TIMESTAMP(NANOS), which Spark 4
    * rejects outright ([PARQUET_TYPE_ILLEGAL]) unless read as raw Long
    * nanos; current drops write timestamp[us] (TIMESTAMP_NTZ to Spark).
    * Downstream code treats time as integer microseconds (`ts div 1000`),
    * which is also what DuckDB sees (epoch_us on µs timestamps; silent
    * ns→µs truncation on the old layout) — with the session pinned to
    * UTC the NTZ→epoch cast is wall-clock-exact on both engines. */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = table("events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => df
      case _ => df.withColumn("ts",
        org.apache.spark.sql.functions.expr(
          "unix_micros(cast(ts as timestamp)) * 1000"))
    }
  }
  def documents: DataFrame  = table("documents")
  def embeddings: DataFrame = table("embeddings")
}

object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")
  def apply(spark: SparkSession, dir: String): Tables = new Tables(spark, dir)

  /** Repartition `df` by `key` across the session's full core count
    * BEFORE chaining CPU-heavy per-row work (tokenize, shingle, winnow,
    * codec decode): a few-file/single-row-group input scans as one task,
    * and every projection up to the first shuffle would run serially on
    * it. The partition count must be explicit — AQE sizes exchanges by
    * BYTES and would coalesce a small `repartition(col)` back to one
    * partition, which is exactly wrong when the downstream cost is CPU
    * per row, not bytes. Use where the work-per-row clearly dominates
    * the one extra small exchange; plain column-arithmetic queries
    * should stay un-shuffled.
    *
    * SCALE-ADAPTIVE: the repartition exists to fix an input whose scan
    * parallelism is BELOW the session's core count — a local-mode/test
    * fixture property. An input that already scans with at least that
    * many tasks (any real corpus: task count follows bytes via
    * maxPartitionBytes) gains nothing and would pay a full shuffle of
    * the text column per query, so it passes through untouched. Results
    * are partitioning-independent either way; the check reads the
    * planned partition count, it never runs a job. */
  def spread(df: org.apache.spark.sql.DataFrame, key: String)
      : org.apache.spark.sql.DataFrame = {
    val cores = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= cores) df
    else df.repartition(cores, org.apache.spark.sql.functions.col(key))
  }
}
