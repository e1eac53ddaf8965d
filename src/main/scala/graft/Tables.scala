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
  /** events.ts is TIMESTAMP(NANOS) parquet, which Spark 4 rejects outright
    * ([PARQUET_TYPE_ILLEGAL]); read it as raw Long nanoseconds instead.
    * Downstream code treats time as integer microseconds (`ts div 1000`),
    * which is also what DuckDB sees after its silent ns→µs truncation. */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table("events")
  }
  def documents: DataFrame  = table("documents")
  def embeddings: DataFrame = table("embeddings")
}

object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")
  def apply(spark: SparkSession, dir: String): Tables = new Tables(spark, dir)
}
