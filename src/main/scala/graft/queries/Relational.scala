package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.ops.{Census, Exact}

/** Relational operator inventory (SURVEY.md §2.3–§2.6) bound to the
  * synthetic star schema. Every query here has a matching DuckDB oracle in
  * [[oracles]]; column names/aliases are identical on both sides because the
  * driver's compare sorts columns by name before hashing.
  *
  * Numeric policy: any aggregated double goes through [[Exact]] (decimal-
  * exact, order-independent) so Spark's parallel partial aggregation and the
  * single-threaded oracle agree bit-for-bit.
  */
object Relational {

  private val D = DecimalType(18, 4)

  /** Flagship: two-level pooling census (project_pooling_info.py:55-121).
    * customer=project, orders=sample, lineitem=run; expected=o_totalprice,
    * actual=sum of net lineitem price. */
  def poolingCensus(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    val items = t.lineitem.withColumnRenamed("l_orderkey", "o_orderkey")
    val net = col("l_extendedprice") * (lit(1) - col("l_discount"))
    val rollup = Census.perChildRollup(
      t.orders, Seq("o_custkey", "o_orderkey"), items, "o_orderkey",
      expected = col("o_totalprice"), actual = net)
    Census.passFailZero(
      t.customer.withColumnRenamed("c_custkey", "o_custkey"),
      Seq("o_custkey", "c_name"), rollup, "o_custkey", passRatio = 0.5)
      .withColumnRenamed("o_custkey", "c_custkey")
      .select("c_custkey", "c_name", "n_pass", "n_fail", "n_zero")
  }

  /** 5-way inner lineage join + exact agg (runadaptor.py:272-313 shape). */
  def lineageJoin(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    t.region
      .join(t.nation, col("r_regionkey") === col("n_regionkey"))
      .join(t.customer, col("n_nationkey") === col("c_nationkey"))
      .join(t.orders, col("c_custkey") === col("o_custkey"))
      .join(t.lineitem, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        Exact.dsumProduct(col("l_extendedprice"), lit(1) - col("l_discount"))
          .as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** Semi-join: IN-subquery shape (analysis_fastq_fetch_utils.py:97-112). */
  def semiJoin(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    val bigOrders = t.orders.filter(col("o_totalprice") > 200000.0)
    t.customer
      .join(bigOrders, col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name", "c_acctbal")
  }

  /** Anti-join: NOT-IN seeding shape (pipelineadaptor.py:533-548). */
  def antiJoin(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    t.orders
      .join(t.lineitem, col("o_orderkey") === col("l_orderkey"), "left_anti")
      .select("o_orderkey", "o_orderstatus")
  }

  /** Full-row dedup via DISTINCT (metadata_validation.py:81-84). */
  def dedupDistinct(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).lineitem.select("l_returnflag", "l_linestatus").distinct()

  /** Duplicate-key detection (metadata_validation.py:103-129). */
  def dupDetect(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).lineitem
      .groupBy("l_partkey", "l_suppkey")
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pooling_census" -> (poolingCensus _),
    "q02_lineage_join"   -> (lineageJoin _),
    "q03_semi_join"      -> (semiJoin _),
    "q04_anti_join"      -> (antiJoin _),
    "q05_dedup_distinct" -> (dedupDistinct _),
    "q06_dup_detect"     -> (dupDetect _))

  val oracles: Map[String, String] = Map(
    "q01_pooling_census" ->
      """WITH rollup AS (
        |  SELECT o_custkey, o_orderkey,
        |         max(o_totalprice) AS expected,
        |         CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS actual,
        |         count(l_extendedprice * (1 - l_discount)) AS n_items
        |  FROM orders LEFT JOIN lineitem ON o_orderkey = l_orderkey
        |  GROUP BY 1, 2)
        |SELECT c_custkey, c_name,
        |       count(CASE WHEN n_items > 0 AND actual >= expected * 0.5 THEN 1 END) AS n_pass,
        |       count(CASE WHEN n_items > 0 AND NOT (actual >= expected * 0.5) THEN 1 END) AS n_fail,
        |       count(CASE WHEN n_items = 0 THEN 1 END) AS n_zero
        |FROM customer JOIN rollup ON c_custkey = o_custkey
        |GROUP BY 1, 2""".stripMargin,
    "q02_lineage_join" ->
      """SELECT r_name, n_name,
        |       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l_discount AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS revenue,
        |       count(*) AS n_items
        |FROM region
        |JOIN nation ON r_regionkey = n_regionkey
        |JOIN customer ON n_nationkey = c_nationkey
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY 1, 2""".stripMargin,
    "q03_semi_join" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 200000.0)""".stripMargin,
    "q04_anti_join" ->
      """SELECT o_orderkey, o_orderstatus FROM orders
        |WHERE o_orderkey NOT IN (SELECT l_orderkey FROM lineitem)""".stripMargin,
    "q05_dedup_distinct" ->
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    "q06_dup_detect" ->
      """SELECT l_partkey, l_suppkey, count(*) AS n FROM lineitem
        |GROUP BY 1, 2 HAVING count(*) > 1""".stripMargin)
}
