package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Exact

/** Set operations + aggregation inventory (SURVEY.md §2.4, §2.6). */
object SetAgg {

  /** Group min/max — per-lane mapping-ratio bounds idiom
    * (check_sequence_index_barcodes.py:225-228). */
  def groupMinmax(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).lineitem.groupBy("l_returnflag").agg(
      min(col("l_discount")).as("mn_disc"),
      max(col("l_tax")).as("mx_tax"),
      unix_timestamp(min(col("l_shipdate"))).as("first_ship_ep"),
      count(lit(1)).as("n"))

  /** EXCEPT: samplesheet-vs-metadata set difference idiom
    * (metadata_validation.py:541-543). */
  def setExcept(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    t.customer.select("c_custkey")
      .except(t.orders.select(col("o_custkey").as("c_custkey")))
  }

  /** UNION ALL with a source tag (pd.concat idiom,
    * check_sequence_index_barcodes.py:81,115,151). */
  def unionTagged(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    val c = t.customer.select(col("c_custkey").as("id"),
      col("c_name").as("name"), lit("customer").as("src"))
    val p = t.supplier.select(col("s_suppkey").as("id"),
      col("s_name").as("name"), lit("supplier").as("src"))
    c.unionByName(p)
  }

  /** value_counts census + count-distinct (reformat_metadata_file.py:
    * 550-559; metadata_validation.py:497-610). */
  def valueCounts(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).orders.groupBy("o_orderpriority").agg(
      count(lit(1)).as("n"),
      countDistinct(col("o_custkey")).as("n_cust"))

  /** Ordered string-concat aggregation (dag22:3582-3590). Sorting inside the
    * group makes the result order-independent — collect_list alone is not
    * deterministic under parallel merge. */
  def concatAgg(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).orders.groupBy("o_custkey").agg(
      array_join(array_sort(collect_list(col("o_orderpriority"))), ",")
        .as("priorities"),
      count(lit(1)).as("n"))

  /** CASE-bucketing census (status-bucket idiom, projectutils.py:65-67). */
  def bucketCensus(s: SparkSession, dir: String): DataFrame = {
    val bucket = when(col("o_totalprice") < 50000.0, "small")
      .when(col("o_totalprice") < 150000.0, "medium")
      .otherwise("large")
    Tables(s, dir).orders.groupBy(bucket.as("bucket")).agg(
      count(lit(1)).as("n"),
      Exact.dsum(col("o_totalprice")).as("total"))
  }

  /** Pearson correlation from decimal-exact moments — batch_effect_report
    * .py:160's df.corr() with engine-stable arithmetic: every sum is exact,
    * the closing-form arithmetic is the same IEEE expression both sides. */
  def corrMoments(s: SparkSession, dir: String): DataFrame = {
    val li = Tables(s, dir).lineitem
    val agg = li.groupBy("l_returnflag").agg(
      count(lit(1)).cast("double").as("n"),
      Exact.dsum(col("l_quantity")).as("sx"),
      Exact.dsum(col("l_extendedprice")).as("sy"),
      Exact.dsumProduct(col("l_quantity"), col("l_extendedprice")).as("sxy"),
      Exact.dsumProduct(col("l_quantity"), col("l_quantity")).as("sxx"),
      Exact.dsumProduct(col("l_extendedprice"), col("l_extendedprice")).as("syy"))
    // Rounded to 6dp: the moments are engine-exact but the closing double
    // arithmetic is not bit-stable across engines (DuckDB may fuse FMA).
    agg.select(col("l_returnflag"),
      round((col("n") * col("sxy") - col("sx") * col("sy")) /
        (sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
         sqrt(col("n") * col("syy") - col("sy") * col("sy"))), 6).as("corr_qp"),
      col("n").cast("long").as("n"))
  }

  /** Exact percentiles per group (sort-based, linear interpolation — the
    * same formula in both engines, so values are bit-identical; the
    * approximate scale path would be percentile_approx/t-digest, not
    * oracle-able). Runs through [[graft.functions.ArrayPercentile]] — a
    * primitive-double-buffer aggregate that skips the built-in's boxed
    * counts-map (~2x on this path); both quantity percentiles share ONE
    * buffer via the array form. */
  def percentiles(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).lineitem.groupBy("l_returnflag").agg(
      graft.functions.ArrayPercentile
        .percentiles(col("l_quantity"), Seq(0.5, 0.9)).as("__qps"),
      graft.functions.ArrayPercentile
        .percentiles(col("l_extendedprice"), Seq(0.5)).as("__pps"))
      .select(col("l_returnflag"),
        element_at(col("__qps"), 1).as("qty_p50"),
        element_at(col("__qps"), 2).as("qty_p90"),
        element_at(col("__pps"), 1).as("price_p50"))

  /** Rollup: the per-(flag,status) census with per-flag and grand totals
    * in ONE pass — what the reference assembles with three separate
    * nested-groupby walks (check_sequence_index_barcodes.py:118-151). */
  def rollupCensus(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).lineitem
      .rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"), Exact.dsum(col("l_quantity")).as("qty"))

  /** CUBE census with explicit grouping flags — the full grouping-sets
    * lattice (q35 covers ROLLUP's prefix lattice); the GROUPING() bits
    * disambiguate "NULL because aggregated" from "NULL in the data".
    * Same single-shuffle partial-agg shape as a plain groupBy: Spark
    * expands the cube map-side, so no extra exchange. */
  def cubeCensus(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).orders
      .cube("o_orderstatus", "o_orderpriority")
      .agg(
        grouping(col("o_orderstatus")).cast("int").as("g_status"),
        grouping(col("o_orderpriority")).cast("int").as("g_prio"),
        count(lit(1)).as("n"),
        Exact.dsum(col("o_totalprice")).as("total"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q52_cube_census"  -> (cubeCensus _),
    "q34_percentiles"  -> (percentiles _),
    "q35_rollup"       -> (rollupCensus _),
    "q11_group_minmax" -> (groupMinmax _),
    "q14_set_except"   -> (setExcept _),
    "q15_union_tagged" -> (unionTagged _),
    "q16_value_counts" -> (valueCounts _),
    "q17_concat_agg"   -> (concatAgg _),
    "q20_bucket_census" -> (bucketCensus _),
    "q21_corr_moments" -> (corrMoments _))

  val oracles: Map[String, String] = Map(
    "q52_cube_census" ->
      """SELECT o_orderstatus, o_orderpriority,
        |       CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
        |       CAST(GROUPING(o_orderpriority) AS INT) AS g_prio,
        |       count(*) AS n,
        |       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS total
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)""".stripMargin,
    "q34_percentiles" ->
      """SELECT l_returnflag,
        |       quantile_cont(l_quantity, 0.5) AS qty_p50,
        |       quantile_cont(l_quantity, 0.9) AS qty_p90,
        |       quantile_cont(l_extendedprice, 0.5) AS price_p50
        |FROM lineitem GROUP BY 1""".stripMargin,
    "q35_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |       CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin,
    "q11_group_minmax" ->
      """SELECT l_returnflag, min(l_discount) AS mn_disc, max(l_tax) AS mx_tax,
        |       CAST(epoch(min(l_shipdate)) AS BIGINT) AS first_ship_ep,
        |       count(*) AS n
        |FROM lineitem GROUP BY 1""".stripMargin,
    "q14_set_except" ->
      "SELECT c_custkey FROM customer EXCEPT SELECT o_custkey FROM orders",
    "q15_union_tagged" ->
      """SELECT c_custkey AS id, c_name AS name, 'customer' AS src FROM customer
        |UNION ALL
        |SELECT s_suppkey AS id, s_name AS name, 'supplier' AS src FROM supplier""".stripMargin,
    "q16_value_counts" ->
      """SELECT o_orderpriority, count(*) AS n,
        |       count(DISTINCT o_custkey) AS n_cust
        |FROM orders GROUP BY 1""".stripMargin,
    "q17_concat_agg" ->
      """SELECT o_custkey,
        |       string_agg(o_orderpriority, ',' ORDER BY o_orderpriority) AS priorities,
        |       count(*) AS n
        |FROM orders GROUP BY 1""".stripMargin,
    "q20_bucket_census" ->
      """SELECT CASE WHEN o_totalprice < 50000.0 THEN 'small'
        |            WHEN o_totalprice < 150000.0 THEN 'medium'
        |            ELSE 'large' END AS bucket,
        |       count(*) AS n,
        |       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS total
        |FROM orders GROUP BY 1""".stripMargin,
    "q21_corr_moments" ->
      """WITH m AS (
        |  SELECT l_returnflag,
        |         CAST(count(*) AS DOUBLE) AS n,
        |         CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sx,
        |         CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sy,
        |         CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(25,4)) * CAST(l_extendedprice AS DECIMAL(25,4))) AS VARCHAR) AS DOUBLE) AS sxy,
        |         CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(25,4)) * CAST(l_quantity AS DECIMAL(25,4))) AS VARCHAR) AS DOUBLE) AS sxx,
        |         CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,4)) * CAST(l_extendedprice AS DECIMAL(25,4))) AS VARCHAR) AS DOUBLE) AS syy
        |  FROM lineitem GROUP BY 1)
        |SELECT l_returnflag,
        |       round((n * sxy - sx * sy) / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6) AS corr_qp,
        |       CAST(n AS BIGINT) AS n
        |FROM m""".stripMargin)
}
