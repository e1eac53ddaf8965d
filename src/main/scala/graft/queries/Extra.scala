package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Exact
import graft.pipelines.PoolingReport

/** Remaining SURVEY §2 inventory rows as oracle-backed queries. */
object Extra {

  /** Worker bin-packing into <=4 balanced groups (dag22:3576-3610).
    * Exact `ntile(4) over (order by ...)` semantics, but computed with
    * [[graft.ops.GlobalOrder]]'s partition-parallel rank rather than a
    * no-partition window (which serializes the sort onto one task). */
  def ntileBinpack(s: SparkSession, dir: String): DataFrame =
    graft.ops.GlobalOrder.ntileBalanced(
        Tables(s, dir).supplier, Seq(col("s_suppkey")), tiles = 4, as = "worker")
      .select("s_suppkey", "s_name", "worker")

  /** Per-row FK lookup join → broadcast key-map (baseadaptor.py:198-266's
    * N+1 map_foreign_table rewritten as ONE broadcast join). */
  def fkLookup(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    t.orders
      .join(broadcast(t.customer.select(col("c_custkey"), col("c_name"))),
        col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("c_custkey"), col("c_name"))
  }

  /** sample×flowcell read matrix → custkey×priority pivot matrix
    * (project_data_display_utils.py:60-83 two-stage pivot). Explicit value
    * list keeps it single-shuffle. */
  def pivotMatrix(s: SparkSession, dir: String): DataFrame = {
    val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
    val renames = Seq("p1_urgent", "p2_high", "p3_medium", "p4_not_specified", "p5_low")
    // parquet column names cannot contain spaces: alias the pivot columns
    prios.zip(renames).foldLeft(
      Tables(s, dir).orders
        .groupBy("o_custkey")
        .pivot("o_orderpriority", prios)
        .agg(Exact.dsum(col("o_totalprice")))) {
      case (df, (from, to)) => df.withColumnRenamed(from, to)
    }
  }

  /** Full outer merge of per-source matrices on a shared key
    * (batch_effect_report.py:134-140's gene-count merge). */
  def outerMergeMatrix(s: SparkSession, dir: String): DataFrame = {
    val li = Tables(s, dir).lineitem
    val a = li.filter(col("l_returnflag") === "R").groupBy("l_partkey")
      .agg(Exact.dsum(col("l_quantity")).as("qty_r"))
    val b = li.filter(col("l_returnflag") === "A").groupBy("l_partkey")
      .agg(Exact.dsum(col("l_quantity")).as("qty_a"))
    a.join(b, Seq("l_partkey"), "full_outer")
      .na.fill(0.0, Seq("qty_r", "qty_a"))
  }

  /** HTML link wrapping for report columns (project_pooling_info.py:123-141). */
  def htmlLinks(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).customer.select(
      col("c_custkey"),
      PoolingReport.htmlLink(
        concat(lit("https://portal/project/"), col("c_custkey")),
        col("c_name")).as("link"))

  /** Inactive-entity cutoff (projectutils.py:516-531): last order per
    * customer + the >=16-weeks-stale flag against a fixed reference date. */
  def inactiveCutoff(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).orders
      .groupBy("o_custkey")
      .agg(max(col("o_orderdate").cast("date")).as("last_order"))
      .select(col("o_custkey"),
        unix_timestamp(col("last_order").cast("timestamp")).as("last_order_ep"),
        (datediff(lit("1998-06-01").cast("date"), col("last_order")) >= 112)
          .as("inactive"))

  /** Seqrun-date parse (seqrunutils): YYMMDD-prefixed run-folder ids round-
    * trip through the date parser; ids synthesized from order dates. */
  def seqrunDateParse(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).orders.select(
      col("o_orderkey"),
      concat(date_format(col("o_orderdate"), "yyMMdd"),
        lit("_M00001_0001_FC"), col("o_orderkey")).as("seqrun_igf_id"))
      .select(col("o_orderkey"), col("seqrun_igf_id"),
        unix_timestamp(graft.scalars.Genomics
          .seqrunDate(col("seqrun_igf_id")).cast("timestamp")).as("run_date_ep"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q31_inactive_cutoff" -> (inactiveCutoff _),
    "q32_seqrun_date"     -> (seqrunDateParse _),
    "q26_ntile_binpack"  -> (ntileBinpack _),
    "q27_fk_lookup"      -> (fkLookup _),
    "q28_pivot_matrix"   -> (pivotMatrix _),
    "q29_outer_merge"    -> (outerMergeMatrix _),
    "q30_html_links"     -> (htmlLinks _))

  val oracles: Map[String, String] = Map(
    "q31_inactive_cutoff" ->
      """SELECT o_custkey,
        |       CAST(epoch(CAST(max(CAST(o_orderdate AS DATE)) AS TIMESTAMP)) AS BIGINT) AS last_order_ep,
        |       date_diff('day', max(CAST(o_orderdate AS DATE)), DATE '1998-06-01') >= 112 AS inactive
        |FROM orders GROUP BY 1""".stripMargin,
    "q32_seqrun_date" ->
      """WITH ids AS (
        |  SELECT o_orderkey,
        |         strftime(o_orderdate, '%y%m%d') || '_M00001_0001_FC' || o_orderkey AS seqrun_igf_id
        |  FROM orders)
        |SELECT o_orderkey, seqrun_igf_id,
        |       -- '20' prefix: Spark's yy parses into 2000-2099 while %y
        |       -- uses the POSIX 1969 pivot; run folders are all 20xx
        |       CAST(epoch(CAST(strptime('20' || substr(seqrun_igf_id, 1, 6), '%Y%m%d') AS TIMESTAMP)) AS BIGINT) AS run_date_ep
        |FROM ids""".stripMargin,
    "q26_ntile_binpack" ->
      """SELECT s_suppkey, s_name,
        |       CAST(ntile(4) OVER (ORDER BY s_suppkey) AS INT) AS worker
        |FROM supplier""".stripMargin,
    "q27_fk_lookup" ->
      """SELECT o_orderkey, c_custkey, c_name FROM orders
        |JOIN customer ON o_custkey = c_custkey""".stripMargin,
    "q28_pivot_matrix" ->
      """SELECT o_custkey,
        |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) FILTER (WHERE o_orderpriority = '1-URGENT') AS VARCHAR) AS DOUBLE) AS p1_urgent,
        |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) FILTER (WHERE o_orderpriority = '2-HIGH') AS VARCHAR) AS DOUBLE) AS p2_high,
        |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS VARCHAR) AS DOUBLE) AS p3_medium,
        |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS VARCHAR) AS DOUBLE) AS p4_not_specified,
        |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) FILTER (WHERE o_orderpriority = '5-LOW') AS VARCHAR) AS DOUBLE) AS p5_low
        |FROM orders GROUP BY 1""".stripMargin,
    "q29_outer_merge" ->
      """WITH a AS (
        |  SELECT l_partkey, CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS qty_r
        |  FROM lineitem WHERE l_returnflag = 'R' GROUP BY 1),
        |b AS (
        |  SELECT l_partkey, CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS qty_a
        |  FROM lineitem WHERE l_returnflag = 'A' GROUP BY 1)
        |SELECT COALESCE(a.l_partkey, b.l_partkey) AS l_partkey,
        |       COALESCE(qty_r, 0.0) AS qty_r, COALESCE(qty_a, 0.0) AS qty_a
        |FROM a FULL OUTER JOIN b ON a.l_partkey = b.l_partkey""".stripMargin,
    "q30_html_links" ->
      """SELECT c_custkey,
        |       format('<a href="{}">{}</a>',
        |              'https://portal/project/' || c_custkey, c_name) AS link
        |FROM customer""".stripMargin)
}
