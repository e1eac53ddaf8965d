package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{Eav, WindowOps}

/** EAV reshape + window/sort-idiom inventory (SURVEY.md §2.5, §2.8). */
object Reshape {

  /** EAV melt: part attributes → long (baseadaptor.py:148-195). */
  def eavMelt(s: SparkSession, dir: String): DataFrame = {
    val part = Tables(s, dir).part.select(
      col("p_partkey"), col("p_brand").as("brand"),
      col("p_type").as("type"), col("p_size").as("size"))
    Eav.melt(part, Seq("p_partkey"), Seq("brand", "type", "size"))
  }

  /** EAV pivot: the melted long table back to wide
    * (project_analysis_utils.py:156-166). */
  def eavPivot(s: SparkSession, dir: String): DataFrame =
    Eav.pivot(eavMelt(s, dir), Seq("p_partkey"), Seq("brand", "type", "size"))

  /** Earliest order per customer (projectutils.py:518-531 idiom). */
  def firstAfterSort(s: SparkSession, dir: String): DataFrame =
    WindowOps.firstAfterSort(Tables(s, dir).orders,
        Seq("o_custkey"), Seq(col("o_orderdate").asc, col("o_orderkey").asc))
      .select(col("o_custkey"), col("o_orderkey"),
        unix_timestamp(col("o_orderdate")).as("first_order_ep"))

  /** Top-3 lineitems by price within each return flag (top-k idiom,
    * metadata_validation.py:585-589). Bounded-heap aggregation, not a
    * window: three groups would otherwise sort the whole table on three
    * tasks (see [[WindowOps.topKBounded]]). */
  def topKPerGroup(s: SparkSession, dir: String): DataFrame =
    WindowOps.topKBounded(
        Tables(s, dir).lineitem
          .select("l_returnflag", "l_extendedprice", "l_orderkey", "l_linenumber"),
        Seq("l_returnflag"),
        Seq(("l_extendedprice", true), ("l_orderkey", false), ("l_linenumber", false)),
        k = 3)
      .select("l_returnflag", "l_orderkey", "l_linenumber",
        "l_extendedprice", "rk")

  /** Decimal-exact running sum per supplier over ship order. l_quantity
    * joins the ordering: the synthetic data has rows colliding on
    * (shipdate, orderkey, linenumber) within a supplier, and rows that tie
    * on ALL ordering columns plus the summed value are swap-invisible, so
    * this suffix makes the output order-stable across engines. */
  def runningSum(s: SparkSession, dir: String): DataFrame =
    WindowOps.runningSumExact(Tables(s, dir).lineitem,
        Seq("l_suppkey"),
        Seq(col("l_shipdate").asc, col("l_orderkey").asc,
            col("l_linenumber").asc, col("l_quantity").asc),
        col("l_quantity"), "running_qty")
      .select("l_suppkey", "l_orderkey", "l_linenumber", "running_qty")

  /** Truncate names to the brand-minimum length — the per-lane index
    * truncation idiom (samplesheet_utils.py:90-106). */
  def minlenTruncate(s: SparkSession, dir: String): DataFrame =
    WindowOps.truncateToGroupMin(Tables(s, dir).part,
        Seq("p_brand"), "p_name", "name_trunc")
      .select("p_partkey", "p_brand", "name_trunc")

  /** lag/lead inter-event deltas per user — gap analysis over the events
    * stream (total order: time then event_id). */
  def lagLead(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("us").asc, col("event_id").asc)
    Tables(s, dir).events
      .withColumn("us", expr("ts div 1000"))
      .select(col("user_id"), col("event_id"),
        (col("us") - lag(col("us"), 1).over(w)).as("gap_us"),
        lead(col("event_type"), 1).over(w).as("next_type"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q36_lag_lead"         -> (lagLead _),
    "q07_eav_melt"         -> (eavMelt _),
    "q08_eav_pivot"        -> (eavPivot _),
    "q09_first_after_sort" -> (firstAfterSort _),
    "q10_topk_per_group"   -> (topKPerGroup _),
    "q12_running_sum"      -> (runningSum _),
    "q13_minlen_truncate"  -> (minlenTruncate _))

  private val meltSql =
    """SELECT p_partkey, 'brand' AS attribute_name, p_brand AS attribute_value FROM part
      |UNION ALL SELECT p_partkey, 'type', p_type FROM part
      |UNION ALL SELECT p_partkey, 'size', CAST(p_size AS VARCHAR) FROM part""".stripMargin

  val oracles: Map[String, String] = Map(
    "q36_lag_lead" ->
      """SELECT user_id, event_id,
        |       epoch_us(ts) - lag(epoch_us(ts), 1) OVER w AS gap_us,
        |       lead(event_type, 1) OVER w AS next_type
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)""".stripMargin,
    "q07_eav_melt" -> meltSql,
    "q08_eav_pivot" ->
      s"""SELECT p_partkey,
         |       max(CASE WHEN attribute_name = 'brand' THEN attribute_value END) AS brand,
         |       max(CASE WHEN attribute_name = 'type'  THEN attribute_value END) AS type,
         |       max(CASE WHEN attribute_name = 'size'  THEN attribute_value END) AS size
         |FROM ($meltSql) GROUP BY 1""".stripMargin,
    "q09_first_after_sort" ->
      """WITH r AS (
        |  SELECT o_custkey, o_orderkey, CAST(epoch(o_orderdate) AS BIGINT) AS first_order_ep,
        |         row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
        |  FROM orders)
        |SELECT o_custkey, o_orderkey, first_order_ep FROM r WHERE rn = 1""".stripMargin,
    "q10_topk_per_group" ->
      """WITH r AS (
        |  SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
        |         row_number() OVER (PARTITION BY l_returnflag
        |           ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rk
        |  FROM lineitem)
        |SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice, rk
        |FROM r WHERE rk <= 3""".stripMargin,
    "q12_running_sum" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) OVER (
        |         PARTITION BY l_suppkey
        |         ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty
        |FROM lineitem""".stripMargin,
    "q13_minlen_truncate" ->
      """SELECT p_partkey, p_brand,
        |       substr(p_name, 1, min(length(p_name)) OVER (PARTITION BY p_brand)) AS name_trunc
        |FROM part""".stripMargin)
}
