package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Skew
import graft.sources.Sinks

class SkewAndExtensionsSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("salted join equals the unsalted join") {
    val t = Tables(spark, sf)
    val plain = t.lineitem.join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val ordersK = t.orders.withColumnRenamed("o_orderkey", "l_orderkey")
    val salted = Skew.saltedJoin(t.lineitem, ordersK, "l_orderkey", factor = 8)
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  test("salted two-stage aggregation equals direct aggregation") {
    val li = Tables(spark, sf).lineitem
    val direct = li.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), sum(col("l_quantity").cast("decimal(18,4)")).as("q"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDecimal(2)))).toMap
    val salted = Skew.saltedAgg(li, "l_returnflag", factor = 8,
      partial = Seq(count(lit(1)).as("pn"), sum(col("l_quantity").cast("decimal(18,4)")).as("pq")),
      finalAgg = Seq(sum(col("pn")).as("n"), sum(col("pq")).as("q")))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDecimal(2)))).toMap
    assert(salted == direct)
  }

  test("double_dot is SQL-callable after registration") {
    new GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions) // ctor path
    GraftExtensions.registerAll(spark) // live-session path
    val one = spark.sql(
      "SELECT double_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d").head().getDouble(0)
    assert(one == 11.0)
    assert(spark.sql("SELECT rev_comp('acgtACGT') AS r").head().getString(0) == "ACGTACGT")
    assert(spark.sql("SELECT poly_hash('x') = poly_hash('x') AND poly_hash('x') <> poly_hash('y') AS ok")
      .head().getBoolean(0))
    // round-5 registrations: winnowing + shingle hashing from SQL
    val fps = spark.sql(
      "SELECT size(winnow_fps('the quick brown fox jumps over it', 7, 4)) AS n")
      .head().getInt(0)
    assert(fps > 0)
    assert(spark.sql("SELECT size(shingle_hashes('a b c d', 3)) AS n")
      .head().getInt(0) == 2)
    // round-6: Misra-Gries heavy hitters as a SQL aggregate
    val hh = spark.sql(
      "SELECT freq_sketch(x, 4) AS s FROM VALUES ('a'),('a'),('a'),('b') t(x)")
      .selectExpr("inline(s)").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(hh.toSeq == Seq(("a", 3L), ("b", 1L)))
  }

  test("CSV sink round-trips with quoting; JSON records sink") {
    val df = Seq(("a,b", "line\nbreak", 1L), ("plain", "x\"q", 2L)).toDF("c1", "c2", "n")
    val p = java.nio.file.Files.createTempFile("out", ".csv").toString
    Sinks.writeCsvSingle(df, p)
    val back = Sinks.readCsvAllString(spark, p)
      .orderBy("n").collect().map(r => (r.getString(0), r.getString(2)))
    assert(back.toSeq == Seq(("a,b", "1"), ("plain", "2")))
    val json = Sinks.toJsonRecords(Seq((1, "x")).toDF("a", "b"))
    assert(json == """[{"a":1,"b":"x"}]""")
  }

  test("skiprows CSV read drops preamble lines") {
    val p = java.nio.file.Files.createTempFile("counts", ".tsvish")
    java.nio.file.Files.writeString(p,
      "junk1\njunk2\ngene,s1,s2\ng1,5,6\ng2,7,8\n")
    val df = Sinks.readCsvAllString(spark, p.toString, skipRows = 2)
    assert(df.columns.toSeq == Seq("gene", "s1", "s2"))
    assert(df.count() == 2)
  }
}
