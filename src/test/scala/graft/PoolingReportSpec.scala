package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipelines.PoolingReport

class PoolingReportSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("gviz JSON carries schema-typed columns and all rows") {
    val df = Seq(("P1", 3L, 1.5), ("P\"2", 0L, 0.0)).toDF("project", "n_pass", "score")
    val json = PoolingReport.gvizJson(df)
    assert(json.contains(""""id":"project","label":"project","type":"string""""))
    assert(json.contains(""""type":"number""""))
    assert(json.contains("""{"v":"P\"2"}"""))
    assert(json.contains("""{"v":3}"""))
    // parseable by a strict JSON parser
    import org.json4s.jackson.JsonMethods
    assert(JsonMethods.parse(json) != null)
  }

  test("end-to-end pooling report over the star schema") {
    val census = SparkEntry.queries("q01_pooling_census")(spark, sf)
    val tagged = census.withColumn("link",
      PoolingReport.htmlLink(concat(lit("https://portal/"), col("c_custkey")), col("c_name")))
    val json = PoolingReport.gvizJson(tagged.limit(5))
    assert(json.contains("<a href="))
    import org.json4s.jackson.JsonMethods
    assert(JsonMethods.parse(json) != null)
  }
}
