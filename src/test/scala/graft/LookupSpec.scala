package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Lookup
import graft.sources.RunInfoXml

class LookupSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val customer = Tables(spark, sf).customer

  test("one: exactly-one semantics") {
    val r = Lookup.one(customer.filter(col("c_custkey") === 7))
    assert(r.getAs[Long]("c_custkey") == 7L)
    intercept[IllegalStateException] {
      Lookup.one(customer.filter(col("c_custkey") === -1))
    }
    intercept[IllegalStateException] {
      Lookup.one(customer.filter(col("c_custkey") < 10))
    }
  }

  test("oneOrNone and exists") {
    assert(Lookup.oneOrNone(customer.filter(col("c_custkey") === -1)).isEmpty)
    assert(Lookup.oneOrNone(customer.filter(col("c_custkey") === 3)).nonEmpty)
    assert(Lookup.exists(customer.filter(col("c_custkey") === 3)))
    assert(!Lookup.exists(customer.filter(col("c_custkey") === -1)))
  }

  test("RunParameters.xml flattens to a settings map") {
    val xml =
      """<RunParameters>
        |  <Setup>
        |    <ApplicationName>HiSeq Control Software</ApplicationName>
        |    <ExperimentName>exp-1</ExperimentName>
        |    <Reads><Read1>151</Read1><Read2>151</Read2></Reads>
        |  </Setup>
        |  <RunID>200101_K00001_0001</RunID>
        |</RunParameters>""".stripMargin
    val m = RunInfoXml.parseParams(xml)
    assert(m("Setup/ApplicationName") == "HiSeq Control Software")
    assert(m("Setup/Reads/Read1") == "151")
    assert(m("RunID") == "200101_K00001_0001")
  }
}
