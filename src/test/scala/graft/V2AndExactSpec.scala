package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Exact
import graft.sources.SampleSheet

class V2AndExactSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val sampleSheetV2 =
    """[Header]
      |FileFormatVersion,2
      |InstrumentType,NovaSeq X
      |[Reads]
      |Read1Cycles,151
      |Read2Cycles,151
      |[BCLConvert_Settings]
      |SoftwareVersion,4.0.3
      |[BCLConvert_Data]
      |Lane,Sample_ID,index,index2
      |1,IGF9001,ATTACTCG,AGGCTATA
      |2,IGF9002,TCCGGAGA,GCCTCTAT
      |""".stripMargin

  test("v2 sheets are detected and round-trip") {
    val sheet = SampleSheet.parse(sampleSheetV2)
    assert(sheet.isV2)
    assert(sheet.dataSection == "BCLConvert_Data")
    assert(sheet.rows.size == 2)
    val again = SampleSheet.parse(sheet.format)
    assert(again.isV2 && again.rows == sheet.rows)
    assert(again.sectionMap("BCLConvert_Settings") == Seq("SoftwareVersion,4.0.3"))
  }

  test("Exact.dsum equals a BigDecimal reference over random doubles") {
    val rnd = new scala.util.Random(7)
    val xs = Seq.fill(5000)(BigDecimal((rnd.nextDouble() - 0.5) * 10000)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    val expected = xs.map(BigDecimal(_).setScale(4, BigDecimal.RoundingMode.HALF_UP))
      .sum.toDouble
    val got = xs.toDF("x").repartition(13)
      .agg(Exact.dsum(col("x")).as("s")).head().getDouble(0)
    assert(got == expected) // exact equality across arbitrary partitioning
  }

  test("Exact.davg and dsumProduct are partitioning-invariant") {
    val df = Tables(spark, sf).lineitem
    def run(parts: Int): (Double, Double) = {
      val r = df.repartition(parts).agg(
        Exact.davg(col("l_quantity")).as("a"),
        Exact.dsumProduct(col("l_quantity"), col("l_extendedprice")).as("p")).head()
      (r.getDouble(0), r.getDouble(1))
    }
    assert(run(2) == run(17))
  }
}
