package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.scalars.BasesMask
import graft.sources.{InterOp, RunInfoXml, SampleSheet}

/** Fixtures are self-authored to the formats documented in FIXTURES.md
  * (structure per samplesheet.py / runinfo_xml.py / interop.py). */
object GenomicsFixtures {
  val sampleSheetV1: String =
    """[Header],,,
      |IEMFileVersion,4,,
      |Application,HiSeq FASTQ Only,,
      |,,,
      |[Reads],,,
      |151,,,
      |151,,,
      |[Settings],,,
      |Adapter,AGATCGGAAGAGC,,
      |[Data],,,
      |Lane,Sample_ID,Sample_Name,Sample_Project,index,index2,I7_Index_ID,I5_Index_ID,Description
      |1,IGF0001,samp-one,IGFQ0001:user1,ATTACTCG,AGGCTATA,D701,D501,
      |1,IGF0002,samp-two,IGFQ0001:user1,TCCGGAGA,GCCTCTAT,D702,D502,
      |2,IGF0003,samp-three,IGFQ0002,SI-GA-A1,,SI-GA-A1,,10X
      |""".stripMargin

  val runInfoXml: String =
    """<?xml version="1.0"?>
      |<RunInfo Version="2">
      |  <Run Id="200101_M00001_0001_000000000-ABCDE" Number="1">
      |    <Flowcell>000000000-ABCDE</Flowcell>
      |    <Instrument>M00001</Instrument>
      |    <Date>200101</Date>
      |    <Reads>
      |      <Read Number="1" NumCycles="151" IsIndexedRead="N" />
      |      <Read Number="2" NumCycles="8" IsIndexedRead="Y" />
      |      <Read Number="3" NumCycles="8" IsIndexedRead="Y" IsReverseComplement="Y" />
      |      <Read Number="4" NumCycles="151" IsIndexedRead="N" />
      |    </Reads>
      |    <FlowcellLayout LaneCount="2" SurfaceCount="2" SwathCount="1" TileCount="19" />
      |  </Run>
      |</RunInfo>
      |""".stripMargin

  val interOpDump: String =
    """# Version: v1.3.1
      |# Q2030
      |Lane,Tile,Cycle,QScore
      |1,1101,1,35
      |1,1101,2,34
      |# Tile
      |Lane,Tile,Density
      |1,1101,2355.0
      |2,1102,2370.0
      |""".stripMargin
}

class SampleSheetSpec extends AnyFunSuite {
  import SparkTestSession._
  import GenomicsFixtures._

  private lazy val sheet = SampleSheet.parse(sampleSheetV1)

  test("parses sections, columns and rows") {
    assert(!sheet.isV2)
    assert(sheet.sectionMap.contains("Header") && sheet.sectionMap.contains("Reads"))
    assert(sheet.columns.head == "Lane" && sheet.rows.size == 3)
  }

  test("round-trips through format/parse") {
    val again = SampleSheet.parse(sheet.format)
    assert(again.columns == sheet.columns && again.rows == sheet.rows)
    assert(again.sectionMap("Settings") == sheet.sectionMap("Settings"))
  }

  test("toDF + case-insensitive include/exclude filter") {
    val df = SampleSheet.toDF(spark, sheet)
    assert(df.count() == 3)
    assert(SampleSheet.filterRows(df, "Description", "10x").count() == 1)
    assert(SampleSheet.filterRows(df, "Description", "10X", include = false).count() == 2)
  }

  test("pseudo-lane explode: NextSeq x4, MiSeq x1") {
    val df = SampleSheet.toDF(spark, sheet)
    assert(SampleSheet.pseudoLaneExplode(df, "NEXTSEQ500").count() == 12)
    assert(SampleSheet.pseudoLaneExplode(df, "MISEQ").count() == 3)
  }

  test("index cleanup builds composite index") {
    import org.apache.spark.sql.functions._
    val df = SampleSheet.withCleanIndexes(SampleSheet.toDF(spark, sheet))
    val c = df.filter(col("Sample_ID") === "IGF0001").head().getAs[String]("c_index")
    assert(c == "ATTACTCG+AGGCTATA")
    val single = df.filter(col("Sample_ID") === "IGF0003").head().getAs[String]("c_index")
    assert(single == "SI-GA-A1")
  }

  test("index length census counts per length") {
    val df = SampleSheet.toDF(spark, sheet)
    val census = SampleSheet.indexLengthCensus(
      SampleSheet.filterRows(df, "Description", "10X", include = false))
    assert(census("index") == Map(8 -> 2L))
    assert(census("index2") == Map(8 -> 2L))
  }

  test("bases mask from census + RunInfo layout") {
    val ri = RunInfoXml.parse(runInfoXml)
    assert(ri.laneCount == 2 && ri.reads.size == 4)
    assert(ri.reads(2).isReverseComplement.contains(true))
    val mask = BasesMask.calculate(Map("index" -> Map(8 -> 2L), "index2" -> Map(8 -> 2L)),
      ri.reads)
    assert(mask == "y151,i8,i8,y151")
    val masked = BasesMask.calculate(Map("index" -> Map(8 -> 2L)), ri.reads)
    assert(masked == "y151,i8,n8,y151")
    val offset = BasesMask.calculate(Map("index" -> Map(6 -> 2L), "index2" -> Map(6 -> 2L)),
      ri.reads)
    assert(offset == "y151,i6n2,i6n2,y151")
  }

  test("InterOp dump parses into per-section tables") {
    val sections = InterOp.parse(interOpDump)
    assert(sections.map(_.name) == Seq("Version: v1.3.1", "Q2030", "Tile"))
    val dfs = InterOp.toDFs(spark, sections)
    assert(dfs("Q2030").count() == 2)
    assert(dfs("Tile").columns.toSeq == Seq("Lane", "Tile", "Density"))
  }
}
