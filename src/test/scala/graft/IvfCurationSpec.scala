package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.Shingles
import graft.pipelines.Curation
import graft.similarity.{Ivf, Knn}
import graft.sources.SampleSheet
import graft.streaming.EventStreams

class IvfCurationSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val emb = Tables(spark, sf).embeddings
    .select(col("vec_id").as("id"), col("embedding").as("vec"))

  test("IVF search: correct scores, recall grows with nProbes") {
    val model = Ivf.build(emb, k = 8)
    assert(model.centroids.length == 8)
    val queries = emb.filter(col("id") < 10)
    val brute = Knn.bruteForceKnn(queries, emb, k = 5)
      .select("qid", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(nProbes: Int): Double = {
      val got = Ivf.search(spark, model, queries, k = 5, nProbes = nProbes)
        .select("qid", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      brute.count(got.contains).toDouble / brute.size
    }
    val r1 = recall(1); val r4 = recall(4); val r8 = recall(8)
    assert(r8 >= r4 - 1e-9 && r4 >= r1 - 1e-9)
    assert(r8 > 0.95, s"probing every list must recover brute force, got $r8")
  }

  test("IVF append assigns new vectors to the frozen centroids exactly") {
    val oldE = emb.filter(col("id") % 2 === 0)
    val newE = emb.filter(col("id") % 2 === 1 && col("id") < 200)
    val m = Ivf.build(oldE, k = 4)
    val m2 = Ivf.append(spark, m, newE)
    // old lists untouched, every new id present exactly once
    assert(m2.lists.filter(col("id") % 2 === 0).count() == m.lists.count())
    val appended = m2.lists.filter(col("id") % 2 === 1).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Int]("centroid")).toMap
    assert(appended.size == newE.count())
    // independent assignment check: dotExact quantizes each float to
    // round_even(double·1e9); replicate the integer arithmetic in BigInt
    // and demand the identical argmin (ties to the lower centroid id)
    def q9(x: Float): BigInt = BigInt(math.rint(x.toDouble * 1e9).toLong)
    val cents = m.centroids.map { case (i, v) => i -> v.map(_.toFloat) }
    val vecs = newE.collect()
      .map(r => r.getAs[Long]("id") -> r.getSeq[Float](1).toArray).toMap
    vecs.foreach { case (id, v) =>
      val best = cents.map { case (ci, cv) =>
        val d2 = v.indices.map { j =>
          val d = q9(v(j)) - q9(cv(j)); d * d
        }.sum
        (d2, ci)
      }.minBy(identity)._2
      assert(appended(id) == best,
        s"vector $id assigned to ${appended(id)}, independent argmin says $best")
    }
  }

  test("curation pipeline: monotone counts, near-dups actually removed") {
    val docs = Tables(spark, sf).documents
    val (survivors, rep) = Curation.curate(docs, "doc_id", "text",
      minQuality = 0.2, minEstJaccard = 0.5)
    assert(rep.nInput >= rep.nAfterQuality)
    assert(rep.nAfterQuality >= rep.nAfterExact)
    assert(rep.nAfterExact >= rep.nAfterNearDup)
    assert(rep.nAfterNearDup == survivors.count())
    assert(rep.nAfterNearDup > 0)
    // no exact near-dup pair (at the ground-truth threshold) survives whole
    val remaining = Shingles.jaccardPairs(survivors, "doc_id", "text", 3, 0.9)
    assert(remaining.count() == 0)
  }

  test("per-lane samplesheet split truncates and dedups composite indexes") {
    import spark.implicits._
    val df = Seq(
      ("1", "IGF01", "ATTACTCGAA", "AGGCTATA"),
      ("1", "IGF02", "TCCGGA", "GCCTCTAT"),   // shorter index1 -> lane min 6
      ("1", "IGF03", "ATTACT", "AGGCTATA"),   // after truncation == IGF01 -> dedup
      ("2", "IGF04", "GGGGCC", "TTTTAA"))
      .toDF("Lane", "Sample_ID", "index", "index2")
    val lane1 = SampleSheet.perLaneSheet(df, "1")
    val rows = lane1.orderBy("Sample_ID").collect()
    assert(rows.forall(_.getAs[String]("index").length == 6))
    assert(rows.length == 2) // IGF03 collapsed into IGF01's composite
    assert(rows.map(_.getAs[String]("Sample_ID")).toSet == Set("IGF01", "IGF02"))
  }

  test("streaming dedup drops re-delivered events within the watermark") {
    val d = java.nio.file.Files.createTempDirectory("dup-stream")
    java.nio.file.Files.copy(java.nio.file.Paths.get(s"$sf/events.parquet"),
      d.resolve("a.parquet"))
    java.nio.file.Files.copy(java.nio.file.Paths.get(s"$sf/events.parquet"),
      d.resolve("b.parquet")) // same batch delivered twice
    val ckpt = java.nio.file.Files.createTempDirectory("ckpt").toString
    val q = EventStreams.dedupStream(EventStreams.readEventStream(spark, d.toString))
      .writeStream.outputMode("append").format("memory").queryName("dedup")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val n = spark.table("dedup").count()
    val distinct = Tables(spark, sf).events.select("event_id").distinct().count()
    assert(n == distinct)
  }
}
