package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryException, Trigger}
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{DocStreams, EmbStreams}

/** The id-space contract the count registries rest on, made a CHECK:
  * the census/histogram/label maintainers refuse a drop whose ids sit
  * at-or-below the committed watermark — loudly, committing nothing —
  * instead of silently double-counting sums nothing can later repair.
  * An in-order feed of the same data then produces the exact batch-twin
  * counts. */
class IdContractSpec extends AnyFunSuite {
  import SparkTestSession._

  private def tmp(tag: String) = Files.createTempDirectory(tag).toString

  /** Stage `df` as two drops in the given id-range ORDER (first range =
    * batch 0), distinct mtimes for deterministic file-stream ordering. */
  private def stage(df: DataFrame, idCol: String,
                    ranges: Seq[(Long, Long)]): String = {
    val dir = tmp("idc-stage")
    for ((lo, hi) <- ranges) {
      df.filter(col(idCol) >= lo && col(idCol) < hi)
        .repartition(1).write.mode("append").parquet(dir)
      Thread.sleep(1100)
    }
    dir
  }

  private def run(w: org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row],
                  ckpt: String): Unit =
    w.option("checkpointLocation", ckpt).trigger(Trigger.AvailableNow())
      .start().awaitTermination()

  private def contractError(body: => Unit): Unit = {
    val e = intercept[StreamingQueryException](body)
    val hit = Iterator.iterate[Throwable](e)(_.getCause).takeWhile(_ != null)
      .exists(c => c.isInstanceOf[IllegalStateException] &&
        c.getMessage.contains("id-space contract violated"))
    assert(hit, s"expected the loud id-space contract error, got: $e")
  }

  private lazy val docs = Tables(spark, sf).documents

  test("sourceCensusStream: an interleaved-id drop fails loudly and " +
       "commits nothing; the in-order feed gives exact batch counts") {
    // batch 0 carries the HIGH id range, batch 1 the low one → violation
    val badStage = stage(docs, "doc_id", Seq((150L, Long.MaxValue), (0L, 150L)))
    val base = tmp("idc-census")
    contractError {
      run(DocStreams.sourceCensusStream(
        DocStreams.readDocumentStream(spark, badStage, Some(1)),
        s"$base/census"), tmp("idc-ckpt"))
    }
    // nothing from the violating batch landed: census == high-range drop
    val want0 = docs.filter(col("doc_id") >= 150).groupBy("source")
      .agg(sum("n_chars").as("c"), count(lit(1)).as("d"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    def census(dir: String) = spark.read.parquet(dir)
      .groupBy("source").agg(sum("n_chars_src").as("c"), sum("n_docs_src").as("d"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(census(s"$base/census") == want0,
      "the refused batch leaked rows into the census registry")
    // replaying the SAME violating feed keeps failing — never half-commits
    contractError {
      run(DocStreams.sourceCensusStream(
        DocStreams.readDocumentStream(spark, badStage, Some(1)),
        s"$base/census"), tmp("idc-ckpt2"))
    }
    // the in-order feed of the same data produces the exact batch census
    val goodStage = stage(docs, "doc_id", Seq((0L, 150L), (150L, Long.MaxValue)))
    val base2 = tmp("idc-census-ok")
    run(DocStreams.sourceCensusStream(
      DocStreams.readDocumentStream(spark, goodStage, Some(1)),
      s"$base2/census"), tmp("idc-ckpt3"))
    val wantAll = docs.groupBy("source")
      .agg(sum("n_chars").as("c"), count(lit(1)).as("d"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(census(s"$base2/census") == wantAll,
      "in-order feed diverged from the batch census")
  }

  test("driftHistStream: re-delivered ids (an exact duplicate drop) fail " +
       "loudly instead of double-counting the histogram") {
    val dir = tmp("idc-drift-stage")
    val drop = docs.filter(col("doc_id") % 2 === 1)
    drop.repartition(1).write.mode("append").parquet(dir)
    Thread.sleep(1100)
    drop.repartition(1).write.mode("append").parquet(dir) // same ids again
    val base = tmp("idc-drift")
    contractError {
      run(DocStreams.driftHistStream(
        DocStreams.readDocumentStream(spark, dir, Some(1)),
        s"$base/hist"), tmp("idc-dckpt"))
    }
    val got = spark.read.parquet(s"$base/hist")
      .groupBy("source", "chars_bin").agg(sum("n").as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val want = drop.groupBy(col("source"),
        least(expr("n_chars div 200"), lit(24L)).as("chars_bin"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == want, "the duplicate drop double-counted the histogram")
  }

  test("cellLabelStream: interleaved vec_ids fail loudly; in-order feed " +
       "matches the stored-registry labels exactly") {
    val evens = Tables(spark, sf).embeddings.filter(col("vec_id") % 2 === 0)
    val cents = graft.store.Registries.kmeansCentroids(spark, sf)
    val badStage = stage(evens, "vec_id", Seq((50L, Long.MaxValue), (0L, 50L)))
    val base = tmp("idc-cell")
    contractError {
      run(EmbStreams.cellLabelStream(
        EmbStreams.readEmbeddingStream(spark, badStage, Some(1)),
        cents, s"$base/labels"), tmp("idc-cckpt"))
    }
    val segs = graft.streaming.RolledSink.dataPaths(spark, s"$base/labels")
    assert(segs.isEmpty ||
        spark.read.parquet(segs: _*).filter(col("id") < 50).count() == 0,
      "the refused batch leaked label rows")
    val goodStage = stage(evens, "vec_id", Seq((0L, 50L), (50L, Long.MaxValue)))
    val base2 = tmp("idc-cell-ok")
    run(EmbStreams.cellLabelStream(
      EmbStreams.readEmbeddingStream(spark, goodStage, Some(1)),
      cents, s"$base2/labels"), tmp("idc-cckpt2"))
    val got = graft.streaming.RolledSink.read(spark, s"$base2/labels")
      .collect().map(r => r.getLong(0) -> r.get(1)).toMap
    val want = graft.store.Registries.cellLabels(spark, sf)
      .collect().map(r => r.getLong(0) -> r.get(1)).toMap
    assert(got == want, "in-order labels diverged from the stored registry")
  }
}
