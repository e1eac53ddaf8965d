package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.MinHashLsh

class MinHashSigSpec extends AnyFunSuite {
  import SparkTestSession._

  test("one-pass aggregate produces identical signatures to k min-columns") {
    val docs = Tables(spark, sf).documents
    val p = MinHashLsh.Params(numHashes = 32)
    val agg = MinHashLsh.signatures(docs, "doc_id", "text", p)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val cols = MinHashLsh.signaturesColumns(docs, "doc_id", "text", p)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(agg.keySet == cols.keySet)
    agg.foreach { case (id, sig) => assert(sig == cols(id), s"doc $id") }
  }

  test("one-pass simhash aggregate matches the 64-sum-columns formulation") {
    val docs = Tables(spark, sf).documents
    val agg = graft.dedup.SimHash.simhashes(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cols = graft.dedup.SimHash.simhashesColumns(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(agg == cols)
  }

  test("signatures are deterministic across runs and partitionings") {
    val docs = Tables(spark, sf).documents
    val a = MinHashLsh.signatures(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val b = MinHashLsh.signatures(docs.repartition(7), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(a == b)
  }
}
