package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.store.BucketedStore

/** Partition-pruned MERGE: upserts rewrite ONLY buckets containing touched
  * keys; untouched buckets keep their exact prior files (same paths, same
  * bytes) via the manifest. */
class BucketedStoreSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def newStore(): (BucketedStore, String) = {
    val dir = Files.createTempDirectory("bucketed_store").toString
    (new BucketedStore(spark, dir, numBuckets = 16), dir)
  }

  private val base = (1 to 500).map(i => (i.toLong, s"name_$i", s"v0"))
    .toDF("id", "name", "payload")

  test("create + read round-trips") {
    val (st, _) = newStore()
    st.create("t", base, Seq("id"))
    assert(st.read("t").count() == 500)
    assert(st.read("t").filter(col("id") === 42 && col("name") === "name_42").count() == 1)
  }

  test("upsert rewrites only touched buckets; untouched files are identical") {
    val (st, _) = newStore()
    st.create("t", base, Seq("id"))
    val before = (0 until 16).map(b => b -> st.bucketFiles("t", b)).toMap
    val beforeBytes = before.map { case (b, fs) =>
      b -> fs.map(f => Files.readAllBytes(Paths.get(f)).toSeq)
    }

    val incoming = Seq((42L, "name_42", "v1"), (9999L, "brand_new", "v1"))
      .toDF("id", "name", "payload")
    val touched = st.upsert("t", incoming, Seq("id"))
    assert(touched.nonEmpty && touched.size <= 2)

    // untouched buckets: same physical files, byte-identical
    for (b <- (0 until 16).filterNot(touched)) {
      assert(st.bucketFiles("t", b) == before(b), s"bucket $b files moved")
      val nowBytes = st.bucketFiles("t", b)
        .map(f => Files.readAllBytes(Paths.get(f)).toSeq)
      assert(nowBytes == beforeBytes(b), s"bucket $b bytes changed")
    }
    // touched buckets DID move to a new version
    touched.foreach { b =>
      assert(st.bucketFiles("t", b) != before(b), s"bucket $b not rewritten")
    }
    // merge semantics: replacement + insert, no dup
    val after = st.read("t")
    assert(after.count() == 501)
    assert(after.filter(col("id") === 42).select("payload").head.getString(0) == "v1")
    assert(after.filter(col("id") === 9999).count() == 1)
    assert(after.filter(col("id") === 41).select("payload").head.getString(0) == "v0")
  }

  test("upsert is idempotent on replay") {
    val (st, _) = newStore()
    st.create("t", base, Seq("id"))
    val incoming = Seq((7L, "name_7", "v2")).toDF("id", "name", "payload")
    st.upsert("t", incoming, Seq("id"))
    st.upsert("t", incoming, Seq("id"))
    val after = st.read("t")
    assert(after.count() == 500)
    assert(after.filter(col("id") === 7 && col("payload") === "v2").count() == 1)
  }

  test("delete prunes to touched buckets and removes rows") {
    val (st, _) = newStore()
    st.create("t", base, Seq("id"))
    val before = (0 until 16).map(b => b -> st.bucketFiles("t", b)).toMap
    val touched = st.delete("t", Seq(1L, 2L).toDF("id"), Seq("id"))
    assert(st.read("t").count() == 498)
    for (b <- (0 until 16).filterNot(touched))
      assert(st.bucketFiles("t", b) == before(b))
  }

  test("upsert into an empty bucket of an existing table inserts cleanly") {
    val (st, _) = newStore()
    // tiny table: most of the 16 buckets are empty on disk
    st.create("t", Seq((1L, "a")).toDF("id", "v"), Seq("id"))
    (2L to 40L).foreach { i =>
      st.upsert("t", Seq((i, s"v$i")).toDF("id", "v"), Seq("id"))
    }
    assert(st.read("t").count() == 40)
  }
}
