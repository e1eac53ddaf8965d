package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.SimilarityQ
import graft.similarity.Knn

/** e19/e20 — incremental near-dup over the ADAPTIVE-plane stored bucket
  * registry. Mechanism laws here; the cross-scale candidate-budget and
  * in-promise recall gates live in tools/ScaleInvariants (run per
  * rehearsal scale) and the cell-exact contract in the DuckDB oracle.
  */
class AdaptiveNearDupSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val emb = Tables(spark, sf).embeddings
    .select(col("vec_id").as("id"), col("embedding").as("vec"))
  private lazy val newE = emb.filter(col("id") % 2 === 1)
  private lazy val oldE = emb.filter(col("id") % 2 === 0)

  test("adaptiveEmbPlanes is the e18 law applied to the history count") {
    val nEven = oldE.count()
    assert(graft.store.Registries.adaptiveEmbPlanes(spark, sf) ==
      SimilarityQ.adaptivePlanes(nEven))
  }

  test("candidate rule is pair-symmetric hamming <= nFlip (non-exhaustive p)") {
    // force a plane count where 2-flip probing is NOT exhaustive so the
    // equivalence is tested on the mechanism, not on trivial saturation
    val p = 6
    val stored = Knn.lshBuckets(oldE, dim = 64, nPlanes = p)
      .select(col("id"), col("bucket"))
    val cand = Knn.adaptiveBucketCandidates(newE, stored,
      dim = 64, nPlanes = p, nFlip = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // direct form: every new-touching signature pair within hamming 2
    val sigs = Knn.lshBuckets(emb, dim = 64, nPlanes = p)
      .select(col("id"), col("bucket")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val direct = (for {
      (ia, ba) <- sigs; (ib, bb) <- sigs
      if ia < ib && (ia % 2 == 1 || ib % 2 == 1)
      if java.lang.Long.bitCount(ba ^ bb) <= 2
    } yield (ia, ib)).toSet
    assert(cand == direct)
  }

  test("probe set grows monotonically in nFlip and nFlip=0 is the exact-bucket join") {
    val p = 6
    val stored = Knn.lshBuckets(oldE, dim = 64, nPlanes = p)
      .select(col("id"), col("bucket"))
    def cands(f: Int) = Knn.adaptiveBucketCandidates(newE, stored,
      dim = 64, nPlanes = p, nFlip = f)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val (c0, c1, c2) = (cands(0), cands(1), cands(2))
    assert(c0.subsetOf(c1) && c1.subsetOf(c2))
    val exact = cands(0)
    val sigs = Knn.lshBuckets(emb, dim = 64, nPlanes = p)
      .select(col("id"), col("bucket")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val sameBucket = (for {
      (ia, ba) <- sigs; (ib, bb) <- sigs
      if ia < ib && (ia % 2 == 1 || ib % 2 == 1) && ba == bb
    } yield (ia, ib)).toSet
    assert(exact == sameBucket)
  }

  test("e19 output: id-ordered, new-touching, unique, exact cos >= 0.4") {
    val rows = SimilarityQ.incrementalNearDupAdaptive(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)))
    assert(rows.forall(r => r.getLong(0) % 2 == 1 || r.getLong(1) % 2 == 1))
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).distinct.length == rows.length)
    assert(rows.forall(_.getAs[Double]("cos") >= 0.4))
  }

  test("at driver scale the probes are exhaustive: e19 == e07 exactly") {
    val p = graft.store.Registries.adaptiveEmbPlanes(spark, sf)
    assert(p <= 2, s"fixture grew past the exhaustive-probe regime (p=$p); " +
      "move this equality to a planted sub-corpus")
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), math.round(r.getAs[Double]("cos") * 1e9))
    val e19 = SimilarityQ.incrementalNearDupAdaptive(spark, sf).collect().map(key).toSet
    val e07 = SimilarityQ.incrementalNearDup(spark, sf).collect().map(key).toSet
    assert(e19 == e07)
  }

  test("e20: clusters are CC over e19 pairs with min-id labels, one keep each") {
    val cl = SimilarityQ.semDedupAdaptive(spark, sf).collect()
    assert(cl.nonEmpty)
    val byCluster = cl.groupBy(_.getAs[Long]("cluster_id"))
    byCluster.foreach { case (cid, members) =>
      assert(members.map(_.getAs[Long]("vec_id")).min == cid) // min-id label
      assert(members.count(_.getAs[Boolean]("keep")) == 1)    // one representative
      assert(members.forall(_.getAs[Long]("n_members") == members.length))
    }
    // every e19 pair's endpoints share a cluster
    val label = cl.map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cluster_id")).toMap
    SimilarityQ.incrementalNearDupAdaptive(spark, sf).collect().foreach { r =>
      assert(label(r.getLong(0)) == label(r.getLong(1)))
    }
  }
}
