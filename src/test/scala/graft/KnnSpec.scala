package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.similarity.Knn

class KnnSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val emb = Tables(spark, sf).embeddings
    .select(col("vec_id").as("id"), col("embedding").as("vec"))

  test("brute-force knn: k rows per query, descending cosine, no self") {
    val res = Knn.bruteForceKnn(emb.filter(col("id") < 3), emb, k = 5).collect()
    val byQ = res.groupBy(_.getAs[Long]("qid"))
    assert(byQ.size == 3 && byQ.values.forall(_.length == 5))
    byQ.values.foreach { rows =>
      val sorted = rows.sortBy(_.getAs[Int]("rk"))
      val cosines = sorted.map(_.getAs[Double]("cos"))
      assert(cosines.zip(cosines.tail).forall { case (a, b) => a >= b })
      assert(sorted.forall(r => r.getAs[Long]("qid") != r.getAs[Long]("vec_id")))
    }
  }

  test("cosine is symmetric and bounded") {
    val pairs = Knn.nearDupPairs(emb.limit(50), minCos = -1.0).collect()
    assert(pairs.nonEmpty)
    assert(pairs.forall(r => math.abs(r.getAs[Double]("cos")) <= 1.0 + 1e-12))
  }

  test("LSH approximate knn returns correctly-scored subsets of brute force") {
    val brute = Knn.bruteForceKnn(emb, emb, k = 10)
      .select("qid", "vec_id", "cos").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val approx = Knn.approxKnn(emb, dim = 64, k = 10, nPlanes = 4).collect()
    assert(approx.nonEmpty)
    // every approx hit that brute force also ranked must carry the same cos
    approx.foreach { r =>
      brute.get((r.getAs[Long]("qid"), r.getAs[Long]("vec_id"))).foreach { c =>
        // approx path scores in raw double; brute quantizes elements at
        // 9dp for oracle exactness — differences up to ~1e-8 are expected
        assert(math.abs(c - r.getAs[Double]("cos")) < 1e-7)
      }
    }
    // recall of the LSH path at this bucket width: nonzero and reported
    val hits = approx.count(r =>
      brute.contains((r.getAs[Long]("qid"), r.getAs[Long]("vec_id"))))
    assert(hits > 0, "LSH buckets recovered none of the true top-10 pairs")
  }

  test("adversarial near-ties: bounded margin keeps every tied candidate") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // 60 corpus vectors IDENTICAL to the query (cosine exactly 1) plus
    // orthogonal fillers: any fixed rank margin < 60 would drop true
    // top-k members; the error-bound margin must keep them all and the
    // exact rescore must pick the deterministic (vec_id asc) winners.
    val dim = 8
    val unit = Array.fill(dim)(0.0f); unit(0) = 1.0f
    val ortho = Array.fill(dim)(0.0f); ortho(1) = 1.0f
    val corpus = ((1 to 60).map(i => (i.toLong, unit.toSeq)) ++
      (61 to 80).map(i => (i.toLong, ortho.toSeq))).toDF("id", "vec")
    val queries = Seq((1000L, unit.toSeq)).toDF("id", "vec")
    val got = Knn.bruteForceKnn(queries, corpus, k = 5).collect()
    assert(got.length == 5)
    // all five results are exact-cosine 1 ties, broken by vec_id ascending
    assert(got.map(_.getAs[Long]("vec_id")).toSeq == Seq(1L, 2L, 3L, 4L, 5L))
    assert(got.forall(r => math.abs(r.getAs[Double]("cos") - 1.0) < 1e-12))
  }

  test("multi-probe LSH: nFlip=0 is approxKnn; recall is monotone in nFlip") {
    def topSets(df: org.apache.spark.sql.DataFrame) = df
      .filter(col("qid") < 50).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id")))
      .groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).toSet }
    val single = topSets(Knn.approxKnn(emb, dim = 64, k = 10, nPlanes = 6))
    val zero = topSets(Knn.approxKnnMultiProbe(emb, dim = 64, k = 10,
      nPlanes = 6, nFlip = 0))
    assert(zero == single, "nFlip=0 must reproduce single-bucket approxKnn")
    // candidate superset ⇒ the multi-probe top-k DOMINATES per rank: at
    // every rank its cosine is >= the single-bucket one (airtight, unlike
    // a recall comparison, which depends on the fixture's bucket geometry)
    def ranked(df: org.apache.spark.sql.DataFrame) = df
      .filter(col("qid") < 50).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Int]("rk"), r.getAs[Double]("cos")))
      .groupBy(_._1).map { case (q, xs) => q -> xs.sortBy(_._2).map(_._3) }
    val sR = ranked(Knn.approxKnn(emb, dim = 64, k = 10, nPlanes = 6))
    val mR = ranked(Knn.approxKnnMultiProbe(emb, dim = 64, k = 10,
      nPlanes = 6, nFlip = 1))
    assert(sR.keySet.subsetOf(mR.keySet))
    sR.foreach { case (q, sc) =>
      val mc = mR(q)
      assert(mc.length >= sc.length, s"query $q lost candidates under multi-probe")
      sc.zip(mc).foreach { case (s0, m0) =>
        assert(m0 >= s0 - 1e-12, s"query $q: multi-probe rank fell below single-bucket") }
    }
  }

  test("multi-probe candidates are unique per (qid, vec_id) — the no-dedup " +
       "contract of approxKnnMultiProbe") {
    // a query's probe buckets are its signature XOR'd with pairwise-
    // DISTINCT ≤2-bit masks, and a corpus vector sits in exactly one
    // bucket, so each (qid, vec_id) pair can match exactly one probe row;
    // approxKnnMultiProbe relies on this to skip the candidate-frame
    // dedup shuffle entirely (at sf10 that shuffle moved 302M rows and
    // spilled 38 GB for zero semantic effect)
    val nPlanes = 6
    val b = Knn.lshBuckets(emb, dim = 64, nPlanes = nPlanes)
      .select(col("id"), col("bucket"))
    val masks = Seq(0L) ++ (0 until nPlanes).map(1L << _) ++
      (for { i <- 0 until nPlanes; j <- (i + 1) until nPlanes }
        yield (1L << i) | (1L << j))
    assert(masks.distinct.length == masks.length, "probe masks must be distinct")
    val probes = b.select(col("id").as("qid"),
      explode(array(masks.map(m => col("bucket").bitwiseXOR(lit(m))): _*))
        .as("bucket"))
    val dups = probes
      .join(b.select(col("id").as("vec_id"), col("bucket")), Seq("bucket"))
      .filter(col("qid") =!= col("vec_id"))
      .groupBy("qid", "vec_id").count().filter(col("count") > 1).count()
    assert(dups == 0, "a (qid, vec_id) candidate surfaced via two probe buckets")
  }

  test("adaptivePlanes: candidate budget holds, plane count grows with log n") {
    import graft.queries.SimilarityQ.adaptivePlanes
    // the chosen p must satisfy the budget it prices: expected per-query
    // candidates n·(1+p+C(p,2))/2^p <= target — and p-1 must NOT
    // (minimality), except at the p=1 floor
    for (n <- Seq(100L, 2000L, 20000L, 200000L, 2000000L)) {
      val p = adaptivePlanes(n)
      def load(q: Int) = n.toDouble * (1 + q + q * (q - 1) / 2) / (1L << q)
      assert(load(p) <= 512.0 + 1e-9, s"n=$n p=$p busts the candidate budget")
      if (p > 1) assert(load(p - 1) > 512.0, s"n=$n p=$p is not minimal")
    }
    // monotone non-decreasing in n — more corpus never means fewer planes
    val ps = Seq(1L, 10L, 100L, 1000L, 10000L, 100000L, 1000000L)
      .map(adaptivePlanes(_))
    assert(ps == ps.sorted, s"plane count not monotone: $ps")
    // ~log-n growth: a 10x corpus adds a bounded handful of planes
    // (log2(10) ≈ 3.3 for the bucket split plus ~2-3 more because the
    // probe fan-out 1+p+C(p,2) itself grows with p)
    ps.sliding(2).foreach { case Seq(a, b) =>
      assert(b - a <= 7, s"10x corpus added ${b - a} planes: $ps") }
  }

  test("incremental near-dup equals the full rerun restricted to new-touching pairs") {
    val newE = emb.filter(col("id") % 2 === 1)
    val oldE = emb.filter(col("id") % 2 === 0)
    val inc = Knn.incrementalNearDupPairs(newE, oldE, minCos = 0.4)
    val full = Knn.nearDupPairs(emb, minCos = 0.4)
      .filter(col("id_a") % 2 === 1 || col("id_b") % 2 === 1)
    assert(inc.count() > 0, "vacuous: no near-dup pairs touch the new batch")
    assert(inc.except(full).isEmpty && full.except(inc).isEmpty,
      "incremental near-dup diverged from the restricted full rerun")
    // no old-old pair leaks in
    assert(inc.filter(col("id_a") % 2 === 0 && col("id_b") % 2 === 0).count() == 0)
  }

  test("incremental bucket candidates equal the full bucket self-join on new-touching pairs") {
    val newE = emb.filter(col("id") % 2 === 1)
    val oldE = emb.filter(col("id") % 2 === 0)
    val registry = Knn.lshBuckets(oldE, dim = 64, nPlanes = 6)
      .select(col("id"), col("bucket"))
    val (cands, delta) = Knn.incrementalBucketCandidates(
      newE, registry, dim = 64, nPlanes = 6)
    val allBk = Knn.lshBuckets(emb, dim = 64, nPlanes = 6)
    val fullCands = allBk.select(col("id").as("id_a"), col("bucket"))
      .join(allBk.select(col("id").as("id_b"), col("bucket")), Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .filter(col("id_a") % 2 === 1 || col("id_b") % 2 === 1)
      .select("id_a", "id_b").distinct()
    assert(cands.count() > 0, "vacuous: no bucket collisions touch the new batch")
    assert(cands.except(fullCands).isEmpty && fullCands.except(cands).isEmpty,
      "incremental bucket candidates diverged from the full self-join")
    // the registry delta is exactly the new batch's bucket rows
    assert(delta.count() == newE.count())
  }

  test("quadratic guards refuse oversized inputs and are overridable") {
    import spark.implicits._
    val emb = (1 to 50).map(i => (i.toLong, Seq.fill(4)(i.toFloat))).toDF("id", "vec")
    intercept[IllegalArgumentException] {
      Knn.nearDupPairs(emb, 0.9, maxRows = 10)
    }
    // opt-in bypass still computes
    assert(Knn.nearDupPairs(emb, 0.999999, maxRows = 10, allowQuadratic = true)
      .count() > 0)
    intercept[IllegalArgumentException] {
      Knn.bruteForceKnn(emb, emb, k = 1, maxQueryRows = 10)
    }
  }
}
