package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.similarity.Knn

/** Property check for e16's two-phase top-2 policy: the fast-cosine
  * pruning band (2 * FastCosEps below the observed fast second-best)
  * must never change the result relative to the UNPRUNED exact ranking.
  * Adversarial frames: random centroids plus vectors planted ON cell
  * boundaries (jittered midpoints of two centroids — the thin-margin
  * rows a too-tight band would mis-rank). The reference recomputes every
  * (vector, centroid) cosine through the same exact-decimal expressions
  * with no pruning at all, so the only degree of freedom under test is
  * the band itself.
  */
class AssignMarginPropertySpec extends AnyFunSuite {
  import SparkTestSession._

  test("pruned top-2 equals the unpruned exact ranking on boundary-planted frames") {
    val rnd = new scala.util.Random(421)
    for (trial <- 1 to 6) {
      val k = 3 + rnd.nextInt(6)
      val d = 4 + rnd.nextInt(12)
      // unit-scale values: Knn.dotExact's 9-decimal integer scaling is
      // exact for |v| <= ~1 embeddings (the library's documented domain —
      // testdata spans ±0.49); out-of-range magnitudes overflow the
      // decimal bound by contract
      def gauss(): Array[Float] =
        Array.fill(d)(math.max(-0.9, math.min(0.9, rnd.nextGaussian() * 0.2)).toFloat)
      val cents = Seq.fill(k)(gauss())
      val loose = Seq.fill(10 + rnd.nextInt(10))(gauss())
      // boundary plants: near-midpoints of two random centroids, where
      // cos-to-each is near-equal and the fast/exact gap matters most
      val planted = Seq.fill(8) {
        val a = cents(rnd.nextInt(k)); val b = cents(rnd.nextInt(k))
        a.zip(b).map { case (x, y) =>
          ((x + y) / 2 + rnd.nextGaussian() * 1e-4).toFloat }
      }
      // drop near-zero-norm degenerates (a midpoint of two opposite
      // centroids): their cosine is numerically meaningless on any path
      val vecs = (loose ++ planted)
        .filter(v => math.sqrt(v.map(x => x.toDouble * x).sum) > 1e-3)
      import spark.implicits._
      val all = (cents ++ vecs).zipWithIndex
        .map { case (v, i) => (i.toLong, v) }.toDF("id", "vec")

      val centsDf = broadcast(all.filter(col("id") < k)
        .select(col("id").as("cid"), col("vec").as("cvec"),
          sqrt(Knn.dotExact(col("vec"), col("vec"))).as("cnrm")))
      val exact = all.filter(col("id") >= k).crossJoin(centsDf)
        .select(col("id").as("vec_id"), col("cid"),
          (Knn.dotExact(col("vec"), col("cvec")) /
            (sqrt(Knn.dotExact(col("vec"), col("vec"))) * col("cnrm"))).as("cos"))
      val w = Window.partitionBy("vec_id").orderBy(col("cos").desc, col("cid"))
      val ref = exact.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 2)
        .groupBy("vec_id")
        .agg(max(when(col("rk") === 1, struct(col("cid"), col("cos")))).as("b1"),
          max(when(col("rk") === 2, struct(col("cid"), col("cos")))).as("b2"))
        .select(col("vec_id"), col("b1.cid").as("cid1"), col("b2.cid").as("cid2"),
          col("b1.cos").as("cos1"), col("b2.cos").as("cos2"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3), r.getDouble(4))).toSet

      val got = graft.queries.SimilarityQ.assignMarginFrom(all, nCents = k)
        .select("vec_id", "cid1", "cid2", "cos1", "cos2")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3), r.getDouble(4))).toSet

      assert(got == ref, s"trial $trial (k=$k d=$d): pruned top-2 diverged")
    }
  }
}
