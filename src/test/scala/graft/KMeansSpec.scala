package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.similarity.KMeansExact

/** Integer-exact Lloyd k-means: the distributed trainer must equal the
  * local reference bit-for-bit on any partitioning (integer sums are
  * order-independent — the property the cross-engine oracle also rests
  * on), and the rounding/empty-cluster rules must match their spec. */
class KMeansSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("halfEvenDiv is BigDecimal HALF_EVEN division") {
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 2000) {
      val s = rnd.nextLong() % 1000000L
      val n = rnd.nextInt(999) + 1L
      val expect = BigDecimal(s).bigDecimal
        .divide(BigDecimal(n).bigDecimal, 0, java.math.RoundingMode.HALF_EVEN)
        .longValueExact()
      assert(KMeansExact.halfEvenDiv(s, n) == expect, s"s=$s n=$n")
    }
  }

  private def randomPoints(n: Int, dims: Int, seed: Int): Seq[(Long, Array[Long])] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(i => (i.toLong, Array.fill(dims)(rnd.nextInt(2001) - 1000L)))
  }

  test("distributed lloyd equals the local reference on any partitioning") {
    val pts = randomPoints(300, 8, seed = 5)
    val init = pts.take(4).map { case (id, v) => (id.toInt, v) }
    val local = KMeansExact.lloydLocal(pts, init, rounds = 3)
    for (parts <- Seq(1, 7)) {
      val df = pts.map { case (id, v) => (id, v.toSeq) }.toDF("id", "q")
        .repartition(parts)
      val dist = KMeansExact.lloyd(spark, df, init, rounds = 3)
      assert(dist.map(c => (c.cid, c.vec.toSeq, c.nMembers)) ==
        local.map(c => (c.cid, c.vec.toSeq, c.nMembers)), s"parts=$parts")
    }
  }

  test("a cluster that loses all members keeps its previous centroid") {
    val pts = Seq(
      (0L, Array(0L, 0L)), (1L, Array(2L, 0L)), (2L, Array(0L, 2L)),
      (3L, Array(100L, 100L)), (4L, Array(102L, 100L)))
    val init = Seq(0 -> Array(1L, 1L), 1 -> Array(101L, 100L),
      2 -> Array(100000L, 100000L))
    val df = pts.map { case (id, v) => (id, v.toSeq) }.toDF("id", "q")
    val got = KMeansExact.lloyd(spark, df, init, rounds = 2)
    val byCid = got.map(c => c.cid -> c).toMap
    assert(byCid(2).vec.toSeq == Seq(100000L, 100000L) && byCid(2).nMembers == 0L)
    assert(byCid(0).nMembers == 3L && byCid(1).nMembers == 2L)
    // round-2 centroid of cluster 0: half-even mean of its 3 members
    assert(byCid(0).vec.toSeq == Seq(
      KMeansExact.halfEvenDiv(0L + 2 + 0, 3), KMeansExact.halfEvenDiv(0L + 0 + 2, 3)))
  }

  test("quantize is exact: float * 1024 then half-even, as integers") {
    val df = Seq((1L, Seq(0.5f, -0.25f, 0.0001220703125f /* 2^-13 */)))
      .toDF("id", "vec")
    val q = KMeansExact.quantize(df).collect().head.getSeq[Long](1)
    // 0.5*1024 = 512; -0.25*1024 = -256; 2^-13*1024 = 0.125 -> rounds to 0
    assert(q == Seq(512L, -256L, 0L))
  }
}
