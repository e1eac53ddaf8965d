package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorExpressions

/** Deterministic, cross-engine-EXACT Lloyd k-means over integer-quantized
  * embeddings — the clustering engine under SemDeDup (e05) and IVF (e04),
  * exposed as a trainable operator rather than a fixed assignment.
  *
  * Everything is integer arithmetic end to end, which is what makes a
  * cell-exact DuckDB oracle possible with no float policy:
  *   - points quantize once to `round_even(x · 1024)` — 1024 is a power of
  *     two, so the product is EXACT in IEEE doubles and both engines round
  *     the identical value (no 1e9-style double-rounding analysis needed);
  *   - distances are exact integer squared-Euclidean
  *     ([[graft.functions.IntVecSqDist]], codegen'd — ties break to the
  *     lower centroid id);
  *   - each round's new centroid is the HALF-EVEN-ROUNDED integer mean of
  *     its members, computed from exact integer sums (order-independent,
  *     so any partitioning/combine schedule yields the same model);
  *     clusters that lose all members keep their previous centroid.
  *
  * Execution shape per round (the spark.ml KMeans architecture): assignment
  * is a broadcast of k·dims integers against one scan of the points — the
  * per-point argmin collapses map-side (partial `min(struct)`), so the
  * shuffle carries one row per point; the centroid update explodes each
  * point's dims AFTER assignment into a partial hash-sum whose shuffle is
  * k·dims rows per partition. The driver holds k·dims longs between rounds
  * (a driver-scale contract point, as in spark.ml), never the corpus.
  */
object KMeansExact {

  /** Quantization scale: 2^10 — float·1024 is exact, see object doc. */
  val Scale = 1024

  final case class Centroid(cid: Int, vec: Array[Long], nMembers: Long)

  /** Quantize `(id, vec: array<float>)` to `(id, q: array<long>)` — one
    * codegen'd loop ([[graft.functions.QuantizeVec]]); bit-identical to
    * the `transform`+`bround` HOF it replaces (rint == bround: IEEE
    * half-even on the exact double x·1024), which was interpreted and
    * allocated per element on every assignment/encode scan. */
  def quantize(emb: DataFrame): DataFrame =
    emb.select(col("id"), graft.functions.ModelArgmin.quantizeVec(col("vec")).as("q"))

  /** Half-even-rounded integer mean of an exact integer sum (n > 0). */
  private[graft] def halfEvenDiv(s: Long, n: Long): Long = {
    val r = ((s % n) + n) % n // pmod: 0 <= r < n
    val base = (s - r) / n    // floor division, exact
    val twice = 2 * r
    if (twice > n) base + 1
    else if (twice < n) base
    else base + (base & 1L) // tie: to even
  }

  /** One assignment pass: each point to its min-squared-distance centroid
    * (ties to the lower cid) — a PURE MAP against the model as a plan
    * literal ([[graft.functions.QuantArgminId]], codegen'd;
    * PlanQualitySpec gates the exchange-free shape). `centsDf` is (cid,
    * cq: array<long>), k rows by contract — collected at plan-build time
    * (the bounded driver-scale contract point the broadcast already was).
    * r14's plans showed the old crossJoin → groupBy(id) → min(struct)
    * formulation paying Sort + SortAggregate + Exchange over n·k rows
    * per pass: struct min cannot hash-aggregate. */
  private[graft] def assign(points: DataFrame, centsDf: DataFrame): DataFrame =
    assignIds(points, centsDf).select(col("cid"), col("q"))

  /** [[assign]] keeping the point id: (id, cid, q). */
  private[graft] def assignIds(points: DataFrame, centsDf: DataFrame): DataFrame = {
    val (ids, cands) = graft.functions.ModelArgmin.collectModel(centsDf, "cid", "cq")
    assignIdsLocal(points, ids, cands)
  }

  /** [[assignIds]] against a driver-resident model (the [[lloyd]] loop,
    * which holds the centroids between rounds anyway). */
  private[graft] def assignIdsLocal(points: DataFrame, ids: Seq[Int],
                                    cands: Seq[Seq[Long]]): DataFrame =
    points.select(col("id"),
      graft.functions.ModelArgmin.quantArgminId(col("q"), ids, cands).as("cid"),
      col("q"))

  /** `rounds` full Lloyd iterations (assign → update) from the k seed
    * centroids `init` (cid, quantized vec). Returns the final integer
    * centroids with their LAST-assignment member counts. */
  def lloyd(spark: SparkSession, points: DataFrame, init: Seq[(Int, Array[Long])],
            rounds: Int): Seq[Centroid] = {
    import spark.implicits._
    require(rounds >= 1 && init.nonEmpty)
    val dims = init.head._2.length
    var cents: Seq[(Int, Array[Long])] = init
    var counts: Map[Int, Long] = Map.empty
    for (_ <- 1 to rounds) {
      val sorted = cents.sortBy(_._1)
      val assigned = assignIdsLocal(points, sorted.map(_._1),
          sorted.map(_._2.toIndexedSeq))
        .select(col("cid"), col("q"))
      // per-dim exact integer sums; k·dims rows reach the driver
      val sums = assigned
        .select(col("cid"), posexplode(col("q")).as(Seq("pos", "v")))
        .groupBy(col("cid"), col("pos"))
        .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
        .collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      val byCid = sums.groupBy(_._1)
      counts = byCid.map { case (cid, rs) => cid -> rs.head._4 }
      cents = cents.map { case (cid, old) =>
        byCid.get(cid) match {
          case Some(rs) =>
            val v = new Array[Long](dims)
            rs.foreach { case (_, pos, s, n) => v(pos) = halfEvenDiv(s, n) }
            cid -> v
          case None => cid -> old // empty cluster: keep previous centroid
        }
      }
    }
    cents.map { case (cid, v) => Centroid(cid, v, counts.getOrElse(cid, 0L)) }
  }

  /** Local reference twin of [[lloyd]] for the spec. */
  private[graft] def lloydLocal(points: Seq[(Long, Array[Long])],
                                     init: Seq[(Int, Array[Long])],
                                     rounds: Int): Seq[Centroid] = {
    var cents = init
    var counts: Map[Int, Long] = Map.empty
    for (_ <- 1 to rounds) {
      val assigned = points.map { case (_, q) =>
        val best = cents.map { case (cid, c) =>
          val d = q.zip(c).map { case (a, b) => val x = a - b; x * x }.sum
          (d, cid)
        }.min
        (best._2, q)
      }
      val byCid = assigned.groupBy(_._1)
      counts = byCid.map { case (cid, ms) => cid -> ms.size.toLong }
      cents = cents.map { case (cid, old) =>
        byCid.get(cid) match {
          case Some(ms) =>
            val n = ms.size.toLong
            cid -> Array.tabulate(old.length)(d =>
              halfEvenDiv(ms.iterator.map(_._2(d)).sum, n))
          case None => cid -> old
        }
      }
    }
    cents.map { case (cid, v) => Centroid(cid, v, counts.getOrElse(cid, 0L)) }
  }
}
