package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Similarity search over an embedding column (`array<float>`).
  *
  * Brute-force cosine top-k is the correctness baseline: broadcast the
  * (small) query set against the corpus — a shuffle-free map-side cross
  * join — then one window per query for top-k. The scale path is
  * [[lshBuckets]]: random-hyperplane signatures bucket the corpus so each
  * query only scores its bucket (probing neighbor buckets for recall).
  *
  * Numeric policy: dot products accumulate in DECIMAL over the float
  * values (exact, order-independent — see graft.ops.Exact) and close in
  * double, so results are reproducible across partitionings and engines.
  */
object Knn {

  // Element decimal (12,9): rounds floats at 9dp (same as the oracle's
  // DECIMAL(18,9) cast — width is irrelevant to rounding) while keeping the
  // product (25,18) and accumulator (32,18) inside Spark's 38-digit cap so
  // every addition is exact. The lambda cast back to the accumulator type is
  // lossless (sums are far below 10^14) — without it Spark silently drops to
  // scale 17 and the last ulp diverges from the oracle.
  private val D  = DecimalType(12, 9)
  private val DA = DecimalType(32, 18)

  /** Exact decimal dot product of two float arrays, closed as double. */
  def dotExact(a: Column, b: Column): Column =
    aggregate(
      // float→double→decimal: both engines then round the same exact binary
      // value (DuckDB's direct float→decimal scales in float space and
      // drifts at the 8th digit).
      zip_with(a, b, (x, y) => x.cast("double").cast(D) * y.cast("double").cast(D)),
      lit(0).cast(DA),
      (acc, v) => (acc + v).cast(DA)).cast("double")
      // JVM decimal→double is correctly rounded; the DuckDB oracle must
      // route its conversion through VARCHAR to match (its direct
      // decimal→double double-rounds via hugeint above 2^53).

  /** Cosine similarity via exact dots (same IEEE closing both engines). */
  def cosine(a: Column, b: Column): Column =
    dotExact(a, b) / (sqrt(dotExact(a, a)) * sqrt(dotExact(b, b)))

  /** Brute-force top-k cosine neighbors for each query vector.
    * `queries`/`corpus`: (id, vec). Self-matches excluded. */
  def bruteForceKnn(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("id").as("qid"), col("vec").as("qvec"))
    val c = corpus.select(col("id").as("vec_id"), col("vec").as("cvec"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id"), cosine(col("qvec"), col("cvec")).as("cos"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }

  /** All pairs (id_a < id_b) with cosine >= minCos — embedding near-dup.
    * All-pairs is quadratic: at scale route through [[lshBuckets]] and only
    * score within buckets. */
  def nearDupPairs(emb: DataFrame, minCos: Double): DataFrame = {
    val withNorm = emb.select(col("id"), col("vec"),
      sqrt(dotExact(col("vec"), col("vec"))).as("nrm"))
    val a = withNorm.select(col("id").as("id_a"), col("vec").as("va"), col("nrm").as("na"))
    val b = withNorm.select(col("id").as("id_b"), col("vec").as("vb"), col("nrm").as("nb"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (dotExact(col("va"), col("vb")) / (col("na") * col("nb"))).as("cos"))
      .filter(col("cos") >= minCos)
  }

  /** Random-hyperplane LSH signature (`nPlanes`-bit long) per vector —
    * the bucketing key for approximate search. Hyperplane components are
    * drawn from a seeded PRNG at plan-build time: deterministic, identical
    * on every executor, no data shipping. */
  def lshBuckets(emb: DataFrame, dim: Int, nPlanes: Int = 16,
                 seed: Long = 42L): DataFrame = {
    require(nPlanes <= 62, "signature must fit a long")
    val rnd = new scala.util.Random(seed)
    val planes = Seq.fill(nPlanes)(Array.fill(dim)(rnd.nextGaussian()))
    val bits = planes.zipWithIndex.map { case (p, j) =>
      val dot = aggregate(
        zip_with(col("vec"), typedLit(p.toSeq), (x, w) => x.cast("double") * w),
        lit(0.0), (acc, v) => acc + v)
      when(dot > 0, lit(1L << j)).otherwise(lit(0L))
    }
    emb.select(col("id"), col("vec"), bits.reduce(_ bitwiseOR _).as("bucket"))
  }

  /** Approximate top-k: score only within LSH buckets. Recall/cost dial is
    * nPlanes (fewer planes → bigger buckets → higher recall, more work). */
  def approxKnn(emb: DataFrame, dim: Int, k: Int, nPlanes: Int = 8,
                seed: Long = 42L): DataFrame = {
    val bucketed = lshBuckets(emb, dim, nPlanes, seed)
    val a = bucketed.select(col("bucket"), col("id").as("qid"), col("vec").as("qvec"))
    val b = bucketed.select(col("bucket"), col("id").as("vec_id"), col("vec").as("cvec"))
    val scored = a.join(b, Seq("bucket"))
      .filter(col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id"), cosine(col("qvec"), col("cvec")).as("cos"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }
}
