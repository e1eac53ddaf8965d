package graft.similarity

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor — the partition-based
  * scale path beside [[Knn.lshBuckets]].
  *
  * Build: k-means the corpus (spark.ml, seeded → deterministic), store each
  * vector under its centroid id. Search: rank centroids per query (k is
  * small → a broadcast literal, no shuffle), probe the `nProbes` nearest
  * inverted lists, score only those vectors. Cost per query drops from
  * |corpus| to ~nProbes·|corpus|/k; recall is tuned by nProbes. At 100 TB
  * the inverted lists are written bucketed by centroid id so a probe is a
  * partition-pruned scan, not a shuffle.
  */
object Ivf {

  final case class Model(centroids: Array[(Int, Array[Double])], lists: DataFrame)

  /** Cluster the corpus; `lists` = (id, vec, centroid). */
  def build(emb: DataFrame, k: Int, seed: Long = 42L): Model = {
    import org.apache.spark.ml.functions.array_to_vector
    val assembled = emb.withColumn("features",
      array_to_vector(col("vec").cast("array<double>")))
    val model = new KMeans().setK(k).setSeed(seed).setFeaturesCol("features")
      .fit(assembled)
    val lists = model.transform(assembled)
      .select(col("id"), col("vec"), col("prediction").as("centroid"))
    val centroids = model.clusterCenters.zipWithIndex
      .map { case (v, i) => i -> v.toArray }
    Model(centroids, lists)
  }

  /** Top-k cosine neighbors per query, probing the nProbes nearest
    * centroids. Queries: (id, vec). */
  def search(spark: SparkSession, model: Model, queries: DataFrame,
             k: Int, nProbes: Int): DataFrame = {
    import spark.implicits._
    val cents = model.centroids.toSeq
      .map { case (i, v) => (i, v.map(_.toFloat).toSeq) }
      .toDF("centroid", "cvec")
    // rank centroids per query — k×|queries| rows, broadcast side tiny
    val probes = queries.select(col("id").as("qid"), col("vec").as("qvec"))
      .crossJoin(broadcast(cents))
      .withColumn("sim", Knn.cosineFast(col("qvec"), col("cvec")))
      .withColumn("crk", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("centroid"))))
      .filter(col("crk") <= nProbes)
      .select("qid", "qvec", "centroid")
    // probe the inverted lists
    val scored = probes.join(model.lists, Seq("centroid"))
      .filter(col("qid") =!= col("id"))
      .select(col("qid"), col("id").as("vec_id"),
        Knn.cosineFast(col("qvec"), col("vec")).as("cos"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }

  /** Incremental index maintenance — the daily-crawl flow for IVF: assign
    * a new batch to the FROZEN centroids (the float-quantized centroids a
    * deployment ships; exact decimal distance, ties to the lower centroid
    * id — deterministic, IvfCurationSpec checks against an independent
    * BigDecimal computation) and append to the inverted lists. No
    * re-clustering, no touch of the existing lists — at 100 TB this is an
    * append to the centroid-bucketed table; centroid drift is handled by
    * periodic rebuilds, the standard IVF posture. */
  def append(spark: SparkSession, model: Model, newEmb: DataFrame): Model = {
    import spark.implicits._
    val cents = model.centroids.toSeq
      .map { case (i, v) => (i, v.map(_.toFloat).toSeq) }
      .toDF("centroid", "cvec")
    val assigned = newEmb.select(col("id"), col("vec"))
      .crossJoin(broadcast(cents))
      // ||q − c||² = q·q − 2 q·c + c·c, every dot exact decimal
      .withColumn("d2",
        Knn.dotExact(col("vec"), col("vec"))
          - lit(2) * Knn.dotExact(col("vec"), col("cvec"))
          + Knn.dotExact(col("cvec"), col("cvec")))
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("d2"), col("centroid"))))
      .filter(col("__rk") === 1)
      .select(col("id"), col("vec"), col("centroid"))
    Model(model.centroids, model.lists.unionByName(assigned))
  }
}
