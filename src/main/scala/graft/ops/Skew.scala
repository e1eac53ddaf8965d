package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling join helpers for 100 TB plans.
  *
  * AQE's skew-join splitting covers shuffle joins after the fact; explicit
  * salting is the planning-time tool when a known hot key (a stop-shingle,
  * a null-heavy FK, one giant customer) would otherwise pin a single task.
  * The large side gets a random salt in [0, factor); the small side is
  * replicated across all salt values via a literal explode — the join key
  * becomes (key, salt), spreading each hot key over `factor` tasks. Results
  * are identical to the unsalted join (the salt is dropped).
  */
object Skew {

  /** Inner equi-join with the left (large, skewed) side salted and the
    * right (small) side replicated ×factor. */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 factor: Int): DataFrame = {
    require(factor > 0)
    val salted = large.withColumn("__salt",
      (rand(seed = 42) * factor).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(array((0 until factor).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Salted aggregation: two-stage groupBy for hot grouping keys — partial
    * aggregate on (key, salt), final on key. `partials` maps each partial
    * aggregate column to its re-combiner (e.g. "cnt" -> sum). */
  def saltedAgg(df: DataFrame, key: String, factor: Int,
                partial: Seq[Column], finalAgg: Seq[Column]): DataFrame = {
    require(factor > 0)
    df.withColumn("__salt", (rand(seed = 42) * factor).cast("int"))
      .groupBy(col(key), col("__salt"))
      .agg(partial.head, partial.tail: _*)
      .groupBy(col(key))
      .agg(finalAgg.head, finalAgg.tail: _*)
  }
}
