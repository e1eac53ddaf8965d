package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, engine-independent dataset splitting — the train/val/test
  * assignment a training-data pipeline must make reproducibly: the same
  * row lands in the same split on every engine, every run, every cluster
  * size, with no stored split table.
  *
  * Mechanism: the row key is hashed with md5 (identical bytes on every
  * engine for the same UTF-8 string, unlike engine-private hashes such as
  * Spark's xxhash64 seed conventions) and the first 4 hex chars — 65,536
  * uniform buckets — are compared lexicographically against precomputed
  * hex thresholds. Purely scalar, codegen-friendly, no shuffle, pushes
  * down; adding rows never reassigns existing ones (a random() split
  * reshuffles everything whenever the partition layout changes).
  */
object Sampling {

  /** Split assignment column. `fractions` are (label, weight) in priority
    * order; weights are normalized and converted to cumulative 4-hex-char
    * thresholds, so resolution is 1/65536 ≈ 0.0015%. */
  def md5Split(key: Column, fractions: Seq[(String, Double)]): Column = {
    require(fractions.nonEmpty && fractions.forall(_._2 > 0))
    val total = fractions.map(_._2).sum
    val hex = substring(md5(key.cast("string").cast("binary")), 1, 4)
    var cum = 0.0
    val cases = fractions.init.map { case (label, w) =>
      cum += w / total
      // clamp: float accumulation can push a NON-final cumulative fraction
      // to 1.0, and floor(1.0*65536)=65536 formats as the 5-char '10000',
      // which compares lexicographically BELOW most 4-char hashes and would
      // silently steal ~15/16 of rows from earlier splits
      val threshold = f"${math.min(65535L, math.floor(cum * 65536).toLong)}%04x"
      (label, hex < lit(threshold))
    }
    cases.foldRight(lit(fractions.last._1): Column) { case ((label, cond), rest) =>
      when(cond, label).otherwise(rest)
    }
  }

  /** Keep-predicate for per-row sampling rates (dataset-mixture weighting:
    * each source kept at its target proportion, deterministically). `rate`
    * may be a column, so the mixture spec can live in a joined weights
    * table. Same 4-hex-char buckets as [[md5Split]]. */
  def md5Keep(key: Column, rate: Column): Column = {
    val hex = substring(md5(key.cast("string").cast("binary")), 1, 4)
    val thr = format_string("%04x",
      least(floor(rate * 65536), lit(65535.0)).cast("int"))
    rate >= 1.0 || hex < thr
  }

  /** [[md5Keep]] as DuckDB-portable SQL, for oracle lockstep. */
  def md5KeepSql(keyExpr: String, rateExpr: String): String =
    s"($rateExpr >= 1.0 OR substr(md5(CAST($keyExpr AS VARCHAR)),1,4) " +
      s"< printf('%04x', CAST(least(floor($rateExpr * 65536), 65535) AS INT)))"

  /** Exact stratified sampling: the first ceil(rate·|stratum|) rows of each
    * stratum in md5-of-key order. Unlike [[md5Keep]] (whose per-stratum
    * yield is binomial around the rate), the quota is EXACT per stratum —
    * the guarantee a training-mixture spec usually wants for small strata.
    *
    * Deterministic: the md5 order is a total order (key appended as
    * tiebreaker for identical hashes), engine-portable, and stable under
    * appends — a new row displaces at most one existing selection in its
    * own stratum instead of reshuffling everything.
    *
    * Scale shape: ONE shuffle on the stratum columns; both windows (the
    * count and the rank) share that partitioning. Strata are assumed
    * bounded per key (source × lang, not user-id-like); a skewed stratum
    * sorts on one task — salt via [[Skew]] if a stratum outgrows an
    * executor.
    */
  def stratifiedExact(df: org.apache.spark.sql.DataFrame, strata: Seq[String],
                      key: Column, rateNum: Int, rateDen: Int): org.apache.spark.sql.DataFrame = {
    require(rateNum > 0 && rateDen >= rateNum, s"rate must be in (0,1]: $rateNum/$rateDen")
    val part = org.apache.spark.sql.expressions.Window
      .partitionBy(strata.map(col): _*)
    val hex = md5(key.cast("string").cast("binary"))
    // quota = ceil(n·num/den) in pure integer arithmetic — a float rate
    // would put exact multiples one ulp above the integer and ceil past it
    df.withColumn("__n", count(lit(1)).over(part))
      .withColumn("__rn", row_number().over(
        part.orderBy(hex.asc, key.asc)))
      .filter(col("__rn") <= expr(s"(__n * $rateNum + ${rateDen - 1}) div $rateDen"))
      .withColumnRenamed("__rn", "pick_rank")
      .withColumnRenamed("__n", "n_stratum")
  }

  /** Deterministic global TRAINING ORDER: a seeded md5 permutation of the
    * corpus, materialized as (shard, position-in-shard) — the "global
    * shuffle" every pretraining run makes before writing training shards,
    * WITHOUT a global sort: rows hash-assign to `nShards` shards (one
    * exchange), and each shard sorts independently by the same seeded key —
    * exactly the layout a shard writer needs (`write.partitionBy(shard)`
    * with sortWithinPartitions). Changing `seed` yields a fresh
    * permutation (a new epoch order); appended rows slot into the existing
    * order without moving any previous row's (shard, key) — only ranks
    * after the insertion point shift, and only inside one shard.
    *
    * Engine-portable by the same argument as [[md5Split]]: md5 of the
    * seeded key is identical everywhere; the shard is 8 hex digits mod
    * nShards, the order is the full hash (key as tiebreaker). */
  def trainOrder(df: org.apache.spark.sql.DataFrame, key: Column, seed: Long,
                 nShards: Int): org.apache.spark.sql.DataFrame =
    trainOrder(df, key, seed, nShards, Nil)

  /** [[trainOrder]] with extra partition columns: `pos` restarts per
    * (phaseCols…, shard), so a curriculum schedule (d34) can keep the
    * seeded within-shard permutation while sequencing coarser phases —
    * still no global sort, one exchange on (phase…, shard). */
  def trainOrder(df: org.apache.spark.sql.DataFrame, key: Column, seed: Long,
                 nShards: Int, phaseCols: Seq[String]): org.apache.spark.sql.DataFrame = {
    require(nShards > 0)
    val hex = md5(concat(lit(s"$seed:"), key.cast("string")).cast("binary"))
    df.withColumn("__h", hex)
      .withColumn("shard",
        pmod(conv(substring(col("__h"), 1, 8), 16, 10).cast("long"), lit(nShards))
          .cast("int"))
      .withColumn("pos", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(phaseCols.map(col) :+ col("shard"): _*)
          .orderBy(col("__h").asc, key.asc)))
      .drop("__h")
  }

  /** The same thresholds as DuckDB-portable SQL, for oracle lockstep. */
  def md5SplitSql(keyExpr: String, fractions: Seq[(String, Double)]): String = {
    val total = fractions.map(_._2).sum
    var cum = 0.0
    val whens = fractions.init.map { case (label, w) =>
      cum += w / total
      // same clamp as md5Split — both engines must agree on the threshold
      val threshold = f"${math.min(65535L, math.floor(cum * 65536).toLong)}%04x"
      s"WHEN substr(md5(CAST($keyExpr AS VARCHAR)),1,4) < '$threshold' THEN '$label'"
    }
    s"CASE ${whens.mkString(" ")} ELSE '${fractions.last._1}' END"
  }
}
