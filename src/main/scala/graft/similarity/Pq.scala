package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorExpressions

/** Product quantization — the memory-bounded ANN storage path.
  *
  * At 100 TB a float corpus cannot keep raw vectors hot: PQ splits each
  * vector into `m` subspaces, snaps every subvector to its nearest entry
  * in a per-subspace codebook of `k` codewords, and stores only the m
  * code ids (64 dims × 4 bytes → m bytes, a 32× compression at m=8).
  * Query time never touches raw vectors: a query precomputes its m·k
  * subspace distance table once, and every stored vector's approximate
  * (asymmetric, ADC) distance is m table lookups + a sum.
  *
  * Everything is integer arithmetic on [[KMeansExact.quantize]]'s scale-1024
  * quantization, so encode AND search are cross-engine exact and fully
  * oracle-backed (the e06 contract): distances are exact integer squared
  * Euclidean ([[graft.functions.IntVecSqDist]], codegen'd), argmin ties
  * break to the lower code id, top-k ties to the lower vec id.
  *
  * Codebooks here are seed codewords (the first `k` vectors' subvectors —
  * the e04 seeding convention); a production build trains each subspace
  * with [[KMeansExact.lloyd]] over the subvector table and feeds the
  * resulting (sub, code, cq) rows to the same [[encodePerSub]] /
  * [[adcTopK]] — the operators take the codebook as data.
  *
  * Scale shape: the codebook (m·k·(dims/m) longs) and the per-query
  * distance tables (q·m·k rows) are BROADCAST; the corpus is touched by
  * exactly one linear scan per operator, the per-(id,sub) argmin collapses
  * map-side, and the ADC top-k runs through the bounded heap
  * ([[graft.ops.WindowOps.topKBounded]]) so each scan partition ships at
  * most k rows per query. No shuffle ever carries a raw vector.
  */
object Pq {

  /** Split an ALREADY-MATERIALIZED integer-vector column into `m`
    * subvector rows: keeps `keep` columns and adds (sub, subq). The
    * token-array rule applies: `vecCol` must be an attribute of `df`, not
    * a defining expression — the slicing lambda evaluates it per element. */
  def subspaceSplit(df: DataFrame, vecCol: String, dims: Int, m: Int,
                    keep: Seq[String]): DataFrame = {
    require(m > 0 && dims % m == 0, s"m=$m must divide dims=$dims")
    val subdim = dims / m
    df.select(keep.map(col) :+ posexplode(
      transform(sequence(lit(0), lit(m - 1)),
        s => slice(col(vecCol), s * subdim + 1, lit(subdim))))
      .as(Seq("sub", "subq")): _*)
  }

  /** (id, sub, subq) — quantized subvectors, `m` rows per vector. */
  def quantSubvectors(emb: DataFrame, dims: Int, m: Int): DataFrame =
    subspaceSplit(KMeansExact.quantize(emb), "q", dims, m, keep = Seq("id"))

  /** Seed codebook: (sub, code, cq) from the first `k` vectors. */
  def seedCodebook(emb: DataFrame, dims: Int, m: Int, k: Int): DataFrame =
    quantSubvectors(emb.filter(col("id") < k), dims, m)
      .select(col("sub"), col("id").cast("int").as("code"), col("subq").as("cq"))

  /** Per-subspace assignment: (id, sub, code, d) — each subvector to its
    * min-squared-distance codeword (ties to the lower code). One corpus
    * scan, the full per-vector encode computed as ONE codegen'd loop
    * against the codebook as a plan literal
    * ([[graft.functions.PqEncodeVec]] — m·k rows by contract, collected
    * at plan-build time) and exploded to the m-row shape; r14's plans
    * showed the old subspaceSplit → broadcast join → groupBy(id, sub) →
    * min(struct) chain paying Sort + SortAggregate + Exchange over
    * n·m·k rows (struct min cannot hash-aggregate). */
  def encodePerSub(emb: DataFrame, cb: DataFrame, dims: Int, m: Int): DataFrame = {
    val (codeIds, cbs) = graft.functions.ModelArgmin.collectCodebook(cb, m)
    KMeansExact.quantize(emb)
      .select(col("id"),
        explode(graft.functions.ModelArgmin.pqEncodeVec(col("q"), dims / m,
          codeIds, cbs)).as("e"))
      .select(col("id"), col("e.sub").as("sub"), col("e.code").as("code"),
        col("e.d").as("d"))
  }

  /** PQ encode: one row per vector — the stored representation plus its
    * exact integer reconstruction error (the quantization-quality metric a
    * curation run monitors when it sizes m and k). The per-vector encode
    * array is already in subspace order, so code_str and recon_err fold
    * per row with NO aggregation at all (the old shape paid a second
    * corpus exchange for collect_list + sum); the m getItem references
    * share one evaluation via whole-stage-codegen subexpression
    * elimination. */
  def encode(emb: DataFrame, cb: DataFrame, dims: Int, m: Int): DataFrame = {
    val (codeIds, cbs) = graft.functions.ModelArgmin.collectCodebook(cb, m)
    val enc = KMeansExact.quantize(emb)
      .select(col("id"),
        graft.functions.ModelArgmin.pqEncodeVec(col("q"), dims / m,
          codeIds, cbs).as("e"))
    enc.select(col("id").as("vec_id"),
      concat_ws("-",
        (0 until m).map(i =>
          col("e").getItem(i).getField("code").cast("string")): _*).as("code_str"),
      (0 until m).map(i => col("e").getItem(i).getField("d"))
        .reduce(_ + _).as("recon_err"))
  }

  /** ADC top-k: approximate k nearest stored vectors for each query id
    * < `nQueries`, by asymmetric distance (query subvector → codeword
    * table, summed over the stored codes). `adc` is the exact integer
    * table sum; rank ties break to the lower vec id; self-matches drop.
    *
    * The distance tables (nQueries·m·k rows of longs) broadcast; the
    * stored code table joins them with no shuffle and the per-query
    * top-k is heap-bounded — at no point does anything scale worse than
    * the one linear pass over the codes. */
  def adcTopK(emb: DataFrame, cb: DataFrame, dims: Int, m: Int,
              nQueries: Int, topK: Int): DataFrame = {
    val codes = encodePerSub(emb, cb, dims, m).drop("d")
    val dt = quantSubvectors(emb.filter(col("id") < nQueries), dims, m)
      .select(col("id").as("qid"), col("sub"), col("subq"))
      .join(broadcast(cb), Seq("sub"))
      .select(col("qid"), col("sub"), col("code"),
        VectorExpressions.intVecSqDist(col("subq"), col("cq")).as("d"))
    val adc = codes.join(broadcast(dt), Seq("sub", "code"))
      .filter(col("id") =!= col("qid"))
      .groupBy(col("qid"), col("id"))
      .agg(sum(col("d")).as("adc"))
    graft.ops.WindowOps.topKBounded(
        adc.select(col("qid"), col("id").as("vec_id"), col("adc")),
        part = Seq("qid"), order = Seq("adc" -> false, "vec_id" -> false),
        k = topK)
      .select(col("qid"), col("vec_id"), col("adc"), col("rk").cast("int").as("rk"))
  }
}
