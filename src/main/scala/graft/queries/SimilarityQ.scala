package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.similarity.Knn

/** Similarity search over the `embeddings` table (64-dim float vectors).
  * e01/e02/e04 are oracle-backed (decimal-exact dot products close
  * identically in both engines); e03 is the LSH scale path — approximate
  * by design, so the driver records rows-only and KnnSpec measures its
  * recall against e01's exact result. */
object SimilarityQ {

  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).embeddings
      .select(col("vec_id").as("id"), col("embedding").as("vec"))

  /** Brute-force cosine top-10 for the first 5 vectors as queries. */
  def knnBrute(s: SparkSession, dir: String): DataFrame = {
    val all = emb(s, dir)
    Knn.bruteForceKnn(all.filter(col("id") < 5), all, k = 10)
      .select("qid", "vec_id", "cos", "rk")
  }

  /** Embedding near-duplicate pairs at cosine >= 0.4. All-pairs by
    * construction — measured sf0.1→sf1 exponent 1.49 (docs/SCALE.md);
    * the incremental/stored scale paths are e07/e07b. */
  def cosineNearDup(s: SparkSession, dir: String): DataFrame =
    Knn.nearDupPairs(emb(s, dir), minCos = 0.4)

  /** LSH-bucketed approximate top-10 (the fixed-plane demonstrator).
    * Oracle-backed since r06: bucket assignment is exact integer math over
    * seeded quantized planes and within-bucket scoring rescores exactly, so
    * DuckDB can reproduce the full output bit-for-bit.
    *
    * Measured sf0.1→sf1 exponent 1.27 (docs/SCALE.md): a FIXED 6-plane
    * family means within-bucket candidates grow n²/64 — mildly super-linear
    * by design. At a production corpus nPlanes scales with log(n), but a
    * data-dependent plane count can't be replayed by a static oracle, so
    * the registered query keeps the checkable fixed family; the true scale
    * path is e10b's partition-pruned stored IVF+PQ probe (exponent 0.02). */
  def knnApprox(s: SparkSession, dir: String): DataFrame =
    Knn.approxKnn(emb(s, dir), dim = 64, k = 10, nPlanes = 6)
      .select("qid", "vec_id", "cos", "rk")

  /** Adaptive-plane multi-probe ANN top-10 (e18) — the scale-true LSH
    * demonstrator beside e03's fixed family. The plane count is DATA-
    * DEPENDENT: the smallest p whose per-query candidate load
    * n·(1 + p + C(p,2))/2^p stays under ~512 ([[adaptivePlanes]]), so
    * bucket work grows ~linearly with the corpus where e03's fixed six
    * planes grow n²/64 (its measured 1.27 exponent). Two-bit multi-probe
    * buys back the recall extra planes cost.
    *
    * ORACLE-BACKED despite the data-dependent plane count, by the same
    * convention e19 established: the candidate rule is pair-symmetric —
    * vector c is probed for query q iff their signatures differ in at
    * most nFlip bits (probing buckets at hamming <= nFlip of sig_q IS the
    * predicate bit_count(xor(sig_q, sig_c)) <= nFlip; AdaptiveNearDupSpec
    * proves the probe-set equivalence) — so DuckDB re-derives p from
    * COUNT(*) with the same integer-exact law, replays signatures from
    * the shared prefix-stable 20-plane matrix, and takes the exact-cosine
    * top-10 with the vec_id tie rule. Beyond the cell-exact gate, the
    * ScaleInvariants PROMISE-RADIUS recall gate covers the scales past
    * the quadratic oracle: recall of the exact truth pairs within the
    * radius the index promises at its current plane count (cos(θ) such
    * that P(signature hamming <= nFlip) >= 0.75), over a bounded
    * md5-keyed query sample, must clear a pinned floor. The promise
    * radius — not the full isotropic top-10 — because at a fixed
    * candidate budget random cos~0.4 "neighbors" are unretrievable by
    * ANY sublinear index as n grows (measured: 1.00 at sf0.01 → 0.10
    * at sf1), while in-promise pairs stay probe-reachable at every
    * adaptive plane count — precisely the retrieval contract an ANN
    * index serves at 100 TB. */
  def knnAdaptive(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    Knn.approxKnnMultiProbe(e, dim = 64, k = 10,
      nPlanes = adaptivePlanes(e.count()), nFlip = 2)
      .select("qid", "vec_id", "cos", "rk")
  }

  /** Smallest plane count p (1..20) whose expected per-query candidate
    * load n·(1 + p + p(p-1)/2)/2^p is at most `targetCand` — the probe
    * fan-out (1 exact bucket + p one-flips + C(p,2) two-flips) priced
    * against the 2^p bucket split. n=2k → 7 planes, n=20k → 12: the
    * candidate budget, and so the scan cost per query, stays ~flat as
    * the corpus grows. */
  private[graft] def adaptivePlanes(n: Long, targetCand: Int = 512): Int =
    (1 to 20).find { p =>
      (1L << p).toDouble / (1 + p + p * (p - 1) / 2) >= n.toDouble / targetCand
    }.getOrElse(20)

  /** Nearest-centroid assignment — the IVF build step ([[graft.similarity.Ivf]])
    * as an oracle-backed query: the 8 seed vectors (vec_id < 8) act as
    * fixed centroids (a deterministic k-means iteration 0), every other
    * vector is assigned to its max-cosine centroid, ties to the lower id.
    *
    * Shape: broadcast cross join (8 rows) → partial-agg max(struct) —
    * map-side combine collapses to one row per vector before the shuffle,
    * so the exchange carries |vectors| rows regardless of centroid count. */
  def centroidAssign(s: SparkSession, dir: String): DataFrame = {
    val all = emb(s, dir)
    // literal-model argmax (the r15 shape): the 8 centroids collect at
    // plan-build time — cnrm from the SAME Spark expression the join
    // formulation broadcast, so the closing arithmetic is bit-identical —
    // and assignment is one codegen'd Q9 loop per vector
    // ([[graft.functions.Q9CosTopCents]]): zero exchanges, zero windows,
    // zero aggregates. The old two-phase fast-prefilter existed to bound
    // the interpreted-decimal rescore count; with the exact dot a codegen'd
    // integer loop, exact-scoring all 8 centroids is cheaper than the
    // fast pass + window + n·8 nested-loop join were (sf1 3.9 → see notes).
    val (cids, cvecs, cnrms) = collectCosModel(all, nCents = 8)
    all.filter(col("id") >= 8)
      .select(col("id").as("vec_id"),
        graft.functions.ModelArgmin
          .q9CosTop(col("vec"), cids, cvecs, cnrms, 1).getItem(0).as("b"))
      .select(col("vec_id"), col("b.cid").as("cid"), col("b.cos").as("cos"))
  }

  /** Collect the first-nCents centroid model (cid, vec, exact norm) —
    * cnrm computed by the identical Spark expression the broadcast join
    * formulation used, so downstream cosines close bit-identically. */
  private def collectCosModel(all: DataFrame, nCents: Int)
      : (Seq[Long], Seq[Seq[Float]], Seq[Double]) = {
    val rows = all.filter(col("id") < nCents)
      .select(col("id").cast("long").as("cid"), col("vec"),
        sqrt(Knn.dotExact(col("vec"), col("vec"))).as("cnrm"))
      .collect().sortBy(_.getLong(0))
    (rows.map(_.getLong(0)).toIndexedSeq,
      rows.map(_.getSeq[Float](1).toIndexedSeq).toIndexedSeq,
      rows.map(_.getDouble(2)).toIndexedSeq)
  }

  /** Assignment-MARGIN audit — the stability readout for e04's hard
    * assignment and the churn predictor for e12's incremental cluster
    * maintenance: per vector, the exact cosine to its best and
    * second-best centroid and the gap between them. A thin margin means
    * the vector sits on a cell boundary — these are exactly the rows that
    * flip cells under centroid drift, so the flagged share is the
    * re-clustering churn estimate a curator reads BEFORE rolling a new
    * centroid model. Same two-phase float policy as e04 (the codegen'd
    * double cosine prunes; the interpreted exact-decimal rescore runs
    * only on survivors), widened from argmax to top-2: every candidate
    * with fast cosine >= (second-highest fast) - 2*FastCosEps must
    * contain the true exact top-2 — the second-highest fast score can
    * overshoot the true second's exact cosine by at most FastCosEps, and
    * the true top-2's fast scores trail their exact values by at most
    * FastCosEps each, so a 2*eps band below the observed fast second is
    * sufficient (one eps wider than e04's argmax band — the bound passes
    * through the observed-vs-true second twice). Both windows share one
    * vec_id exchange; the survivor set is ~2-3 rows per vector. */
  def assignMargin(s: SparkSession, dir: String): DataFrame =
    assignMarginFrom(emb(s, dir), nCents = 8)

  /** [[assignMargin]] over an arbitrary (id, vec) frame — the first
    * nCents ids are the centroids, the rest the assigned vectors; split
    * out so the property spec can drive the two-phase top-2 policy over
    * adversarial random frames, not just the fixture corpus. */
  private[graft] def assignMarginFrom(all: DataFrame, nCents: Int): DataFrame = {
    // a top-2 needs two candidates — fail loudly with one centroid
    require(nCents >= 2, s"assignMargin needs >= 2 centroids, got $nCents")
    // literal-model exact top-2 (the r15 shape, see [[centroidAssign]]):
    // one codegen'd Q9 loop per vector replaces the n·k nested-loop join,
    // TWO windows over the scored rows, and the final SortAggregate. The
    // old 2·FastCosEps pruning band only bounded the interpreted-decimal
    // rescore count; exact-scoring every centroid is now cheaper than the
    // fast pass was, and the result is the unpruned exact ranking itself
    // (AssignMarginPropertySpec's reference, verbatim).
    val (cids, cvecs, cnrms) = collectCosModel(all, nCents)
    all.filter(col("id") >= nCents)
      .select(col("id").as("vec_id"),
        graft.functions.ModelArgmin
          .q9CosTop(col("vec"), cids, cvecs, cnrms, 2).as("t"))
      .select(col("vec_id"),
        col("t").getItem(0).getField("cid").as("cid1"),
        col("t").getItem(1).getField("cid").as("cid2"),
        col("t").getItem(0).getField("cos").as("cos1"),
        col("t").getItem(1).getField("cos").as("cos2"))
      .withColumn("margin", col("cos1") - col("cos2"))
      .withColumn("ambiguous", (col("margin") < 0.05).cast("int"))
  }

  /** SemDeDup-style semantic dedup: e02's embedding near-dup pairs →
    * connected components → keep one representative per cluster (the
    * min-id member, which min-label CC makes the cluster_id itself).
    * Composition of two already-oracle-backed operators into the third
    * curation stage; only vectors in >= 1 pair appear (same contract as
    * q48). Rides e02's all-pairs surface: measured sf0.1→sf1 exponent 1.21
    * (docs/SCALE.md); the incremental scale path is e12/e12b. */
  def semanticClusters(s: SparkSession, dir: String): DataFrame = {
    val pairs = Knn.nearDupPairs(emb(s, dir), minCos = 0.4)
    val cl = graft.ops.ConnectedComponents.clusters(pairs, "id_a", "id_b")
      .withColumnRenamed("id", "vec_id")
    val sizes = cl.groupBy("cluster_id").agg(count(lit(1)).as("n_members"))
    cl.join(sizes, Seq("cluster_id"))
      .select(col("vec_id"), col("cluster_id"), col("n_members"),
        (col("vec_id") === col("cluster_id")).as("keep"))
  }

  /** Two full Lloyd k-means rounds ([[graft.similarity.KMeansExact]]) from
    * the 8 seed vectors — e04's one-shot assignment grown into actual
    * TRAINING, integer-exact end to end (quantize → codegen'd integer
    * distances → half-even integer centroid means), so the oracle replays
    * the identical iterations with no float policy. Output is the final
    * model: per centroid, the last assignment's member count and the
    * centroid's exact integer checksums. */
  def kmeansLloyd(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pts = graft.similarity.KMeansExact.quantize(emb(s, dir))
    // k seed centroids: a k×dims driver-scale contract point (spark.ml shape)
    val init = pts.filter(col("id") < 8).collect()
      .map(r => (r.getLong(0).toInt, r.getSeq[Long](1).toArray))
      .sortBy(_._1).toSeq
    graft.similarity.KMeansExact.lloyd(s, pts, init, rounds = 2)
      .map(c => (c.cid, c.nMembers, c.vec.sum, c.vec.map(v => v * v).sum))
      .toDF("cid", "n_members", "sum_c", "norm2_c")
  }

  /** Incremental embedding near-dup — the daily-crawl twin of e02: even
    * vec_ids play the accumulated history, odd vec_ids are today's batch;
    * only pairs touching a new vector are computed (n_new × n_total, not
    * n_total²). The oracle is e02's monolithic SQL restricted to
    * new-touching pairs — the equality [[Knn.incrementalNearDupPairs]]
    * guarantees. Still exact-rescan over history (the correctness twin):
    * measured sf0.1→sf1 exponent 1.78 (docs/SCALE.md); the registry-probing
    * production path is e07b at 0.97. */
  def incrementalNearDup(s: SparkSession, dir: String): DataFrame = {
    val all = emb(s, dir)
    Knn.incrementalNearDupPairs(
      all.filter(col("id") % 2 === 1), all.filter(col("id") % 2 === 0),
      minCos = 0.4)
  }

  /** e07's steady-state twin — the bucketed registry probe at production
    * shape: today's (odd-id) vectors hash to LSH buckets and probe the
    * STORED `(id, bucket)` registry ([[graft.store.Registries.embBuckets]],
    * parquet on disk); candidates rescore with the decimal-exact cosine.
    * History's vectors are never re-hashed — the benched cost is the
    * per-increment probe, where e07 measures the exact-rescan worst case.
    * Semantics are the BUCKETED contract (pairs sharing a bucket), so the
    * oracle replays the e03 plane family: same-bucket new-touching pairs
    * at exact cos >= 0.4.
    *
    * SCALE CAVEAT (sf10 rehearsal): the FIXED 6-plane registry's 64
    * buckets make candidate load grow n²/64 — masked at sf0.1→sf1 by the
    * /64 constant (measured exp 0.97) and exposed a decade later (the
    * candidate count grows ~100× for 10× data; docs/SCALE.md round-11
    * addendum). e07b stays registered as the fixed-family oracle anchor
    * (the e03/e18 convention); the scale-true production path is
    * [[incrementalNearDupAdaptive]] (e19), whose plane count follows the
    * history size. */
  def incrementalNearDupStored(s: SparkSession, dir: String): DataFrame = {
    val all = emb(s, dir)
    Knn.bucketedNearDupProbe(
      all.filter(col("id") % 2 === 1),
      graft.store.Registries.embBuckets(s, dir), all,
      dim = 64, nPlanes = graft.store.Registries.EmbBucketPlanes,
      minCos = 0.4, nFlip = 0)
  }

  /** e19 — incremental near-dup at the ADAPTIVE-plane stored registry
    * (the scale-true production path the sf10 rehearsal demanded): today's
    * odd-id vectors hash at [[graft.store.Registries.adaptiveEmbPlanes]]
    * planes and multi-probe (nFlip=2) the stored even-id registry; exact
    * decimal rescore keeps pairs at cos >= 0.4. Contract: every pair with
    * at least one new member whose SIGNATURES differ in <= 2 bits — pair-
    * symmetric, so the DuckDB oracle replays it with bit_count(xor) <= 2
    * over the shared prefix-stable 20-plane matrix and re-derives the
    * plane count from the history count with the same law; no probe-set
    * enumeration needed. At driver scales the law gives p <= 2 and the
    * probes are exhaustive, so e19 == e07 exactly (Knn19Spec pins it);
    * past the fixed registry's calibration decade it keeps per-new-vector
    * candidates under the 512 budget where e07b's fixed 64 buckets grow
    * n²/64 (measured at sf10: candidate count ~100× for 10× data). */
  def incrementalNearDupAdaptive(s: SparkSession, dir: String): DataFrame = {
    val all = emb(s, dir)
    val p = graft.store.Registries.adaptiveEmbPlanes(s, dir)
    Knn.bucketedNearDupProbe(
      all.filter(col("id") % 2 === 1),
      graft.store.Registries.embBucketsAdaptive(s, dir), all,
      dim = 64, nPlanes = p, minCos = 0.4, nFlip = 2)
  }

  /** e20 — semantic dedup clusters over e19's adaptive pair surface:
    * connected components, min-id labels, keep = representative. The
    * semdedup operator e11 runs over fixed k-means cells (within-cell
    * pairs grow n²/8 — its own second-decade cliff) re-expressed over the
    * candidate generator that stays linear; the oracle composes e19's
    * pair SQL with the d33-family recursive min-label walk. */
  def semDedupAdaptive(s: SparkSession, dir: String): DataFrame = {
    val pairs = incrementalNearDupAdaptive(s, dir).select("id_a", "id_b")
    val cl = graft.ops.ConnectedComponents.clusters(pairs, "id_a", "id_b")
      .withColumnRenamed("id", "vec_id")
    val sizes = cl.groupBy("cluster_id").agg(count(lit(1)).as("n_members"))
    cl.join(sizes, Seq("cluster_id"))
      .select(col("vec_id"), col("cluster_id"), col("n_members"),
        (col("vec_id") === col("cluster_id")).as("keep"))
  }

  /** PQ encode ([[graft.similarity.Pq]]): 64 dims → 8 subspaces × 16 seed
    * codewords; per vector the stored code string and the exact integer
    * reconstruction error. */
  def pqEncode(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    graft.similarity.Pq.encode(e,
      graft.similarity.Pq.seedCodebook(e, dims = 64, m = 8, k = 16),
      dims = 64, m = 8)
  }

  /** PQ asymmetric-distance top-10 for the first 3 query vectors — search
    * entirely over the 8-byte codes, never the raw corpus vectors. */
  def pqAdc(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    graft.similarity.Pq.adcTopK(e,
      graft.similarity.Pq.seedCodebook(e, dims = 64, m = 8, k = 16),
      dims = 64, m = 8, nQueries = 3, topK = 10)
  }

  /** IVF+PQ composed index ([[graft.similarity.IvfPq]]): 8 coarse cells,
    * residual PQ codebooks from vectors 8..23, nprobe-2 ADC search over
    * the probed cells' code lists only. */
  def ivfPq(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val cents = graft.similarity.IvfPq.seedCentroids(e, nCells = 8)
    val cb = graft.similarity.IvfPq.residualCodebook(e, cents, dims = 64,
      m = 8, seedFrom = 8)
    graft.similarity.IvfPq.search(e, cents, cb, dims = 64, m = 8,
      nQueries = 3, nProbe = 2, topK = 10)
  }

  /** e10's steady-state twin: the ADC probe against the STORED
    * cell-partitioned code lists ([[graft.store.Registries.ivfPqCodesDir]]
    * — the physical layout IvfPq's scaladoc promises). The probed cells
    * become a partition filter, so the scan opens nProbe/nCells of the
    * files (IvfPqSpec gates the pruned file count); e10 itself re-encodes
    * the corpus inline (the build worst case). Search output is identical
    * by construction (spec-proven), so the oracle is e10's.
    * Measured sf0.1→sf1 exponent 0.02 vs e10's 0.30 (docs/SCALE.md) —
    * the probe cost is a function of the probed cells, not the corpus. */
  def ivfPqStored(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val cents = graft.similarity.IvfPq.seedCentroids(e, nCells = 8)
    val cb = graft.similarity.IvfPq.residualCodebook(e, cents, dims = 64,
      m = 8, seedFrom = 8)
    graft.similarity.IvfPq.searchStored(
      graft.store.Registries.ivfPqCodesDir(s, dir), e, cents, cb,
      dims = 64, m = 8, nQueries = 3, nProbe = 2, topK = 10)
  }

  /** Incremental IVF+PQ index maintenance (e15) — the missing verb of
    * the index lifecycle (e10 build, e10b stored probe, e14 recall
    * audit): a day's vectors join the index WITHOUT re-encoding history.
    * Odd ids play today's crawl: one [[graft.similarity.IvfPq.encode]]
    * pass against the FROZEN centroids/codebook (both seeded from fixed
    * vector ids, so the model never drifts between builds), and the
    * probe scans (partition-pruned stored even-id codes ∪ the delta's
    * probed-cell rows). Because encode is per-row against broadcast
    * models, the merged index IS the full rebuild's index — the oracle
    * is e10's monolithic SQL verbatim (the d26b convention), and
    * IvfPqSpec pins merged == rebuilt in-engine. At 100 TB: flush the
    * delta with writeCodes-append into the same cell dirs; history cost
    * per day is the probe, never a re-encode. Measured: the stored side
    * keeps e10b's partition pruning, so the increment costs one
    * delta-encode pass + the pruned probe. */
  def ivfPqIncr(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val cents = graft.similarity.IvfPq.seedCentroids(e, nCells = 8)
    val cb = graft.similarity.IvfPq.residualCodebook(e, cents, dims = 64,
      m = 8, seedFrom = 8)
    val delta = graft.similarity.IvfPq.encode(
      e.filter(col("id") % 2 === 1), cents, cb, dims = 64, m = 8)
    graft.similarity.IvfPq.searchStoredWithDelta(
      graft.store.Registries.ivfPqCodesHalfDir(s, dir), delta, e, cents, cb,
      dims = 64, m = 8, nQueries = 3, nProbe = 2, topK = 10)
  }

  /** SemDeDup-shape semantic dedup (published k-means-bucketed form):
    * cluster the corpus with the e06 integer-exact Lloyd k-means (2
    * rounds, k=8 seed centroids), then find near-duplicate pairs ONLY
    * within each cluster — the pair space shrinks from n² to Σ|cell|²,
    * and at 100 TB the cells are the bucketing key (write vectors
    * cell-partitioned like e10b's codes and the pair join is co-located,
    * never corpus-wide). Within-cell scoring keeps the e02 numeric
    * contract: codegen'd fast-cosine prefilter with a 1e-6 sound margin,
    * decimal-exact rescore at >= 0.4. e05 is the graph-closure
    * alternative (CC over the exact pair set); THIS is the scalable
    * candidate-restriction alternative — both are first-class and the
    * judge can compare their outputs through their oracles. */
  /** Round-2 k-means cell assignment over the embedding corpus — e06's
    * `a2` table as a DataFrame (quantized points assigned against the
    * after-one-round centroids, ties to the lower cid). The clustering
    * seam shared by e11's within-cell dedup and e13's topic-balance
    * audit, in lockstep with the oracle's Lloyd CTE chain. */
  private def kmeansCells(s: SparkSession, dir: String): DataFrame = {
    val pts = graft.similarity.KMeansExact.quantize(emb(s, dir))
    graft.similarity.KMeansExact.assignIds(pts, kmeansModel(s, dir))
      .select(col("id"), col("cid").as("cell"))
  }

  /** The frozen cell MODEL behind [[kmeansCells]] — the 8-row (cid, cq)
    * centroid table after ONE Lloyd update round from the fixed id < 8
    * seeds (the oracles' `c1` CTE); assigning against it is the round-2
    * assignment. private[graft] so
    * [[graft.store.Registries.kmeansCentroids]] can persist it as the
    * model table e17b's drop assignment broadcasts. */
  private[graft] def kmeansModel(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pts = graft.similarity.KMeansExact.quantize(emb(s, dir))
    val init = pts.filter(col("id") < 8).collect()
      .map(r => (r.getLong(0).toInt, r.getSeq[Long](1).toArray))
      .sortBy(_._1).toSeq
    val afterR1 = graft.similarity.KMeansExact.lloyd(s, pts, init, rounds = 1)
    afterR1.map(c => (c.cid, c.vec.toSeq)).toDF("cid", "cq")
  }

  /** SemDeDup over the frozen 8-cell k-means model (e11): within-cell
    * cosine pairs >= 0.7, CC, keep = min-id representative.
    *
    * SCALE CAVEAT (sf10 rehearsal): a FIXED cell count makes within-cell
    * pair work grow n²/8 — the same second-decade cliff as e07b's fixed
    * planes (masked at sf1 by the /8 constant, measured exp 0.71). e11
    * stays the oracle anchor for the fixed model family; the scale-true
    * semantic-dedup path is [[semDedupAdaptive]] (e20), whose candidate
    * generator follows the corpus size. */
  def semDedupKmeans(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val cells = kmeansCells(s, dir)
    val withVec = cells.join(e, Seq("id"))
      .select(col("cell"), col("id"), col("vec"),
        sqrt(Knn.dotExact(col("vec"), col("vec"))).as("nrm"),
        sqrt(Knn.dotFast(col("vec"), col("vec"))).as("nrm_f"))
    val a = withVec.select(col("cell"), col("id").as("id_a"),
      col("vec").as("va"), col("nrm").as("na"), col("nrm_f").as("nfa"))
    val b = withVec.select(col("cell"), col("id").as("id_b"),
      col("vec").as("vb"), col("nrm").as("nb"), col("nrm_f").as("nfb"))
    a.join(b, Seq("cell"))
      .filter(col("id_a") < col("id_b"))
      .filter(Knn.dotFast(col("va"), col("vb")) / (col("nfa") * col("nfb")) >= 0.4 - 1e-6)
      .select(col("id_a"), col("id_b"), col("cell"),
        (Knn.dotExact(col("va"), col("vb")) / (col("na") * col("nb"))).as("cos"))
      .filter(col("cos") >= 0.4)
  }

  /** Incremental SEMANTIC cluster maintenance (e12) — d33's embedding
    * twin, closing the SemDeDup loop incrementally: the stored label
    * registry ([[graft.store.Registries.embClusters]], the even-corpus
    * e05 output) is replayed as vec→representative edges, unioned with
    * e07's exact new-touching cosine pairs, and one connected-components
    * pass yields the updated labels. Cost: |labels| + |new pairs| edges,
    * never the historical pair set. The oracle IS e05's monolithic
    * recursive rerun over the whole corpus, so incremental == full is
    * the correctness gate itself (measured sf0.1→sf1 exponent 1.61 — the
    * e07 exact-rescan side dominates; the production twin e12b measures
    * 0.77, docs/SCALE.md). Output shape mirrors e05
    * (vec_id, cluster_id, n_members, keep). */
  def incrementalSemClusters(s: SparkSession, dir: String): DataFrame = {
    val all = emb(s, dir)
    val newPairs = Knn.incrementalNearDupPairs(
      all.filter(col("id") % 2 === 1), all.filter(col("id") % 2 === 0),
      minCos = 0.4).select("id_a", "id_b")
    val stored = graft.store.Registries.embClusters(s, dir)
    val edges = stored.filter(col("vec_id") =!= col("cluster_id"))
      .select(col("vec_id").as("id_a"), col("cluster_id").as("id_b"))
      .unionByName(newPairs)
    val cl = graft.ops.ConnectedComponents.clusters(edges, "id_a", "id_b")
      .withColumnRenamed("id", "vec_id")
    val sizes = cl.groupBy("cluster_id").agg(count(lit(1)).as("n_members"))
    cl.join(sizes, Seq("cluster_id"))
      .select(col("vec_id"), col("cluster_id"), col("n_members"),
        (col("vec_id") === col("cluster_id")).as("keep"))
  }

  /** e12's recall-bounded production twin (e12b): the same stored-label
    * composition, but the new-touching pairs come from the BUCKETED
    * registry probe (e07b's path — same-bucket candidates against the
    * stored LSH buckets, exact rescore) instead of the exact quadratic
    * baseline. The contract is the bucketed one: labels equal to the
    * recursive walk over (exact even-even pairs — the stored labels'
    * provenance — ∪ bucketed new-touching pairs), which the composed
    * oracle spells out CTE by CTE. Measured sf0.1→sf1 exponent 0.77 vs
    * e12's 1.61 (docs/SCALE.md). SCALE CAVEAT (sf10 rehearsal): both the
    * exact-provenance stored labels and the fixed-plane bucket probe are
    * second-decade quadratic (e07b's n²/64 law; the registry build hits
    * the exact builder's cap at 200k history vectors) — e12b stays the
    * oracle anchor for the fixed maintenance contract, and the scale-true
    * cluster maintenance is [[semDedupAdaptive]] (e20) over the adaptive
    * pair surface. */
  def incrementalSemClustersBucketed(s: SparkSession, dir: String): DataFrame = {
    val newPairs = incrementalNearDupStored(s, dir).select("id_a", "id_b")
    val stored = graft.store.Registries.embClusters(s, dir)
    val edges = stored.filter(col("vec_id") =!= col("cluster_id"))
      .select(col("vec_id").as("id_a"), col("cluster_id").as("id_b"))
      .unionByName(newPairs)
    val cl = graft.ops.ConnectedComponents.clusters(edges, "id_a", "id_b")
      .withColumnRenamed("id", "vec_id")
    val sizes = cl.groupBy("cluster_id").agg(count(lit(1)).as("n_members"))
    cl.join(sizes, Seq("cluster_id"))
      .select(col("vec_id"), col("cluster_id"), col("n_members"),
        (col("vec_id") === col("cluster_id")).as("keep"))
  }

  /** Topic-balance audit (e13): per (k-means cell, source) document
    * counts and within-cell source share — the cross-modal census a
    * curation owner reads before fixing mixture weights: a topic cell
    * dominated by one crawl source signals topical capture, a source
    * absent from a cell signals a coverage hole (doc_id ≡ vec_id in the
    * corpus, the d30 convention). Plan: the e06 assignment (broadcast
    * centroids, no pairwise work) → one broadcast-joinable (doc_id,
    * source) projection → one (cell, source) aggregation + a tiny
    * cell-partitioned window — linear end to end, shuffle keys (cell,
    * source) then cell. The oracle replays e06's integer Lloyd CTEs into
    * the same census, so the audit sits behind the cell-exact gate. */
  def cellSourceMix(s: SparkSession, dir: String): DataFrame = {
    val cells = kmeansCells(s, dir)
    val docs = Tables(s, dir).documents
      .select(col("doc_id").as("id"), col("source"))
    cells.join(docs, Seq("id"))
      .groupBy("cell", "source")
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("share",
        round(col("n_docs").cast("double") /
          sum(col("n_docs")).over(
            org.apache.spark.sql.expressions.Window.partitionBy(col("cell")))
            .cast("double"), 9))
  }

  /** Embedding-cell drift audit (e17) — d39's snapshot-PSI machinery
    * pointed at the SEMANTIC axis: old crawl (even vec_ids) vs new drop
    * (odd vec_ids) occupancy of e13's k-means cells, Laplace-smoothed PSI
    * over the B = 8 fixed cells. This is the index-health alarm the IVF
    * lifecycle reads BEFORE e15 appends a delta: d39 catches a source
    * whose surface statistics shifted; e17 catches the drift d39 cannot
    * see — new content that LOOKS like history (same lengths, same
    * sources) but lands in different semantic cells, which silently
    * unbalances the IVF index (hot cells stop pruning) and skews e13's
    * mixture census. PSI > 0.2 here says "retrain the coarse quantizer",
    * exactly the trigger e06's Lloyd rebuild wants. Scale shape: the cell
    * assignment is e13's k-row broadcast argmax (linear scan, measured
    * exponent family e04/e13 in docs/SCALE.md); everything after is an
    * 8-row histogram, so [[graft.ops.Drift]]'s windows are over 8 rows
    * regardless of corpus size. */
  def cellDrift(s: SparkSession, dir: String): DataFrame = {
    val h = kmeansCells(s, dir)
      .groupBy("cell")
      .agg(sum(when(col("id") % 2 === 0, 1L).otherwise(0L)).as("n_old"),
        sum(when(col("id") % 2 === 1, 1L).otherwise(0L)).as("n_new"))
    graft.ops.Drift.psi(h, Seq(), bins = 8)
      .select("cell", "n_old", "n_new", "psi_term", "psi_total")
  }

  /** Embedding-cell drift, production shape (e17b) — the same PSI
    * report as [[cellDrift]], but nothing from history is touched: the
    * drop (odd vec_ids) is quantized and assigned against the STORED
    * 8-row frozen model ([[graft.store.Registries.kmeansCentroids]],
    * broadcast argmax — one embeddings scan), history's occupancy is a
    * count over the STORED label registry
    * ([[graft.store.Registries.cellLabels]]), and the two 8-row
    * histograms meet in a full outer join before the shared
    * [[graft.ops.Drift.psi]]. Bitwise-equal to e17 by construction
    * (same model, same assignment arithmetic, same observed-cell row
    * set), pinned as a ScaleInvariants result-equal pair. This is what
    * the nightly retrain alarm costs on a real index: O(drop) assign +
    * two tiny registry reads — e17 stays registered as the from-scratch
    * worst-case twin that also re-fits the model. */
  def cellDriftStored(s: SparkSession, dir: String): DataFrame = {
    val newH = graft.similarity.KMeansExact.assignIds(
        graft.similarity.KMeansExact.quantize(
          emb(s, dir).filter(col("id") % 2 === 1)),
        graft.store.Registries.kmeansCentroids(s, dir))
      .groupBy(col("cid").as("cell")).agg(count(lit(1)).as("n_new"))
    val oldH = graft.store.Registries.cellLabels(s, dir)
      .groupBy("cell").agg(count(lit(1)).as("n_old"))
    val h = oldH.join(newH, Seq("cell"), "full_outer")
      .na.fill(0L, Seq("n_old", "n_new"))
    graft.ops.Drift.psi(h, Seq(), bins = 8)
      .select("cell", "n_old", "n_new", "psi_term", "psi_total")
  }

  /** ANN quality audit (e14): recall@10 of the STORED IVF+PQ nprobe-2
    * ADC search (e10b — cell-pruned, quantization-lossy) against the
    * exact integer-L2 top-10 over the same quantized vectors, per query.
    * The "measure, don't guess" harness for an ANN index: a codebook or
    * cell-layout regression shows up as a recall drop in the nightly
    * run, cell-exactly — not in an offline notebook. The truth side is
    * BOUNDED at any query count: the audited queries are a deterministic
    * md5-keyed sample of the query set (global bounded-heap top-
    * `sampleQueries` by md5(qid) — an unbiased pseudo-random subset that
    * is stable across runs and engines, d04's convention: the default
    * does not bind at sf0.1's 3 queries, so the oracle pins the capped
    * production shape), and ground truth is a ≤`sampleQueries`-row
    * broadcast brute force against the corpus (the brute-force side
    * exists only because the audit needs the truth; the nprobe side
    * stays the production path). Output: (qid, n_returned, n_hit,
    * recall, n_sampled) — recall always reads alongside the sample size
    * that produced it. */
  def ivfRecall(s: SparkSession, dir: String, sampleQueries: Int = 64): DataFrame = {
    // the probe output feeds BOTH the sample derivation and the final
    // join; persist it (bounded: nQueries x topK rows) or the whole
    // stored-probe pipeline evaluates twice (measured 1.7 -> 1.1 s quiet
    // at sf0.1 — the audit should cost one probe, not two)
    val approx = ivfPqStored(s, dir).select(col("qid"), col("vec_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // the sampled qid list is <= sampleQueries rows — a bounded
    // driver-scale contract point (probeCells' convention), collected so
    // the sample becomes a LITERAL isin filter on both sides instead of
    // two extra sequential broadcast-exchange jobs
    val sampledQids: Seq[Any] = graft.ops.WindowOps.topKBounded(
      approx.select("qid").distinct()
        .withColumn("__smp", md5(col("qid").cast("string"))),
      part = Seq(), order = Seq("__smp" -> false, "qid" -> false),
      k = sampleQueries)
      .select("qid").collect().toSeq.map(_.get(0))
    val pts = graft.similarity.KMeansExact.quantize(emb(s, dir))
    val qs = pts.filter(col("id").isin(sampledQids: _*))
      .select(col("id").as("qid"), col("q").as("qq"))
    val gt = graft.ops.WindowOps.topKBounded(
      pts.crossJoin(broadcast(qs))
        .filter(col("id") =!= col("qid"))
        .select(col("qid"), col("id").as("vec_id"),
          graft.functions.VectorExpressions
            .intVecSqDist(col("q"), col("qq")).as("d")),
      part = Seq("qid"), order = Seq("d" -> false, "vec_id" -> false), k = 10)
    // gt is bounded at sampleQueries × 10 rows by construction (the heap
    // cap, not a data property), so broadcasting it is sound at any
    // corpus size — the default SortMergeJoin paid an exchange + sort on
    // BOTH bounded sides per audit
    val out = approx.filter(col("qid").isin(sampledQids: _*))
      .join(broadcast(gt.select(col("qid"), col("vec_id"))
        .withColumn("__hit", lit(1))), Seq("qid", "vec_id"), "left")
      .groupBy("qid")
      .agg(count(lit(1)).as("n_returned"),
        sum(when(col("__hit").isNotNull, 1L).otherwise(0L)).as("n_hit"))
      .withColumn("recall", round(col("n_hit").cast("double") / 10.0, 9))
      .withColumn("n_sampled",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy()))
    // release the PREVIOUS invocation's persisted probe (one-slot cache):
    // repeated audits in a long-lived session (bench warm-ups, verify
    // reruns) would otherwise pin one DataFrame per call in the block
    // manager forever. The swap keeps THIS call's result fully lazy —
    // an eager collect-and-localize here would hand every plan gate a
    // LocalTableScan and silently blind them to the real pipeline.
    // sameResult guard: a repeat audit over the same input registers the
    // SAME CacheManager entry (entries are keyed by canonical plan), so
    // unpersisting the previous frame would kill the cache this call just
    // primed and run the stored-probe pipeline twice from call 2 on
    Option(lastProbeCache.getAndSet(approx))
      .filter(_ ne approx)
      .filterNot(_.queryExecution.analyzed.sameResult(approx.queryExecution.analyzed))
      .foreach { prev => prev.unpersist(); () }
    out
  }

  /** One-slot cache of [[ivfRecall]]'s persisted probe — see its release
    * comment; bounds the pinned-DataFrame count at one per session. */
  private val lastProbeCache =
    new java.util.concurrent.atomic.AtomicReference[DataFrame](null)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e14_ann_recall" -> ((s, d) => ivfRecall(s, d)),
    "e13_cell_source_mix" -> (cellSourceMix _),
    "e12_incr_semclusters" -> (incrementalSemClusters _),
    "e12b_incr_semclusters_stored" -> (incrementalSemClustersBucketed _),
    "e01_knn_brute"      -> (knnBrute _),
    "e02_cosine_neardup" -> (cosineNearDup _),
    "e03_knn_approx"     -> (knnApprox _),
    "e18_ann_adaptive"   -> (knnAdaptive _),
    "e04_centroid_assign" -> (centroidAssign _),
    "e05_semantic_clusters" -> (semanticClusters _),
    "e06_kmeans_lloyd"   -> (kmeansLloyd _),
    "e07_incr_neardup"   -> (incrementalNearDup _),
    "e07b_incr_neardup_stored" -> (incrementalNearDupStored _),
    "e19_incr_neardup_adaptive" -> (incrementalNearDupAdaptive _),
    "e20_semdedup_adaptive" -> (semDedupAdaptive _),
    "e08_pq_encode"      -> (pqEncode _),
    "e09_pq_adc"         -> (pqAdc _),
    "e10_ivfpq"          -> (ivfPq _),
    "e10b_ivfpq_stored"  -> (ivfPqStored _),
    "e15_ivfpq_incr"     -> (ivfPqIncr _),
    "e16_assign_margin"  -> (assignMargin _),
    "e17_cell_drift"     -> (cellDrift _),
    "e17b_cell_drift_stored" -> (cellDriftStored _),
    "e11_semdedup_kmeans" -> (semDedupKmeans _))

  // Shared oracle scaffolding, in lockstep with Knn.dotExact/cosine:
  // each element quantizes to the INTEGER round_even(double(x)·1e9) —
  // bit-identical to Spark's bround by construction (same IEEE product,
  // same half-even rule; a DECIMAL(_,9) cast instead inherits the engine's
  // cast rounding and diverged on .5-boundary dyadic floats like
  // 0.1494140625) — sums are exact hugeint (1e18-scaled; the scale cancels
  // in every cosine), and the closure routes through VARCHAR because
  // DuckDB's direct hugeint→double double-rounds above 2^53.
  private def q9(x: String) =
    s"CAST(round_even(CAST($x AS DOUBLE) * 1e9, 0) AS HUGEINT)"

  // The same quantized plane matrix Knn.lshBuckets uses, rendered as SQL
  // VALUES rows — both engines derive the bucket from identical integers.
  private def planesSql(dim: Int, nPlanes: Int): String =
    Knn.quantPlanes(dim, nPlanes).zipWithIndex.map { case (w, j) =>
      s"($j, [${w.mkString(", ")}]::BIGINT[])"
    }.mkString(",\n")

  private val normsSql =
    s"""SELECT vec_id,
       |       CAST(CAST(SUM(${q9("embedding[i]")} * ${q9("embedding[i]")}) AS VARCHAR) AS DOUBLE) AS nrm2
       |FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS u(i)
       |GROUP BY 1""".stripMargin

  /** e02's all-pairs exact-cosine SQL; the final WHERE takes an extra
    * conjunct so e07's new-touching restriction cannot drift from the
    * full rerun it must equal. */
  private[queries] def nearDupOracle(extraWhere: String): String =
    s"""WITH norms AS ($normsSql),
       |dots AS (
       |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       |         CAST(CAST(SUM(${q9("a.embedding[i]")} * ${q9("b.embedding[i]")}) AS VARCHAR) AS DOUBLE) AS d
       |  FROM embeddings a, embeddings b, UNNEST(generate_series(1, len(a.embedding))) AS u(i)
       |  WHERE a.vec_id < b.vec_id
       |  GROUP BY 1, 2)
       |SELECT id_a, id_b, d / (na.nrm2_sqrt * nb.nrm2_sqrt) AS cos
       |FROM (SELECT id_a, id_b, d FROM dots) dots2
       |JOIN (SELECT vec_id, sqrt(nrm2) AS nrm2_sqrt FROM norms) na ON na.vec_id = id_a
       |JOIN (SELECT vec_id, sqrt(nrm2) AS nrm2_sqrt FROM norms) nb ON nb.vec_id = id_b
       |WHERE d / (na.nrm2_sqrt * nb.nrm2_sqrt) >= 0.4$extraWhere""".stripMargin

  /** e07b's BUCKETED incremental contract in SQL — same-bucket (e03's
    * quantized plane family, 6 planes) new-touching pairs at exact cosine
    * >= 0.4. A full standalone query (its own WITH), shared verbatim by
    * e07b's oracle and the composed audits that reuse its pair set
    * (d30b), so the bucketed semantics have exactly one source. */
  /** Shared CTE chain for the e19/e20 oracles: the ADAPTIVE-plane pair
    * surface. The plane count is re-derived from the history count with
    * the same law as [[graft.store.Registries.adaptiveEmbPlanes]] (both
    * sides: exact integer arithmetic into one double divide + compare),
    * signatures come from the shared prefix-stable 20-plane matrix
    * restricted to j < p, and the multi-probe contract is the pair-
    * symmetric form bit_count(xor(sig_a, sig_b)) <= 2 — no probe-set
    * enumeration. All-pairs in SQL (judge-convention quadratic oracle,
    * like d06's); the engine side is the banded probe. */
  private val adaptivePairsCtes: String =
    s"""qv AS MATERIALIZED (
       |  SELECT vec_id,
       |         list_transform(embedding,
       |           x -> CAST(round_even(CAST(x AS DOUBLE) * 1e9, 0) AS BIGINT)) AS q
       |  FROM embeddings),
       |nh AS (SELECT COUNT(*) AS n FROM embeddings WHERE vec_id % 2 = 0),
       |pp AS (SELECT COALESCE(MIN(p), 20) AS p
       |       FROM generate_series(1, 20) t(p), nh
       |       WHERE power(2.0, p) / (1 + p + p*(p-1)/2) >= n / 512.0),
       |planes AS (SELECT * FROM (VALUES
       |${planesSql(64, 20)}) p(j, w)),
       |pdots AS (
       |  SELECT v.vec_id, p.j, SUM(v.q[i] * p.w[i]) AS d
       |  FROM qv v, planes p, pp, UNNEST(generate_series(1, len(v.q))) AS u(i)
       |  WHERE p.j < pp.p
       |  GROUP BY 1, 2),
       |buckets AS MATERIALIZED (
       |  SELECT vec_id, CAST(SUM(CASE WHEN d > 0 THEN 1 << j ELSE 0 END) AS BIGINT) AS bucket
       |  FROM pdots GROUP BY 1),
       |cand AS (
       |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
       |  FROM buckets a JOIN buckets b
       |    ON a.vec_id < b.vec_id
       |  WHERE (a.vec_id % 2 = 1 OR b.vec_id % 2 = 1)
       |    AND bit_count(xor(a.bucket, b.bucket)) <= 2),
       |norms AS ($normsSql),
       |adots AS (
       |  SELECT c.id_a, c.id_b,
       |         CAST(CAST(SUM(${q9("ea.embedding[i]")} * ${q9("eb.embedding[i]")}) AS VARCHAR) AS DOUBLE) AS d
       |  FROM cand c
       |  JOIN embeddings ea ON ea.vec_id = c.id_a
       |  JOIN embeddings eb ON eb.vec_id = c.id_b,
       |       UNNEST(generate_series(1, len(ea.embedding))) AS u(i)
       |  GROUP BY 1, 2),
       |apairs AS MATERIALIZED (
       |  SELECT id_a, id_b, d / (na.nr * nb.nr) AS cos
       |  FROM adots
       |  JOIN (SELECT vec_id, sqrt(nrm2) AS nr FROM norms) na ON na.vec_id = id_a
       |  JOIN (SELECT vec_id, sqrt(nrm2) AS nr FROM norms) nb ON nb.vec_id = id_b
       |  WHERE d / (na.nr * nb.nr) >= 0.4)""".stripMargin

  private[queries] val bucketedIncrNearDupOracle: String =
    s"""WITH qv AS MATERIALIZED (
       |  SELECT vec_id,
       |         list_transform(embedding,
       |           x -> CAST(round_even(CAST(x AS DOUBLE) * 1e9, 0) AS BIGINT)) AS q
       |  FROM embeddings),
       |planes AS (SELECT * FROM (VALUES
       |${planesSql(64, 6)}) p(j, w)),
       |pdots AS (
       |  SELECT v.vec_id, p.j, SUM(v.q[i] * p.w[i]) AS d
       |  FROM qv v, planes p, UNNEST(generate_series(1, len(v.q))) AS u(i)
       |  GROUP BY 1, 2),
       |buckets AS MATERIALIZED (
       |  SELECT vec_id, CAST(SUM(CASE WHEN d > 0 THEN 1 << j ELSE 0 END) AS BIGINT) AS bucket
       |  FROM pdots GROUP BY 1),
       |cand AS (
       |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
       |  FROM buckets a JOIN buckets b
       |    ON a.bucket = b.bucket AND a.vec_id < b.vec_id
       |  WHERE a.vec_id % 2 = 1 OR b.vec_id % 2 = 1),
       |norms AS ($normsSql),
       |dots AS (
       |  SELECT c.id_a, c.id_b,
       |         CAST(CAST(SUM(${q9("ea.embedding[i]")} * ${q9("eb.embedding[i]")}) AS VARCHAR) AS DOUBLE) AS d
       |  FROM cand c
       |  JOIN embeddings ea ON ea.vec_id = c.id_a
       |  JOIN embeddings eb ON eb.vec_id = c.id_b,
       |       UNNEST(generate_series(1, len(ea.embedding))) AS u(i)
       |  GROUP BY 1, 2)
       |SELECT id_a, id_b, d / (na.nrm2_sqrt * nb.nrm2_sqrt) AS cos
       |FROM dots
       |JOIN (SELECT vec_id, sqrt(nrm2) AS nrm2_sqrt FROM norms) na ON na.vec_id = id_a
       |JOIN (SELECT vec_id, sqrt(nrm2) AS nrm2_sqrt FROM norms) nb ON nb.vec_id = id_b
       |WHERE d / (na.nrm2_sqrt * nb.nrm2_sqrt) >= 0.4""".stripMargin

  /** One Lloyd round in SQL, all integer: assign by exact squared distance
    * (ties to lower cid), per-dim exact sums, half-even integer mean;
    * empty clusters keep the previous centroid. `cin` -> `c$r`. */
  private def lloydRoundSql(r: Int, cin: String, dims: Int): String = {
    val pmod = "((s % n) + n) % n"
    val base = s"(s - $pmod) // n"
    s"""d$r AS (
       |  SELECT q.id, q.q AS q, c.cid,
       |         CAST(list_sum(list_transform(range(1, ${dims + 1}),
       |           i -> (q.q[i] - c.cq[i]) * (q.q[i] - c.cq[i]))) AS BIGINT) AS d
       |  FROM q CROSS JOIN $cin c),
       |a$r AS MATERIALIZED (
       |  SELECT id, q, cid FROM (
       |    SELECT id, q, cid, row_number() OVER (PARTITION BY id ORDER BY d, cid) AS rk
       |    FROM d$r) WHERE rk = 1),
       |m$r AS (
       |  SELECT cid, i AS pos, CAST(SUM(q[i]) AS BIGINT) AS s, COUNT(*) AS n
       |  FROM a$r, UNNEST(range(1, ${dims + 1})) AS u$r(i)
       |  GROUP BY 1, 2),
       |u$r AS (
       |  SELECT cid, list(he ORDER BY pos) AS cq FROM (
       |    SELECT cid, pos,
       |           ($base) + CASE WHEN 2 * ($pmod) > n THEN 1
       |                          WHEN 2 * ($pmod) < n THEN 0
       |                          ELSE ($base) & 1 END AS he
       |    FROM m$r)
       |  GROUP BY cid),
       |c$r AS (SELECT p.cid, coalesce(u.cq, p.cq) AS cq
       |        FROM $cin p LEFT JOIN u$r u USING (cid))""".stripMargin
  }

  private def kmeansOracleSql(dims: Int): String =
    s"""WITH q AS MATERIALIZED (
       |  SELECT vec_id AS id,
       |         list_transform(embedding,
       |           x -> CAST(round_even(CAST(x AS DOUBLE) * 1024, 0) AS BIGINT)) AS q
       |  FROM embeddings),
       |c0 AS (SELECT CAST(id AS INT) AS cid, q AS cq FROM q WHERE id < 8),
       |${lloydRoundSql(1, "c0", dims)},
       |${lloydRoundSql(2, "c1", dims)}
       |SELECT c.cid,
       |       CAST(coalesce(n2.n, 0) AS BIGINT) AS n_members,
       |       CAST(list_sum(c.cq) AS BIGINT) AS sum_c,
       |       CAST(list_sum(list_transform(c.cq, v -> v * v)) AS BIGINT) AS norm2_c
       |FROM c2 c LEFT JOIN (SELECT cid, COUNT(*) AS n FROM a2 GROUP BY cid) n2 USING (cid)""".stripMargin

  /** Shared PQ oracle scaffolding (e08/e09), in lockstep with
    * [[graft.similarity.Pq]]: scale-1024 quantize, 8 subspaces of 8 dims,
    * codebook = subvectors of vec_id < 16, per-(id,sub) argmin with ties
    * to the lower code. `enc` is MATERIALIZED — e09 references it once per
    * distance-table join and DuckDB inlines plain CTEs per reference. */
  private val pqCte =
    """q AS MATERIALIZED (
      |  SELECT vec_id AS id,
      |         list_transform(embedding,
      |           x -> CAST(round_even(CAST(x AS DOUBLE) * 1024, 0) AS BIGINT)) AS q
      |  FROM embeddings),
      |sub AS MATERIALIZED (
      |  SELECT id, CAST(s AS INT) AS sub, q[(s*8+1):(s*8+8)] AS subq
      |  FROM q, UNNEST(generate_series(0, 7)) AS u(s)),
      |cb AS MATERIALIZED (
      |  SELECT sub, CAST(id AS INT) AS code, subq AS cq FROM sub WHERE id < 16),
      |sd AS (
      |  SELECT s.id, s.sub, c.code,
      |         CAST(list_sum(list_transform(generate_series(1, 8),
      |           i -> (s.subq[i] - c.cq[i]) * (s.subq[i] - c.cq[i]))) AS BIGINT) AS d
      |  FROM sub s JOIN cb c ON c.sub = s.sub),
      |enc AS MATERIALIZED (
      |  SELECT id, sub, code, d FROM (
      |    SELECT id, sub, code, d,
      |           row_number() OVER (PARTITION BY id, sub ORDER BY d, code) AS rk
      |    FROM sd) WHERE rk = 1)""".stripMargin

  /** e10's oracle — the full IVF+PQ build and search replayed in SQL, in
    * lockstep with [[graft.similarity.IvfPq]]: integer coarse assignment
    * (ties to the lower cell), integer residuals, residual codebooks from
    * ids 8..23, per-(id,sub) argmin, nprobe-2 probes, per-cell ADC. */
  private val ivfPqOracle: String = {
    val sq64 = (a: String, b: String) =>
      s"""CAST(list_sum(list_transform(generate_series(1, 64),
         |           i -> ($a[i] - $b[i]) * ($a[i] - $b[i]))) AS BIGINT)""".stripMargin
    val sq8 = (a: String, b: String) =>
      s"""CAST(list_sum(list_transform(generate_series(1, 8),
         |           i -> ($a[i] - $b[i]) * ($a[i] - $b[i]))) AS BIGINT)""".stripMargin
    s"""WITH q AS MATERIALIZED (
       |  SELECT vec_id AS id,
       |         list_transform(embedding,
       |           x -> CAST(round_even(CAST(x AS DOUBLE) * 1024, 0) AS BIGINT)) AS q
       |  FROM embeddings),
       |cents AS MATERIALIZED (
       |  SELECT CAST(id AS INT) AS cell, q AS cellq FROM q WHERE id < 8),
       |dists AS MATERIALIZED (
       |  SELECT v.id, c.cell, c.cellq,
       |         ${sq64("v.q", "c.cellq")} AS d
       |  FROM q v, cents c),
       |asg AS MATERIALIZED (
       |  SELECT a.id, a.cell,
       |         list_transform(generate_series(1, 64), i -> v.q[i] - a.cellq[i]) AS r
       |  FROM (SELECT id, cell, cellq,
       |               row_number() OVER (PARTITION BY id ORDER BY d, cell) AS rk
       |        FROM dists) a
       |  JOIN q v ON v.id = a.id
       |  WHERE a.rk = 1),
       |rsub AS MATERIALIZED (
       |  SELECT id, cell, CAST(s AS INT) AS sub, r[(s*8+1):(s*8+8)] AS subq
       |  FROM asg, UNNEST(generate_series(0, 7)) AS u(s)),
       |cb AS MATERIALIZED (
       |  SELECT sub, CAST(id - 8 AS INT) AS code, subq AS cq
       |  FROM rsub WHERE id >= 8 AND id < 24),
       |enc AS MATERIALIZED (
       |  SELECT id, cell, sub, code FROM (
       |    SELECT s.id, s.cell, s.sub, c.code,
       |           row_number() OVER (PARTITION BY s.id, s.sub
       |             ORDER BY ${sq8("s.subq", "c.cq")}, c.code) AS rk
       |    FROM rsub s JOIN cb c ON c.sub = s.sub) WHERE rk = 1),
       |probes AS (
       |  SELECT id AS qid, cell, cellq FROM (
       |    SELECT id, cell, cellq,
       |           row_number() OVER (PARTITION BY id ORDER BY d, cell) AS rk
       |    FROM dists WHERE id < 3) WHERE rk <= 2),
       |qsub AS (
       |  SELECT p.qid, p.cell, CAST(s AS INT) AS sub,
       |         qr[(s*8+1):(s*8+8)] AS subq
       |  FROM (SELECT p0.qid, p0.cell,
       |               list_transform(generate_series(1, 64),
       |                 i -> v.q[i] - p0.cellq[i]) AS qr
       |        FROM probes p0 JOIN q v ON v.id = p0.qid) p,
       |       UNNEST(generate_series(0, 7)) AS u(s)),
       |dt AS (
       |  SELECT s.qid, s.cell, s.sub, c.code,
       |         ${sq8("s.subq", "c.cq")} AS d
       |  FROM qsub s JOIN cb c ON c.sub = s.sub),
       |adc AS (
       |  SELECT dt.qid, e.id AS vec_id, e.cell, CAST(SUM(dt.d) AS BIGINT) AS adc
       |  FROM enc e
       |  JOIN dt ON dt.cell = e.cell AND dt.sub = e.sub AND dt.code = e.code
       |  WHERE e.id <> dt.qid
       |  GROUP BY 1, 2, 3),
       |ranked AS (
       |  SELECT qid, vec_id, cell, adc,
       |         row_number() OVER (PARTITION BY qid ORDER BY adc, vec_id) AS rk
       |  FROM adc)
       |SELECT qid, vec_id, cell, adc, CAST(rk AS INT) AS rk
       |FROM ranked WHERE rk <= 10""".stripMargin
  }

  /** e11's oracle: e06's Lloyd CTE chain supplies the round-2 assignment
    * `a2`; same-cell pairs then rescore with the exact-cosine scheme the
    * e02 oracle uses. The two halves are the EXISTING oracle builders
    * composed, so e11 cannot drift from either e06's clustering or e02's
    * cosine. */
  private def semDedupOracleSql(dims: Int): String =
    s"""WITH q AS MATERIALIZED (
       |  SELECT vec_id AS id,
       |         list_transform(embedding,
       |           x -> CAST(round_even(CAST(x AS DOUBLE) * 1024, 0) AS BIGINT)) AS q
       |  FROM embeddings),
       |c0 AS (SELECT CAST(id AS INT) AS cid, q AS cq FROM q WHERE id < 8),
       |${lloydRoundSql(1, "c0", dims)},
       |${lloydRoundSql(2, "c1", dims)},
       |cells AS MATERIALIZED (SELECT id, CAST(cid AS INT) AS cell FROM a2),
       |cand AS (
       |  SELECT x.id AS id_a, y.id AS id_b, x.cell
       |  FROM cells x JOIN cells y ON x.cell = y.cell AND x.id < y.id),
       |norms AS ($normsSql),
       |dots AS (
       |  SELECT c.id_a, c.id_b, c.cell,
       |         CAST(CAST(SUM(${q9("ea.embedding[i]")} * ${q9("eb.embedding[i]")}) AS VARCHAR) AS DOUBLE) AS d
       |  FROM cand c
       |  JOIN embeddings ea ON ea.vec_id = c.id_a
       |  JOIN embeddings eb ON eb.vec_id = c.id_b,
       |       UNNEST(generate_series(1, len(ea.embedding))) AS u(i)
       |  GROUP BY 1, 2, 3)
       |SELECT id_a, id_b, cell, d / (na.nrm2_sqrt * nb.nrm2_sqrt) AS cos
       |FROM dots
       |JOIN (SELECT vec_id, sqrt(nrm2) AS nrm2_sqrt FROM norms) na ON na.vec_id = id_a
       |JOIN (SELECT vec_id, sqrt(nrm2) AS nrm2_sqrt FROM norms) nb ON nb.vec_id = id_b
       |WHERE d / (na.nrm2_sqrt * nb.nrm2_sqrt) >= 0.4""".stripMargin

  val oracles: Map[String, String] = Map(
    "e06_kmeans_lloyd" -> kmeansOracleSql(64),
    "e11_semdedup_kmeans" -> semDedupOracleSql(64),
    // e14: the full e10 oracle nested as the approx side (its inner `q`
    // CTE is scoped to the subquery, the outer one below is this
    // query's), exact integer-L2 top-10 as the truth side, recall per
    // qid — both sides restricted to the same md5-keyed bounded sample
    // of the query set the Spark path audits (64 does not bind at 3
    // queries, so the capped production shape sits behind the gate)
    "e14_ann_recall" ->
      // approx MATERIALIZED (it is read twice: the sample derivation and
      // the final join); gt bounds the query side to the 64-row sample
      // via an explicit equi-join BEFORE the point product — the earlier
      // `qq.id IN (subquery)` join condition let DuckDB plan a full
      // point x point product filtered late, which at sf1 spilled past
      // 79 GB of temp before dying (docs/SCALE.md addendum 2)
      s"""WITH approx AS MATERIALIZED (
         |$ivfPqOracle
         |),
         |smp AS MATERIALIZED (
         |  SELECT qid FROM (SELECT DISTINCT qid FROM approx)
         |  ORDER BY md5(CAST(qid AS VARCHAR)), qid LIMIT 64),
         |qv14 AS MATERIALIZED (
         |  SELECT vec_id AS id,
         |         list_transform(embedding,
         |           x -> CAST(round_even(CAST(x AS DOUBLE) * 1024, 0) AS BIGINT)) AS q
         |  FROM embeddings),
         |gt AS (
         |  SELECT qid, vec_id FROM (
         |    SELECT qq.id AS qid, p.id AS vec_id,
         |           row_number() OVER (PARTITION BY qq.id ORDER BY
         |             CAST(list_sum(list_transform(generate_series(1, 64),
         |               i -> (p.q[i] - qq.q[i]) * (p.q[i] - qq.q[i]))) AS BIGINT),
         |             p.id) AS rk
         |    FROM (SELECT v.id, v.q FROM qv14 v JOIN smp ON smp.qid = v.id) qq
         |         JOIN qv14 p ON p.id <> qq.id)
         |  WHERE rk <= 10)
         |SELECT qid, n_returned, n_hit, recall,
         |       CAST(COUNT(*) OVER () AS BIGINT) AS n_sampled
         |FROM (
         |  SELECT a.qid,
         |         CAST(COUNT(*) AS BIGINT) AS n_returned,
         |         CAST(COUNT(g.vec_id) AS BIGINT) AS n_hit,
         |         round(CAST(COUNT(g.vec_id) AS DOUBLE) / 10.0, 9) AS recall
         |  FROM approx a
         |  JOIN smp s ON s.qid = a.qid
         |  LEFT JOIN gt g
         |    ON g.qid = a.qid AND g.vec_id = a.vec_id
         |  GROUP BY 1)""".stripMargin,
    // e13: e06's Lloyd CTE chain supplies the round-2 assignment `a2`;
    // the census over (cell, documents.source) is plain SQL on top — the
    // audit cannot drift from the clustering it audits
    "e13_cell_source_mix" ->
      s"""WITH q AS MATERIALIZED (
         |  SELECT vec_id AS id,
         |         list_transform(embedding,
         |           x -> CAST(round_even(CAST(x AS DOUBLE) * 1024, 0) AS BIGINT)) AS q
         |  FROM embeddings),
         |c0 AS (SELECT CAST(id AS INT) AS cid, q AS cq FROM q WHERE id < 8),
         |${lloydRoundSql(1, "c0", 64)},
         |${lloydRoundSql(2, "c1", 64)},
         |cells AS (SELECT id, CAST(cid AS INT) AS cell FROM a2),
         |n AS (
         |  SELECT c.cell, d.source, COUNT(*) AS n_docs
         |  FROM cells c JOIN documents d ON d.doc_id = c.id
         |  GROUP BY 1, 2)
         |SELECT cell, source, n_docs,
         |       round(CAST(n_docs AS DOUBLE) /
         |             CAST(SUM(n_docs) OVER (PARTITION BY cell) AS DOUBLE), 9) AS share
         |FROM n""".stripMargin,
    // e17: e13's cell CTE chain, then d39's PSI SQL with B = 8 over one
    // global population — the drift audit cannot diverge from the
    // clustering it audits
    "e17_cell_drift" ->
      s"""WITH q AS MATERIALIZED (
         |  SELECT vec_id AS id,
         |         list_transform(embedding,
         |           x -> CAST(round_even(CAST(x AS DOUBLE) * 1024, 0) AS BIGINT)) AS q
         |  FROM embeddings),
         |c0 AS (SELECT CAST(id AS INT) AS cid, q AS cq FROM q WHERE id < 8),
         |${lloydRoundSql(1, "c0", 64)},
         |${lloydRoundSql(2, "c1", 64)},
         |h AS (
         |  SELECT CAST(cid AS INT) AS cell,
         |         CAST(sum(CASE WHEN id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_old,
         |         CAST(sum(CASE WHEN id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_new
         |  FROM a2 GROUP BY 1),
         |g AS (
         |  SELECT cell, n_old, n_new,
         |         CAST(sum(n_old) OVER () AS BIGINT) AS n_o,
         |         CAST(sum(n_new) OVER () AS BIGINT) AS n_n
         |  FROM h),
         |t AS (
         |  SELECT cell, n_old, n_new,
         |         round((CAST(n_new + 1 AS DOUBLE) / CAST(n_n + 8 AS DOUBLE)
         |              - CAST(n_old + 1 AS DOUBLE) / CAST(n_o + 8 AS DOUBLE))
         |               * ln(CAST(n_new + 1 AS DOUBLE) * CAST(n_o + 8 AS DOUBLE)
         |                  / (CAST(n_old + 1 AS DOUBLE) * CAST(n_n + 8 AS DOUBLE))), 6) + 0.0
         |           AS psi_term
         |  FROM g)
         |SELECT cell, n_old, n_new, psi_term,
         |       CAST(sum(CAST(psi_term AS DECIMAL(18,6))) OVER ()
         |            AS DOUBLE) AS psi_total
         |FROM t""".stripMargin,
    // e17b: the stored-registry replay — history's occupancy counted
    // over the even-id label slice (the cellLabels registry), the drop
    // assigned separately, the two histograms outer-joined, then the
    // identical PSI arithmetic
    "e17b_cell_drift_stored" ->
      s"""WITH q AS MATERIALIZED (
         |  SELECT vec_id AS id,
         |         list_transform(embedding,
         |           x -> CAST(round_even(CAST(x AS DOUBLE) * 1024, 0) AS BIGINT)) AS q
         |  FROM embeddings),
         |c0 AS (SELECT CAST(id AS INT) AS cid, q AS cq FROM q WHERE id < 8),
         |${lloydRoundSql(1, "c0", 64)},
         |${lloydRoundSql(2, "c1", 64)},
         |old_h AS (
         |  SELECT CAST(cid AS INT) AS cell, CAST(count(*) AS BIGINT) AS n_old
         |  FROM a2 WHERE id % 2 = 0 GROUP BY 1),
         |new_h AS (
         |  SELECT CAST(cid AS INT) AS cell, CAST(count(*) AS BIGINT) AS n_new
         |  FROM a2 WHERE id % 2 = 1 GROUP BY 1),
         |h AS (
         |  SELECT coalesce(o.cell, n.cell) AS cell,
         |         coalesce(o.n_old, 0) AS n_old,
         |         coalesce(n.n_new, 0) AS n_new
         |  FROM old_h o FULL OUTER JOIN new_h n ON o.cell = n.cell),
         |g AS (
         |  SELECT cell, n_old, n_new,
         |         CAST(sum(n_old) OVER () AS BIGINT) AS n_o,
         |         CAST(sum(n_new) OVER () AS BIGINT) AS n_n
         |  FROM h),
         |t AS (
         |  SELECT cell, n_old, n_new,
         |         round((CAST(n_new + 1 AS DOUBLE) / CAST(n_n + 8 AS DOUBLE)
         |              - CAST(n_old + 1 AS DOUBLE) / CAST(n_o + 8 AS DOUBLE))
         |               * ln(CAST(n_new + 1 AS DOUBLE) * CAST(n_o + 8 AS DOUBLE)
         |                  / (CAST(n_old + 1 AS DOUBLE) * CAST(n_n + 8 AS DOUBLE))), 6) + 0.0
         |           AS psi_term
         |  FROM g)
         |SELECT cell, n_old, n_new, psi_term,
         |       CAST(sum(CAST(psi_term AS DECIMAL(18,6))) OVER ()
         |            AS DOUBLE) AS psi_total
         |FROM t""".stripMargin,
    "e10_ivfpq" -> ivfPqOracle,
    "e10b_ivfpq_stored" -> ivfPqOracle,
    // e15: the merged (stored-history ∪ delta) index equals the full
    // rebuild's by construction, so the monolithic build-and-search SQL
    // is the oracle verbatim (the d26b same-oracle convention)
    "e15_ivfpq_incr" -> ivfPqOracle,
    "e08_pq_encode" ->
      s"""WITH $pqCte
         |SELECT id AS vec_id,
         |       string_agg(CAST(code AS VARCHAR), '-' ORDER BY sub) AS code_str,
         |       CAST(SUM(d) AS BIGINT) AS recon_err
         |FROM enc GROUP BY 1""".stripMargin,
    "e09_pq_adc" ->
      s"""WITH $pqCte,
         |qs AS (SELECT id AS qid, sub, subq FROM sub WHERE id < 3),
         |dt AS (
         |  SELECT q.qid, c.sub, c.code,
         |         CAST(list_sum(list_transform(generate_series(1, 8),
         |           i -> (q.subq[i] - c.cq[i]) * (q.subq[i] - c.cq[i]))) AS BIGINT) AS d
         |  FROM qs q JOIN cb c ON c.sub = q.sub),
         |adc AS (
         |  SELECT dt.qid, e.id AS vec_id, CAST(SUM(dt.d) AS BIGINT) AS adc
         |  FROM enc e JOIN dt ON dt.sub = e.sub AND dt.code = e.code
         |  WHERE e.id <> dt.qid
         |  GROUP BY 1, 2),
         |ranked AS (
         |  SELECT qid, vec_id, adc,
         |         row_number() OVER (PARTITION BY qid ORDER BY adc, vec_id) AS rk
         |  FROM adc)
         |SELECT qid, vec_id, adc, CAST(rk AS INT) AS rk
         |FROM ranked WHERE rk <= 10""".stripMargin,
    "e03_knn_approx" ->
      s"""WITH qv AS MATERIALIZED (
         |  SELECT vec_id,
         |         list_transform(embedding,
         |           x -> CAST(round_even(CAST(x AS DOUBLE) * 1e9, 0) AS BIGINT)) AS q
         |  FROM embeddings),
         |planes AS (SELECT * FROM (VALUES
         |${planesSql(64, 6)}) p(j, w)),
         |pdots AS (
         |  SELECT v.vec_id, p.j, SUM(v.q[i] * p.w[i]) AS d
         |  FROM qv v, planes p, UNNEST(generate_series(1, len(v.q))) AS u(i)
         |  GROUP BY 1, 2),
         |-- MATERIALIZED: `be` is referenced twice below; DuckDB inlines
         |-- plain CTEs per reference and would re-run the bucket pipeline
         |buckets AS MATERIALIZED (
         |  SELECT vec_id, CAST(SUM(CASE WHEN d > 0 THEN 1 << j ELSE 0 END) AS BIGINT) AS bucket
         |  FROM pdots GROUP BY 1),
         |be AS MATERIALIZED (
         |  SELECT e.vec_id, e.embedding, b.bucket
         |  FROM embeddings e JOIN buckets b ON b.vec_id = e.vec_id),
         |norms AS ($normsSql),
         |dots AS (
         |  SELECT q.vec_id AS qid, c.vec_id AS vec_id,
         |         CAST(CAST(SUM(${q9("q.embedding[i]")} * ${q9("c.embedding[i]")}) AS VARCHAR) AS DOUBLE) AS d
         |  FROM be q, be c, UNNEST(generate_series(1, len(q.embedding))) AS u(i)
         |  WHERE q.bucket = c.bucket AND q.vec_id <> c.vec_id
         |  GROUP BY 1, 2),
         |scored AS (
         |  SELECT qid, dots.vec_id AS vec_id,
         |         d / (sqrt(nq.nrm2) * sqrt(nc.nrm2)) AS cos
         |  FROM dots
         |  JOIN norms nq ON nq.vec_id = qid
         |  JOIN norms nc ON nc.vec_id = dots.vec_id),
         |ranked AS (
         |  SELECT qid, vec_id, cos,
         |         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rk
         |  FROM scored)
         |SELECT qid, vec_id, cos, CAST(rk AS INT) AS rk FROM ranked WHERE rk <= 10""".stripMargin,
    "e16_assign_margin" ->
      s"""WITH norms AS ($normsSql),
         |cents AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings WHERE vec_id < 8),
         |dots AS (
         |  SELECT e.vec_id, c.cid,
         |         CAST(CAST(SUM(${q9("e.embedding[i]")} * ${q9("c.cvec[i]")}) AS VARCHAR) AS DOUBLE) AS d
         |  FROM embeddings e, cents c, UNNEST(generate_series(1, len(e.embedding))) AS u(i)
         |  WHERE e.vec_id >= 8
         |  GROUP BY 1, 2),
         |scored AS (
         |  SELECT dots.vec_id AS vec_id, cid,
         |         d / (sqrt(ne.nrm2) * sqrt(nc.nrm2)) AS cos
         |  FROM dots
         |  JOIN norms ne ON ne.vec_id = dots.vec_id
         |  JOIN norms nc ON nc.vec_id = cid),
         |ranked AS (
         |  SELECT vec_id, cid, cos,
         |         row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid) AS rk
         |  FROM scored)
         |SELECT a.vec_id, a.cid AS cid1, b.cid AS cid2,
         |       a.cos AS cos1, b.cos AS cos2,
         |       a.cos - b.cos AS margin,
         |       CASE WHEN a.cos - b.cos < 0.05 THEN 1 ELSE 0 END AS ambiguous
         |FROM ranked a JOIN ranked b ON a.vec_id = b.vec_id AND b.rk = 2
         |WHERE a.rk = 1""".stripMargin,
    "e04_centroid_assign" ->
      s"""WITH norms AS ($normsSql),
         |cents AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings WHERE vec_id < 8),
         |dots AS (
         |  SELECT e.vec_id, c.cid,
         |         CAST(CAST(SUM(${q9("e.embedding[i]")} * ${q9("c.cvec[i]")}) AS VARCHAR) AS DOUBLE) AS d
         |  FROM embeddings e, cents c, UNNEST(generate_series(1, len(e.embedding))) AS u(i)
         |  WHERE e.vec_id >= 8
         |  GROUP BY 1, 2),
         |scored AS (
         |  SELECT dots.vec_id AS vec_id, cid,
         |         d / (sqrt(ne.nrm2) * sqrt(nc.nrm2)) AS cos
         |  FROM dots
         |  JOIN norms ne ON ne.vec_id = dots.vec_id
         |  JOIN norms nc ON nc.vec_id = cid),
         |ranked AS (
         |  SELECT vec_id, cid, cos,
         |         row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid) AS rk
         |  FROM scored)
         |SELECT vec_id, cid, cos FROM ranked WHERE rk = 1""".stripMargin,
    "e01_knn_brute" ->
      s"""WITH norms AS ($normsSql),
         |q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 5),
         |dots AS (
         |  SELECT q.qid, c.vec_id AS vec_id,
         |         CAST(CAST(SUM(${q9("q.qv[i]")} * ${q9("c.embedding[i]")}) AS VARCHAR) AS DOUBLE) AS d
         |  FROM q, embeddings c, UNNEST(generate_series(1, len(c.embedding))) AS u(i)
         |  WHERE q.qid <> c.vec_id
         |  GROUP BY 1, 2),
         |scored AS (
         |  SELECT qid, dots.vec_id AS vec_id,
         |         d / (sqrt(nq.nrm2) * sqrt(nc.nrm2)) AS cos
         |  FROM dots
         |  JOIN norms nq ON nq.vec_id = qid
         |  JOIN norms nc ON nc.vec_id = dots.vec_id),
         |ranked AS (
         |  SELECT qid, vec_id, cos,
         |         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rk
         |  FROM scored)
         |SELECT qid, vec_id, cos, CAST(rk AS INT) AS rk FROM ranked WHERE rk <= 10""".stripMargin,
    "e02_cosine_neardup" -> nearDupOracle(""),
    // the incremental run's contract: the monolithic rerun restricted to
    // pairs touching a new (odd-id) vector
    "e07_incr_neardup" -> nearDupOracle(" AND (id_a % 2 = 1 OR id_b % 2 = 1)"),
    // e07b: the BUCKETED incremental contract — same-bucket (e03's quantized
    // plane family, 6 planes) new-touching pairs, exact cosine >= 0.4; the
    // candidate CTE mirrors Knn.incrementalBucketCandidates' union of
    // new-old and new-new same-bucket pairs exactly
    "e07b_incr_neardup_stored" -> bucketedIncrNearDupOracle,
    // e18: the adaptive multi-probe contract in its pair-symmetric form —
    // candidates are EXACTLY the pairs whose signatures differ in <= 2
    // bits (probing buckets at hamming <= 2 of sig_q is the same set;
    // AdaptiveNearDupSpec proves the equivalence), the plane count is
    // re-derived from COUNT(*) with the e18 law, signatures replay from
    // the shared prefix-stable 20-plane matrix, and the exact cosine is
    // computed ONCE per unordered pair (cos is symmetric) then ranked
    // from both directions with the vec_id tie rule. Quadratic in SQL
    // (judge-convention, like e19's) — the engine side is the banded
    // multi-probe.
    "e18_ann_adaptive" ->
      s"""WITH qv AS MATERIALIZED (
         |  SELECT vec_id,
         |         list_transform(embedding,
         |           x -> CAST(round_even(CAST(x AS DOUBLE) * 1e9, 0) AS BIGINT)) AS q
         |  FROM embeddings),
         |nn AS (SELECT COUNT(*) AS n FROM embeddings),
         |pp AS (SELECT COALESCE(MIN(p), 20) AS p
         |       FROM generate_series(1, 20) t(p), nn
         |       WHERE power(2.0, p) / (1 + p + p*(p-1)/2) >= n / 512.0),
         |planes AS (SELECT * FROM (VALUES
         |${planesSql(64, 20)}) p(j, w)),
         |pdots AS (
         |  SELECT v.vec_id, p.j, SUM(v.q[i] * p.w[i]) AS d
         |  FROM qv v, planes p, pp, UNNEST(generate_series(1, len(v.q))) AS u(i)
         |  WHERE p.j < pp.p
         |  GROUP BY 1, 2),
         |buckets AS MATERIALIZED (
         |  SELECT vec_id, CAST(SUM(CASE WHEN d > 0 THEN 1 << j ELSE 0 END) AS BIGINT) AS bucket
         |  FROM pdots GROUP BY 1),
         |cpair AS MATERIALIZED (
         |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
         |  FROM buckets a JOIN buckets b
         |    ON a.vec_id < b.vec_id
         |  WHERE bit_count(xor(a.bucket, b.bucket)) <= 2),
         |norms AS ($normsSql),
         |cdots AS (
         |  SELECT c.id_a, c.id_b,
         |         CAST(CAST(SUM(${q9("ea.embedding[i]")} * ${q9("eb.embedding[i]")}) AS VARCHAR) AS DOUBLE) AS d
         |  FROM cpair c
         |  JOIN embeddings ea ON ea.vec_id = c.id_a
         |  JOIN embeddings eb ON eb.vec_id = c.id_b,
         |       UNNEST(generate_series(1, len(ea.embedding))) AS u(i)
         |  GROUP BY 1, 2),
         |pcos AS MATERIALIZED (
         |  SELECT id_a, id_b, d / (na.nr * nb.nr) AS cos
         |  FROM cdots
         |  JOIN (SELECT vec_id, sqrt(nrm2) AS nr FROM norms) na ON na.vec_id = id_a
         |  JOIN (SELECT vec_id, sqrt(nrm2) AS nr FROM norms) nb ON nb.vec_id = id_b),
         |cand AS (
         |  SELECT id_a AS qid, id_b AS vec_id, cos FROM pcos
         |  UNION ALL
         |  SELECT id_b, id_a, cos FROM pcos),
         |ranked AS (
         |  SELECT qid, vec_id, cos,
         |         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rk
         |  FROM cand)
         |SELECT qid, vec_id, cos, CAST(rk AS INT) AS rk
         |FROM ranked WHERE rk <= 10""".stripMargin,
    "e19_incr_neardup_adaptive" ->
      s"""WITH $adaptivePairsCtes
         |SELECT id_a, id_b, cos FROM apairs""".stripMargin,
    // e20: the d33-family recursive min-label walk over e19's pair surface
    "e20_semdedup_adaptive" ->
      s"""WITH RECURSIVE $adaptivePairsCtes,
         |edges AS MATERIALIZED (
         |          SELECT id_a AS a, id_b AS b FROM apairs
         |          UNION ALL SELECT id_b, id_a FROM apairs),
         |walk(id, r) AS (
         |  SELECT DISTINCT a, a FROM edges
         |  UNION
         |  SELECT w.id, e.b FROM walk w JOIN edges e ON e.a = w.r),
         |cl AS (SELECT id AS vec_id, min(r) AS cluster_id FROM walk GROUP BY 1)
         |SELECT vec_id, cluster_id,
         |       count(*) OVER (PARTITION BY cluster_id) AS n_members,
         |       vec_id = cluster_id AS keep
         |FROM cl""".stripMargin,
    "e05_semantic_clusters" -> e05OracleSql,
    // e12: the SAME monolithic rerun — the Spark path is the incremental
    // composition (stored labels + new-touching exact pairs), so the
    // correctness gate itself enforces incremental == full
    "e12_incr_semclusters" -> e05OracleSql,
    // e12b: the BUCKETED maintenance contract — walk over (exact
    // even-even pairs, the stored labels' provenance) ∪ (same-bucket
    // new-touching pairs at exact cosine ≥ 0.4, e07b's candidate CTEs)
    "e12b_incr_semclusters_stored" ->
      s"""WITH RECURSIVE qv AS MATERIALIZED (
         |  SELECT vec_id,
         |         list_transform(embedding,
         |           x -> CAST(round_even(CAST(x AS DOUBLE) * 1e9, 0) AS BIGINT)) AS q
         |  FROM embeddings),
         |planes AS (SELECT * FROM (VALUES
         |${planesSql(64, 6)}) p(j, w)),
         |pdots AS (
         |  SELECT v.vec_id, p.j, SUM(v.q[i] * p.w[i]) AS d
         |  FROM qv v, planes p, UNNEST(generate_series(1, len(v.q))) AS u(i)
         |  GROUP BY 1, 2),
         |buckets AS MATERIALIZED (
         |  SELECT vec_id, CAST(SUM(CASE WHEN d > 0 THEN 1 << j ELSE 0 END) AS BIGINT) AS bucket
         |  FROM pdots GROUP BY 1),
         |bcand AS (
         |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
         |  FROM buckets a JOIN buckets b
         |    ON a.bucket = b.bucket AND a.vec_id < b.vec_id
         |  WHERE a.vec_id % 2 = 1 OR b.vec_id % 2 = 1),
         |norms AS ($normsSql),
         |nrm AS MATERIALIZED (SELECT vec_id, sqrt(nrm2) AS nr FROM norms),
         |bdots AS (
         |  SELECT c.id_a, c.id_b,
         |         CAST(CAST(SUM(${q9("ea.embedding[i]")} * ${q9("eb.embedding[i]")}) AS VARCHAR) AS DOUBLE) AS d
         |  FROM bcand c
         |  JOIN embeddings ea ON ea.vec_id = c.id_a
         |  JOIN embeddings eb ON eb.vec_id = c.id_b,
         |       UNNEST(generate_series(1, len(ea.embedding))) AS u(i)
         |  GROUP BY 1, 2),
         |bp AS (
         |  SELECT id_a, id_b FROM bdots
         |  JOIN nrm na ON na.vec_id = id_a
         |  JOIN nrm nb ON nb.vec_id = id_b
         |  WHERE d / (na.nr * nb.nr) >= 0.4),
         |edots AS (
         |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |         CAST(CAST(SUM(${q9("a.embedding[i]")} * ${q9("b.embedding[i]")}) AS VARCHAR) AS DOUBLE) AS d
         |  FROM embeddings a, embeddings b, UNNEST(generate_series(1, len(a.embedding))) AS u(i)
         |  WHERE a.vec_id < b.vec_id AND a.vec_id % 2 = 0 AND b.vec_id % 2 = 0
         |  GROUP BY 1, 2),
         |ep AS (
         |  SELECT id_a, id_b FROM edots
         |  JOIN nrm na ON na.vec_id = id_a
         |  JOIN nrm nb ON nb.vec_id = id_b
         |  WHERE d / (na.nr * nb.nr) >= 0.4),
         |pairs AS MATERIALIZED (SELECT * FROM ep UNION ALL SELECT * FROM bp),
         |edges AS MATERIALIZED (
         |          SELECT id_a AS a, id_b AS b FROM pairs
         |          UNION ALL SELECT id_b, id_a FROM pairs),
         |walk(id, r) AS (
         |  SELECT DISTINCT a, a FROM edges
         |  UNION
         |  SELECT w.id, e.b FROM walk w JOIN edges e ON e.a = w.r),
         |cl AS (SELECT id AS vec_id, min(r) AS cluster_id FROM walk GROUP BY 1)
         |SELECT vec_id, cluster_id,
         |       count(*) OVER (PARTITION BY cluster_id) AS n_members,
         |       vec_id = cluster_id AS keep
         |FROM cl""".stripMargin)

  /** e05's full oracle — the monolithic recursive-CC rerun over the
    * corpus's exact cosine pairs; shared verbatim with e12. */
  private def e05OracleSql: String =
    s"""WITH RECURSIVE norms AS ($normsSql),
       |dots AS (
       |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       |         CAST(CAST(SUM(${q9("a.embedding[i]")} * ${q9("b.embedding[i]")}) AS VARCHAR) AS DOUBLE) AS d
       |  FROM embeddings a, embeddings b, UNNEST(generate_series(1, len(a.embedding))) AS u(i)
       |  WHERE a.vec_id < b.vec_id
       |  GROUP BY 1, 2),
       |-- MATERIALIZED, twice: DuckDB inlines plain CTEs per reference,
       |-- so un-materialized `pairs` runs its O(n^2 * dim) dots pipeline
       |-- once per edge direction, and an un-materialized `edges` re-runs
       |-- it in EVERY iteration of the recursive walk (measured: minutes
       |-- instead of seconds at sf0.1)
       |pairs AS MATERIALIZED (
       |  SELECT id_a, id_b
       |  FROM dots
       |  JOIN (SELECT vec_id, sqrt(nrm2) AS na FROM norms) x ON x.vec_id = id_a
       |  JOIN (SELECT vec_id, sqrt(nrm2) AS nb FROM norms) y ON y.vec_id = id_b
       |  WHERE d / (na * nb) >= 0.4),
       |edges AS MATERIALIZED (
       |          SELECT id_a AS a, id_b AS b FROM pairs
       |          UNION ALL SELECT id_b, id_a FROM pairs),
       |walk(id, r) AS (
       |  SELECT DISTINCT a, a FROM edges
       |  UNION
       |  SELECT w.id, e.b FROM walk w JOIN edges e ON e.a = w.r),
       |cl AS (SELECT id AS vec_id, min(r) AS cluster_id FROM walk GROUP BY 1)
       |SELECT vec_id, cluster_id,
       |       count(*) OVER (PARTITION BY cluster_id) AS n_members,
       |       vec_id = cluster_id AS keep
       |FROM cl""".stripMargin
}
