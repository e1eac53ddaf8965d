package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.dedup.Shingles
import graft.ops.{AsOfJoin, ConnectedComponents, RangeJoin, Sampling}
import graft.text.TextMetrics

/** Training-data-pipeline operators the reference does not have but a
  * 100 TB curation deployment needs — each one is a scale-shaped custom
  * operator from [[graft.ops]] bound to an oracle:
  *
  *  - q44: as-of join (union+carry, one shuffle — [[AsOfJoin]]) vs
  *    DuckDB's NATIVE `ASOF LEFT JOIN` operator, i.e. two independent
  *    implementations of the same semantics.
  *  - q45: interval join ([[RangeJoin]] coarse-bucket equi-join) vs
  *    DuckDB's range-join planner (IEJoin).
  *  - q46: deterministic md5 train/val/test split ([[Sampling]]) —
  *    engine-portable by construction, asserted by the oracle.
  *  - q47: sequence packing — documents concatenated per source stream and
  *    chunked at a token capacity, the batch-shaping step before LLM
  *    pretraining; exact integer window arithmetic.
  *  - q48: near-dup clusters — [[ConnectedComponents]] min-label
  *    propagation over the exact-Jaccard pairs (d04), vs a DuckDB
  *    recursive-CTE reachability closure. Driver-side iteration with a
  *    distributed body (each round is one join + one groupBy).
  */
object PipelineQ {

  private def us(c: String) = expr(s"$c div 1000")

  /** Most recent prior click for every purchase, per user (attribution).
    * Runs through the NATIVE operator ([[graft.plans.AsOfJoinExec]], an
    * SMJ-style streamed merge) — AsOfJoinExecSpec proves it equal to the
    * union+window formulation, and this binding puts the custom physical
    * operator itself behind the DuckDB oracle gate. */
  def asofAttribution(s: SparkSession, dir: String): DataFrame = {
    graft.GraftExtensions.registerAll(s) // idempotent; installs the strategy
    val ev = Tables(s, dir).events
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), us("ts").as("p_us"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), us("ts").as("c_us"))
    AsOfJoin.backwardMerge(purchases, clicks, Seq("user_id"), "p_us", "c_us")
      .withColumn("gap_us", col("p_us") - col("c_us"))
  }

  /** Purchases landing inside each error's 5-minute blast window — a pure
    * range join with no equi-key, bucketized at the window width. */
  def intervalJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables(s, dir).events
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id"), us("ts").as("s_us"),
        (us("ts") + 300000000L).as("e_us"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(us("ts").as("p_us"))
    RangeJoin.pointsInIntervalsLeft(errors, purchases,
        "s_us", "e_us", "p_us", bucketWidth = 300000000L)
      .groupBy("event_id", "s_us")
      .agg(count(col("p_us")).as("n_purchases"))
  }

  private val splitFractions = Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)

  /** Deterministic split census: every document hashed into train/val/test,
    * rolled up per split and language. */
  def hashSplit(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).documents
      .withColumn("split", Sampling.md5Split(col("doc_id"), splitFractions))
      .groupBy("split", "lang")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))

  /** Sequence packing: per-source document stream chunked at 2048 BPE
    * tokens. The window is partitioned by source — at cluster scale the
    * stream is sharded (source, shard) so no single task owns a source;
    * exact global packing would use [[graft.ops.GlobalOrder]]. */
  def seqPacking(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    Tables(s, dir).documents
      .select(col("doc_id"), col("source"),
        TextMetrics.bpeTokenCount(col("text")).cast("long").as("n_bpe"))
      .withColumn("offset_in_stream", coalesce(sum(col("n_bpe")).over(w), lit(0L)))
      .withColumn("chunk_id", expr("offset_in_stream div 2048"))
  }

  /** Dataset-mixture sampling: a driver-provided weights table assigns
    * every source a target keep-rate; rows are kept deterministically via
    * [[Sampling.md5Keep]] after a broadcast join — the composition step
    * that turns N crawled sources into one training mix at fixed
    * proportions, reproducible across engines and runs. */
  def mixtureSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val rates = Seq(1.0, 0.5, 0.25, 0.1)
    val weights = (0 until 20).map(i => (s"src$i", rates(i % 4)))
      .toDF("source", "rate")
    Tables(s, dir).documents
      .join(broadcast(weights), Seq("source"))
      .filter(Sampling.md5Keep(col("doc_id"), col("rate")))
      .groupBy("source", "rate")
      .agg(count(lit(1)).as("n_kept"), sum(col("n_chars")).as("total_chars"))
  }

  /** Near-duplicate clusters from the exact-Jaccard pairs: connected
    * components, cluster id = min doc_id in the component. */
  def dupClusters(s: SparkSession, dir: String): DataFrame = {
    // spread: tokenize+shingle before the postings shuffle — see Tables.spread
    val pairs = Shingles.jaccardPairs(Tables.spread(Tables(s, dir).documents, "doc_id"),
      "doc_id", "text", n = 3, minJaccard = 0.5, maxShingleDf = Some(64))
    val cl = ConnectedComponents.clusters(pairs, "id_a", "id_b")
      .withColumnRenamed("id", "doc_id")
    val sizes = cl.groupBy("cluster_id").agg(count(lit(1)).as("n_members"))
    cl.join(sizes, Seq("cluster_id"))
      .select("doc_id", "cluster_id", "n_members")
  }

  /** Relative target weights per source (ppm-style integers) for the
    * mixture planner — stands in for offline-chosen mixing proportions. */
  private val mixtureWeights: Seq[(String, Long)] =
    (0 until 20).map(i => (s"src$i", Seq(100000L, 75000L, 50000L, 25000L)(i % 4)))

  /** Token-budget mixture planning — the data-mixing decision before
    * pretraining: given relative target weights per source and a global
    * char budget (half the corpus here), compute each source's allocation,
    * sampling rate, and epoch count. rate_ppm < 1e6 → downsample (q49's
    * md5Keep executes it); epochs_ppm > 1e6 → the source must repeat to
    * fill its allocation. ALL integer arithmetic (decimal-widened before
    * multiply — bigint × ppm overflows long at corpus scale), floor
    * division in both engines, so the plan is bit-identical and
    * oracle-checkable. One groupBy + broadcast joins of three one-row/
    * tiny frames; nothing scales with the corpus but the census. */
  def mixturePlan(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables(s, dir).documents
    val weights = mixtureWeights.toDF("source", "w")
    val perSource = docs.groupBy("source")
      .agg(sum(col("n_chars")).as("n_chars_src"))
    val totals = docs.agg(expr("sum(n_chars) div 2").as("budget"))
    val sumW = weights.agg(sum(col("w")).as("w_sum"))
    perSource.join(broadcast(weights), Seq("source"))
      .crossJoin(broadcast(totals)).crossJoin(broadcast(sumW))
      .withColumn("planned_chars",
        expr("(cast(budget as decimal(38,0)) * w) div w_sum"))
      .withColumn("rate_ppm",
        least(lit(1000000L),
          expr("(cast(planned_chars as decimal(38,0)) * 1000000) div n_chars_src")))
      .withColumn("epochs_ppm",
        expr("(cast(planned_chars as decimal(38,0)) * 1000000) div n_chars_src"))
      .select("source", "n_chars_src", "w", "planned_chars", "rate_ppm", "epochs_ppm")
  }

  /** Temperature-scaled source mixture (d38) — the DATA-DERIVED sibling of
    * d27's fixed-weight plan: sampling weights proportional to
    * n_chars_src^(1/T) with T = 2 (the α = 0.5 posture of multilingual /
    * multi-source pretraining — big sources damped, small sources boosted),
    * plus a UniMax-style repetition cap at 4 epochs so no small source is
    * asked to repeat unboundedly. The fractional power is the one
    * engine-portability hazard, solved by construction: w = floor(sqrt(n))
    * on integers — IEEE-754 sqrt is CORRECTLY ROUNDED, so Spark and DuckDB
    * produce the identical double for the identical bigint (exact below
    * 2^52 ≈ 4.5e15 chars/source, comfortably above 100 TB/source), and
    * everything downstream is decimal-widened integer floor-division
    * exactly like d27. Same scale shape as d27: one census groupBy, then
    * broadcast joins of one-row frames — nothing but the census touches
    * per-document data. */
  def temperatureMix(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables(s, dir).documents
    val perSource = docs.groupBy("source")
      .agg(sum(col("n_chars")).as("n_chars_src"))
      .withColumn("w_sqrt",
        floor(sqrt(col("n_chars_src").cast("double"))).cast("long"))
    val budget = docs.agg(sum(col("n_chars")).as("budget"))
    val sumW = perSource.agg(sum(col("w_sqrt")).as("w_sum"))
    perSource.crossJoin(broadcast(budget)).crossJoin(broadcast(sumW))
      .withColumn("share_ppm",
        expr("(cast(w_sqrt as decimal(38,0)) * 1000000) div w_sum"))
      .withColumn("planned_chars",
        expr("(cast(budget as decimal(38,0)) * w_sqrt) div w_sum"))
      .withColumn("epochs_ppm",
        expr("(cast(planned_chars as decimal(38,0)) * 1000000) div n_chars_src"))
      .withColumn("capped", col("epochs_ppm") > lit(4000000L))
      .withColumn("planned_capped_chars",
        least(col("planned_chars"), expr("4 * n_chars_src")))
      .select("source", "n_chars_src", "w_sqrt", "share_ppm",
        "planned_chars", "epochs_ppm", "capped", "planned_capped_chars")
  }

  /** Temperature mixture, production shape (d38b) — the same plan as
    * [[temperatureMix]], computed ENTIRELY from the stored per-source
    * census ([[graft.store.Registries.sourceCensus]]): a nightly
    * mixture re-plan costs ~20 registry rows and ZERO corpus scans at
    * any corpus size — the extreme end of the stored-twin family, where
    * the probe touches no base table at all. The sum-by-key on read
    * makes the stored single-row and streamed delta-row registry
    * layouts interchangeable
    * ([[graft.streaming.DocStreams.sourceCensusStream]] maintains the
    * deltas). Bitwise-equal to d38 by construction — identical decimal
    * floor-div arithmetic on the same exact integers (the budget is the
    * sum of per-source sums, associativity on longs) — pinned as a
    * ScaleInvariants pair. */
  def temperatureMixStored(s: SparkSession, dir: String): DataFrame = {
    val perSource = graft.store.Registries.sourceCensus(s, dir)
      .groupBy("source").agg(sum(col("n_chars_src")).as("n_chars_src"))
      .withColumn("w_sqrt",
        floor(sqrt(col("n_chars_src").cast("double"))).cast("long"))
    val budget = perSource.agg(sum(col("n_chars_src")).as("budget"))
    val sumW = perSource.agg(sum(col("w_sqrt")).as("w_sum"))
    perSource.crossJoin(broadcast(budget)).crossJoin(broadcast(sumW))
      .withColumn("share_ppm",
        expr("(cast(w_sqrt as decimal(38,0)) * 1000000) div w_sum"))
      .withColumn("planned_chars",
        expr("(cast(budget as decimal(38,0)) * w_sqrt) div w_sum"))
      .withColumn("epochs_ppm",
        expr("(cast(planned_chars as decimal(38,0)) * 1000000) div n_chars_src"))
      .withColumn("capped", col("epochs_ppm") > lit(4000000L))
      .withColumn("planned_capped_chars",
        least(col("planned_chars"), expr("4 * n_chars_src")))
      .select("source", "n_chars_src", "w_sqrt", "share_ppm",
        "planned_chars", "epochs_ppm", "capped", "planned_capped_chars")
  }

  /** Leakage-free split — the eval-hygiene upgrade of q46: a document's
    * split is decided by the md5 of its near-dup CLUSTER representative
    * (q48's connected components; singletons represent themselves), so a
    * whole near-dup cluster lands on ONE side and no held-out doc has a
    * training near-twin. q50 checks contamination against EXTERNAL
    * benchmarks; this closes the INTERNAL train/test leak. Census output
    * (the per-doc assignment is the obvious projection). */
  def leakFreeSplit(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables(s, dir).documents
    // cluster table from the STORED registry (the dedup stage's persisted
    // output, same artifact d31 probes) — the split consumer never
    // re-runs pair generation + CC; q48 is the benched from-scratch build
    val cl = graft.store.Registries.dupClusters(s, dir)
    docs.join(cl.select(col("doc_id"), col("cluster_id")), Seq("doc_id"), "left")
      .withColumn("rep", coalesce(col("cluster_id"), col("doc_id")))
      .withColumn("split", Sampling.md5Split(col("rep"), splitFractions))
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("rep")).as("n_groups"),
        sum(col("n_chars")).as("total_chars"))
  }

  /** Benchmark-contamination scan: which training documents share enough
    * word 5-grams with a held-out benchmark set to be contaminated (the
    * pre-training hygiene check run before every eval). Benchmark side is
    * tiny by construction, so its exploded shingle table broadcasts and
    * the probe costs one scan of the training corpus + one aggregation —
    * no shuffle of the training shingles for the join. Here the
    * "benchmark" is the deterministic 2% slice doc_id % 50 = 0. */
  def contamination(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables(s, dir).documents
    // shared with the streaming twin (graft.streaming.DocStreams): the
    // SAME pair-scan + rollup code runs batch here and incrementally
    // there, so the two cannot drift; DocStreamsSpec replays this table
    // through the stream and asserts equality with this query
    graft.streaming.DocStreams.contaminationRollup(
      graft.streaming.DocStreams.contaminationStream(
        docs.filter(col("doc_id") % 50 =!= 0),
        docs.filter(col("doc_id") % 50 === 0)))
  }

  /** N-gram-level benchmark contamination — the shingle-resolution
    * refinement of q50's segment scan (the "13-gram overlap" audit of
    * published contamination analyses, n=5 word-grams here to fit the
    * corpus's document sizes): for every eval doc (doc_id % 50 == 0,
    * q50's benchmark split) the fraction of its DISTINCT 5-grams that
    * occur ANYWHERE in the training corpus. One corpus scan, one shuffle
    * on the shingle key (window max: "any train doc carries this gram"),
    * one doc-keyed aggregation — never doc × doc pairs, so the shuffle is
    * bounded by corpus n-gram volume (the irreducible cost of the scan)
    * rather than any quadratic blowup. Docs under 5 tokens carry no
    * 5-gram and drop out, both engines alike. */
  def ngramContamination(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // SINGLE-SCAN shape (r8): tag each doc train/eval, shingle the corpus
    // ONCE into 8-byte hashed shingles, and resolve "does any train doc
    // carry this gram" with a shingle-partitioned window max instead of a
    // join — one documents scan, one shuffle on the shingle key, one
    // doc-key aggregation. The previous two-side formulation scanned and
    // re-shingled the 98% train corpus separately (1.04 s -> 0.38 s quiet
    // at sf0.1). Hashed shingles follow d04's contract: xxhash64 is
    // injective on every observed shingle set (the string-SQL oracle
    // stays cell-exact unless a 2^-64 collision occurs in the data).
    // The steady-state audit probes the stored registry instead (q57b).
    val sh = Tables(s, dir).documents
      .select(col("doc_id"), (col("doc_id") % 50 =!= 0).as("__train"),
        explode(graft.functions.ShingleHashesFn.shingleHashes(
          col("text"), 5, distinct = true)).as("sh"))
    sh.withColumn("__hit",
        max(when(col("__train"), 1).otherwise(0))
          .over(Window.partitionBy(col("sh"))))
      .filter(!col("__train"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(col("__hit")).cast("long").as("n_contaminated"))
      .withColumn("contamination",
        round(col("n_contaminated").cast("double") / col("n_grams").cast("double"), 9))
  }

  /** q57's steady-state twin: eval shingles probe the STORED train
    * distinct-shingle registry ([[graft.store.Registries.trainShingles]]
    * — parquet on disk, the table the streaming twin maintains
    * incrementally), so the benched cost is shingling the 2% eval slice
    * plus one registry join; q57 itself re-shingles the 98% train corpus
    * every run (the audit-from-scratch worst case). Same oracle as q57 —
    * the registry holds exactly the train corpus's distinct 5-grams.
    * Measured sf0.1→sf1 exponent 0.27 vs q57's 0.52 (docs/SCALE.md). */
  def ngramContaminationStored(s: SparkSession, dir: String): DataFrame = {
    val evalSh = Shingles.explodeShingles(
      Tables(s, dir).documents.filter(col("doc_id") % 50 === 0),
      "doc_id", "text", 5)
    evalSh.join(graft.store.Registries.trainShingles(s, dir)
        .withColumn("__hit", lit(1)), Seq("shingle"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("__hit").isNotNull, 1L).otherwise(0L)).as("n_contaminated"))
      .withColumn("contamination",
        round(col("n_contaminated").cast("double") / col("n_grams").cast("double"), 9))
  }

  /** Exact stratified sample: first ceil(|stratum|/10) docs of every
    * (source, lang) stratum in md5 order ([[Sampling.stratifiedExact]]) —
    * the exact-quota counterpart of q49's binomial mixture sampling. */
  def stratifiedSample(s: SparkSession, dir: String): DataFrame =
    Sampling.stratifiedExact(Tables(s, dir).documents,
        strata = Seq("source", "lang"), key = col("doc_id"),
        rateNum = 1, rateDen = 10)
      .select(col("doc_id"), col("source"), col("lang"),
        col("pick_rank"), col("n_stratum"))

  /** Interval-OVERLAP join (both sides ranges — the shape q45's
    * points-in-intervals cannot express): error windows × purchase windows
    * within ±2 minutes, via [[RangeJoin.intervalsOverlap]]'s double-sided
    * coarse-bucket equi-join. DuckDB's range-join planner (IEJoin) is the
    * oracle. */
  def overlapJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables(s, dir).events
    val win = 120000000L // 2 minutes in µs
    val e = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("err_id"), expr("ts div 1000").as("e_s"),
        (expr("ts div 1000") + win).as("e_e"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("pur_id"), expr("ts div 1000").as("p_s"),
        (expr("ts div 1000") + win).as("p_e"))
    RangeJoin.intervalsOverlap(e, p, "err_id", "e_s", "e_e",
      "pur_id", "p_s", "p_e", bucketWidth = win)
  }

  /** Deterministic global training order ([[Sampling.trainOrder]]): the
    * seeded md5 permutation a pretraining run shards the corpus by — one
    * exchange on the shard key, per-shard independent sort, no global
    * sort. Seed 42, 8 shards. */
  def trainOrder(s: SparkSession, dir: String): DataFrame =
    Sampling.trainOrder(Tables(s, dir).documents.select("doc_id"),
      col("doc_id"), seed = 42L, nShards = 8)
      .select(col("doc_id"), col("shard"), col("pos"))

  /** Curriculum training order (d34) — d23's seeded shard permutation
    * sequenced into quality PHASES: docs scored by d21's trained model,
    * bucketed by fixed integer thresholds (score ≥ 0 → phase 0, the
    * highest-quality ~quarter; ≥ −5000 → phase 1; else phase 2 — the
    * easy-to-hard schedule curriculum training consumes), position
    * restarting per (phase, shard). Still no global sort: one scoring
    * projection + one exchange on (phase, shard). The oracle rebuilds
    * the identical model (d21's weight CTEs) feeding d23's md5-shard
    * derivation — the two stages verified COMPOSED, like d25. */
  def curriculumOrder(s: SparkSession, dir: String): DataFrame = {
    val model = graft.text.QualityClassifier.seededModel()
    val scored = Tables.spread(
        Tables(s, dir).documents.select("doc_id", "text"), "doc_id")
      .select(col("doc_id"),
        graft.text.QualityClassifier.scoreCol(col("text"), model)
          .getField("score").as("__score"))
    val phased = scored.withColumn("phase",
      when(col("__score") >= 0, 0).when(col("__score") >= -5000, 1)
        .otherwise(2))
    Sampling.trainOrder(phased.select("doc_id", "phase"), col("doc_id"),
        seed = 42L, nShards = 8, phaseCols = Seq("phase"))
      .select(col("doc_id"), col("phase"), col("shard"), col("pos"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d34_curriculum"       -> (curriculumOrder _),
    "d23_train_order"      -> (trainOrder _),
    "q55_overlap_join"     -> (overlapJoin _),
    "q53_stratified_sample" -> (stratifiedSample _),
    "q44_asof_attribution" -> (asofAttribution _),
    "q45_interval_join"    -> (intervalJoin _),
    "q46_hash_split"       -> (hashSplit _),
    "q47_seq_packing"      -> (seqPacking _),
    "q48_dup_clusters"     -> (dupClusters _),
    "q49_mixture_sample"   -> (mixtureSample _),
    "q50_contamination"    -> (contamination _),
    "q57_ngram_contamination" -> (ngramContamination _),
    "q57b_contamination_stored" -> (ngramContaminationStored _),
    "d27_mixture_plan"     -> (mixturePlan _),
    "d38_temperature_mix"  -> (temperatureMix _),
    "d38b_mixture_stored"  -> (temperatureMixStored _),
    "d28_leakfree_split"   -> (leakFreeSplit _),
    "d31_soft_dedup"       -> (softDedupWeights _),
    "d32_decontaminate"    -> (decontaminate _))

  /** Decontamination ACTION (d32) — q57 mirrored into the fix: q57 audits
    * how much of each EVAL doc leaked from train; this drops from the
    * TRAIN side every document carrying benchmark n-grams (the direction
    * a release pipeline actually acts on — the eval set is fixed, the
    * training set is what you clean). Same single-scan shape as q57: tag,
    * hash-shingle once, resolve "does any eval doc carry this gram" with
    * a shingle-partitioned window max — one documents scan, no join.
    * Per train doc: gram counts and the drop verdict (≥ 8 shared grams,
    * q50's audit threshold). Docs with no 5-grams at all are trivially
    * clean: kept, reported with n_grams = 0. */
  def decontaminate(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sh = Tables(s, dir).documents
      .select(col("doc_id"), (col("doc_id") % 50 =!= 0).as("__train"),
        explode_outer(graft.functions.ShingleHashesFn.shingleHashes(
          col("text"), 5, distinct = true)).as("sh"))
    sh.withColumn("__hit",
        max(when(!col("__train") && col("sh").isNotNull, 1).otherwise(0))
          .over(Window.partitionBy(col("sh"))))
      .filter(col("__train"))
      .groupBy("doc_id")
      .agg(count(col("sh")).as("n_grams"),
        sum(when(col("sh").isNotNull, col("__hit")).otherwise(0)).cast("long")
          .as("n_contaminated"))
      .withColumn("dropped", col("n_contaminated") >= 8)
  }

  /** Soft dedup / cluster down-weighting (d31): instead of DROPPING
    * near-duplicates (d03/q48's hard pass), keep every document and
    * weight it by the inverse of its duplicate-cluster size — the
    * repetition-controlled sampling posture of the SemDeDup/D4 line of
    * work: a 40-copy boilerplate cluster contributes ~1 document's worth
    * of sampling mass instead of 40. Integer ppm weights (1e6 DIV
    * n_members) so the oracle is division-policy-free. Unclustered docs
    * (no near-dup pair) weigh a full 1e6. Feeds q49's mixture sampler as
    * the per-doc rate multiplier. Cost: q48's (bounded, capped-postings)
    * cluster pipeline + one left join keyed on doc_id — linear. */
  def softDedupWeights(s: SparkSession, dir: String): DataFrame = {
    // probes the STORED cluster registry (the dedup stage's persisted
    // output) rather than re-running pair generation + CC per consumer;
    // q48 remains the benched from-scratch build of the same table
    val cl = graft.store.Registries.dupClusters(s, dir)
      .select(col("doc_id"), col("n_members"))
    Tables(s, dir).documents.select(col("doc_id"), col("source"))
      .join(cl, Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"),
        coalesce(col("n_members"), lit(1L)).as("n_members"),
        expr("1000000 DIV coalesce(n_members, 1)").as("weight_ppm"))
  }

  /** q48's pair CTE = the SHARED d04 oracle chain ([[TextQ.jaccardOracleCte]])
    * plus the threshold filter — one definition, no copy to drift. */
  private def d04PairsCte: String =
    s"""${TextQ.jaccardOracleCte},
       |dup_pairs AS (
       |  SELECT id_a, id_b FROM pairs0
       |  JOIN sizes sa ON sa.doc_id = id_a
       |  JOIN sizes sb ON sb.doc_id = id_b
       |  WHERE CAST(n_common AS DOUBLE) / CAST(sa.sz + sb.sz - n_common AS DOUBLE) >= 0.5)""".stripMargin

  /** q48's full oracle: d04's pair chain → recursive min-label walk →
    * cluster sizes. A named def so d31 can compose it as a nested CTE. */
  private def q48OracleSql: String =
    s"""WITH RECURSIVE $d04PairsCte,
       |edges AS MATERIALIZED (SELECT id_a AS a, id_b AS b FROM dup_pairs
       |          UNION ALL SELECT id_b, id_a FROM dup_pairs),
       |walk(id, r) AS (
       |  SELECT DISTINCT a, a FROM edges
       |  UNION
       |  SELECT w.id, e.b FROM walk w JOIN edges e ON e.a = w.r),
       |cl AS (SELECT id AS doc_id, min(r) AS cluster_id FROM walk GROUP BY 1)
       |SELECT doc_id, cluster_id,
       |       count(*) OVER (PARTITION BY cluster_id) AS n_members
       |FROM cl""".stripMargin

  val oracles: Map[String, String] = Map(
    // d31: q48's full SQL as a nested CTE, left-joined onto documents —
    // unclustered docs weigh 1e6 ppm, cluster members 1e6 // n_members
    "d31_soft_dedup" ->
      s"""WITH cl AS (
         |$q48OracleSql
         |)
         |SELECT d.doc_id, d.source,
         |       coalesce(cl.n_members, 1) AS n_members,
         |       1000000 // coalesce(cl.n_members, 1) AS weight_ppm
         |FROM documents d LEFT JOIN cl ON cl.doc_id = d.doc_id""".stripMargin,
    "q55_overlap_join" ->
      """WITH e AS (
        |  SELECT event_id AS err_id, epoch_us(ts) AS e_s,
        |         epoch_us(ts) + 120000000 AS e_e
        |  FROM events WHERE event_type = 'error'),
        |p AS (
        |  SELECT event_id AS pur_id, epoch_us(ts) AS p_s,
        |         epoch_us(ts) + 120000000 AS p_e
        |  FROM events WHERE event_type = 'purchase')
        |SELECT err_id, pur_id, e_s, e_e, p_s, p_e,
        |       least(e_e, p_e) - greatest(e_s, p_s) AS overlap
        |FROM e JOIN p ON e_s <= p_e AND p_s <= e_e""".stripMargin,
    "q53_stratified_sample" ->
      """WITH r AS (
        |  SELECT doc_id, source, lang,
        |         count(*) OVER (PARTITION BY source, lang) AS n_stratum,
        |         row_number() OVER (PARTITION BY source, lang
        |           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS pick_rank
        |  FROM documents)
        |SELECT doc_id, source, lang, CAST(pick_rank AS INT) AS pick_rank, n_stratum
        |FROM r WHERE pick_rank <= (n_stratum * 1 + 9) // 10""".stripMargin,
    "q44_asof_attribution" ->
      """WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS p_us FROM events
        |           WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, epoch_us(ts) AS c_us FROM events
        |      WHERE event_type = 'click')
        |SELECT p.event_id, p.user_id, p.p_us, c.c_us, p.p_us - c.c_us AS gap_us
        |FROM p ASOF LEFT JOIN c
        |  ON p.user_id = c.user_id AND c.c_us <= p.p_us""".stripMargin,
    "q45_interval_join" ->
      """WITH e AS (SELECT event_id, epoch_us(ts) AS s_us,
        |                  epoch_us(ts) + 300000000 AS e_us
        |           FROM events WHERE event_type = 'error'),
        |p AS (SELECT epoch_us(ts) AS p_us FROM events
        |      WHERE event_type = 'purchase')
        |SELECT e.event_id, e.s_us, count(p.p_us) AS n_purchases
        |FROM e LEFT JOIN p ON p.p_us >= e.s_us AND p.p_us <= e.e_us
        |GROUP BY 1, 2""".stripMargin,
    // the seeded-permutation arithmetic in DuckDB: same md5 of "42:<id>",
    // same 8-hex-digit shard assignment, same (hash, id) shard order
    // d34: d21's model-score CTEs (shared from TextQ so the tokenizer/
    // weights cannot drift) feeding d23's md5-shard derivation, pos
    // restarting per (phase, shard)
    "d34_curriculum" ->
      s"""WITH toks AS (${TextQ.toksSql}),
         |${TextQ.modelScoreCtes},
         |ph AS (
         |  SELECT doc_id,
         |         CASE WHEN score >= 0 THEN 0
         |              WHEN score >= -5000 THEN 1 ELSE 2 END AS phase
         |  FROM msc),
         |h AS (
         |  SELECT doc_id, phase, md5('42:' || CAST(doc_id AS VARCHAR)) AS hx
         |  FROM ph),
         |sharded AS (
         |  SELECT doc_id, phase, hx,
         |         CAST(list_sum(list_transform(generate_series(1, 8),
         |           i -> CAST(strpos('0123456789abcdef', substr(hx, i, 1)) - 1 AS BIGINT)
         |                * (CAST(1 AS BIGINT) << (4 * (8 - i))))) % 8 AS INT) AS shard
         |  FROM h)
         |SELECT doc_id, phase, shard,
         |       CAST(row_number() OVER (PARTITION BY phase, shard ORDER BY hx, doc_id) AS INT) AS pos
         |FROM sharded""".stripMargin,
    "d23_train_order" ->
      """WITH h AS (
        |  SELECT doc_id, md5('42:' || CAST(doc_id AS VARCHAR)) AS hx
        |  FROM documents),
        |sharded AS (
        |  SELECT doc_id, hx,
        |         CAST(list_sum(list_transform(generate_series(1, 8),
        |           i -> CAST(strpos('0123456789abcdef', substr(hx, i, 1)) - 1 AS BIGINT)
        |                * (CAST(1 AS BIGINT) << (4 * (8 - i))))) % 8 AS INT) AS shard
        |  FROM h)
        |SELECT doc_id, shard,
        |       CAST(row_number() OVER (PARTITION BY shard ORDER BY hx, doc_id) AS INT) AS pos
        |FROM sharded""".stripMargin,
    "q46_hash_split" ->
      s"""SELECT ${Sampling.md5SplitSql("doc_id", splitFractions)} AS split,
         |       lang, count(*) AS n_docs,
         |       CAST(sum(n_chars) AS BIGINT) AS total_chars
         |FROM documents GROUP BY 1, 2""".stripMargin,
    "q47_seq_packing" ->
      """WITH d AS (
        |  SELECT doc_id, source,
        |         CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_bpe
        |  FROM documents)
        |SELECT doc_id, source, n_bpe,
        |  CAST(COALESCE(SUM(n_bpe) OVER (PARTITION BY source ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS offset_in_stream,
        |  CAST(COALESCE(SUM(n_bpe) OVER (PARTITION BY source ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 2048 AS BIGINT) AS chunk_id
        |FROM d""".stripMargin,
    "q49_mixture_sample" ->
      s"""WITH weights AS (
         |  SELECT 'src' || i AS source,
         |         (CAST([1.0,0.5,0.25,0.1] AS DOUBLE[]))[i % 4 + 1] AS rate
         |  FROM generate_series(0, 19) AS t(i))
         |SELECT d.source, w.rate, count(*) AS n_kept,
         |       CAST(sum(n_chars) AS BIGINT) AS total_chars
         |FROM documents d JOIN weights w ON w.source = d.source
         |WHERE ${Sampling.md5KeepSql("doc_id", "w.rate")}
         |GROUP BY 1, 2""".stripMargin,
    // q57: same 5-gram shingle chain as q50, but rolled to PER-EVAL-DOC
    // n-gram hit fractions against the train corpus's distinct shingles
    // d32: q57's CTE chain with the roles mirrored (distinct EVAL grams
    // probe the TRAIN side) + a documents left join so zero-gram train
    // docs appear as trivially clean
    "d32_decontaminate" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS t
        |  FROM documents),
        |sh5 AS (
        |  SELECT DISTINCT doc_id,
        |         t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4] AS shingle
        |  FROM toks, UNNEST(generate_series(1, len(t) - 4)) AS u(i)
        |  WHERE len(t) >= 5),
        |ev AS (SELECT DISTINCT shingle FROM sh5 WHERE doc_id % 50 = 0),
        |tr AS (SELECT doc_id, shingle FROM sh5 WHERE doc_id % 50 <> 0),
        |agg AS (
        |  SELECT tr.doc_id,
        |         CAST(count(*) AS BIGINT) AS n_grams,
        |         CAST(SUM(CASE WHEN ev.shingle IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |           AS n_contaminated
        |  FROM tr LEFT JOIN ev ON tr.shingle = ev.shingle
        |  GROUP BY 1)
        |SELECT d.doc_id,
        |       coalesce(a.n_grams, 0) AS n_grams,
        |       coalesce(a.n_contaminated, 0) AS n_contaminated,
        |       coalesce(a.n_contaminated, 0) >= 8 AS dropped
        |FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id
        |WHERE d.doc_id % 50 <> 0""".stripMargin,
    "q57_ngram_contamination" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS t
        |  FROM documents),
        |sh5 AS (
        |  SELECT DISTINCT doc_id,
        |         t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4] AS shingle
        |  FROM toks, UNNEST(generate_series(1, len(t) - 4)) AS u(i)
        |  WHERE len(t) >= 5),
        |train AS (SELECT DISTINCT shingle FROM sh5 WHERE doc_id % 50 <> 0),
        |ev AS (SELECT doc_id, shingle FROM sh5 WHERE doc_id % 50 = 0)
        |SELECT ev.doc_id,
        |       CAST(count(*) AS BIGINT) AS n_grams,
        |       CAST(SUM(CASE WHEN train.shingle IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_contaminated,
        |       round(CAST(SUM(CASE WHEN train.shingle IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
        |             / CAST(count(*) AS DOUBLE), 9) AS contamination
        |FROM ev LEFT JOIN train ON ev.shingle = train.shingle
        |GROUP BY 1""".stripMargin,
    "q57b_contamination_stored" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS t
        |  FROM documents),
        |sh5 AS (
        |  SELECT DISTINCT doc_id,
        |         t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4] AS shingle
        |  FROM toks, UNNEST(generate_series(1, len(t) - 4)) AS u(i)
        |  WHERE len(t) >= 5),
        |train AS (SELECT DISTINCT shingle FROM sh5 WHERE doc_id % 50 <> 0),
        |ev AS (SELECT doc_id, shingle FROM sh5 WHERE doc_id % 50 = 0)
        |SELECT ev.doc_id,
        |       CAST(count(*) AS BIGINT) AS n_grams,
        |       CAST(SUM(CASE WHEN train.shingle IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_contaminated,
        |       round(CAST(SUM(CASE WHEN train.shingle IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
        |             / CAST(count(*) AS DOUBLE), 9) AS contamination
        |FROM ev LEFT JOIN train ON ev.shingle = train.shingle
        |GROUP BY 1""".stripMargin,
    "q50_contamination" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS t
        |  FROM documents),
        |sh5 AS (
        |  SELECT DISTINCT doc_id,
        |         t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4] AS shingle
        |  FROM toks, UNNEST(generate_series(1, len(t) - 4)) AS u(i)
        |  WHERE len(t) >= 5),
        |bench AS (SELECT doc_id AS bench_id, shingle FROM sh5 WHERE doc_id % 50 = 0),
        |train AS (SELECT doc_id, shingle FROM sh5 WHERE doc_id % 50 <> 0),
        |overlap AS (
        |  SELECT t.doc_id, b.bench_id, count(*) AS n_shared
        |  FROM train t JOIN bench b USING (shingle)
        |  GROUP BY 1, 2)
        |SELECT doc_id, count(*) AS n_bench_docs, max(n_shared) AS max_shared
        |FROM overlap WHERE n_shared >= 8
        |GROUP BY 1""".stripMargin,
    "q48_dup_clusters" -> q48OracleSql,
    "d27_mixture_plan" -> {
      val values = mixtureWeights.map { case (s0, w) => s"('$s0', $w)" }.mkString(", ")
      s"""WITH w(source, w) AS (VALUES $values),
         |n AS (SELECT source, CAST(sum(n_chars) AS BIGINT) AS n_chars_src
         |      FROM documents GROUP BY 1),
         |t AS (SELECT CAST(sum(n_chars) AS HUGEINT) // 2 AS budget FROM documents),
         |sw AS (SELECT CAST(sum(w) AS HUGEINT) AS w_sum FROM w),
         |p AS (
         |  SELECT n.source, n.n_chars_src, CAST(w.w AS BIGINT) AS w,
         |         (t.budget * w.w) // sw.w_sum AS planned
         |  FROM n JOIN w USING (source), t, sw)
         |SELECT source, n_chars_src, w,
         |       CAST(planned AS BIGINT) AS planned_chars,
         |       CAST(least(1000000, (planned * 1000000) // n_chars_src) AS BIGINT) AS rate_ppm,
         |       CAST((planned * 1000000) // n_chars_src AS BIGINT) AS epochs_ppm
         |FROM p""".stripMargin
    },
    // d38: floor(sqrt) weight is bit-identical cross-engine (IEEE sqrt is
    // correctly rounded); all downstream arithmetic is integer floor-div
    "d38_temperature_mix" ->
      """WITH n AS (SELECT source, CAST(sum(n_chars) AS BIGINT) AS n_chars_src
        |           FROM documents GROUP BY 1),
        |w AS (SELECT source, n_chars_src,
        |             CAST(floor(sqrt(CAST(n_chars_src AS DOUBLE))) AS BIGINT) AS w_sqrt
        |      FROM n),
        |t AS (SELECT CAST(sum(n_chars) AS HUGEINT) AS budget FROM documents),
        |sw AS (SELECT CAST(sum(w_sqrt) AS HUGEINT) AS w_sum FROM w),
        |p AS (
        |  SELECT w.source, w.n_chars_src, w.w_sqrt,
        |         (CAST(w.w_sqrt AS HUGEINT) * 1000000) // sw.w_sum AS share_ppm,
        |         (t.budget * w.w_sqrt) // sw.w_sum AS planned
        |  FROM w, t, sw)
        |SELECT source, n_chars_src, w_sqrt,
        |       CAST(share_ppm AS BIGINT) AS share_ppm,
        |       CAST(planned AS BIGINT) AS planned_chars,
        |       CAST((planned * 1000000) // n_chars_src AS BIGINT) AS epochs_ppm,
        |       (planned * 1000000) // n_chars_src > 4000000 AS capped,
        |       CAST(least(planned, 4 * CAST(n_chars_src AS HUGEINT)) AS BIGINT)
        |         AS planned_capped_chars
        |FROM p""".stripMargin,
    // d38b: the stored-census replay — the budget comes from the census
    // rows (sum of per-source sums), never a second corpus pass
    "d38b_mixture_stored" ->
      """WITH c AS (SELECT source, CAST(sum(n_chars) AS BIGINT) AS n_chars_src
        |           FROM documents GROUP BY 1),
        |w AS (SELECT source, n_chars_src,
        |             CAST(floor(sqrt(CAST(n_chars_src AS DOUBLE))) AS BIGINT) AS w_sqrt
        |      FROM c),
        |t AS (SELECT CAST(sum(n_chars_src) AS HUGEINT) AS budget FROM c),
        |sw AS (SELECT CAST(sum(w_sqrt) AS HUGEINT) AS w_sum FROM w),
        |p AS (
        |  SELECT w.source, w.n_chars_src, w.w_sqrt,
        |         (CAST(w.w_sqrt AS HUGEINT) * 1000000) // sw.w_sum AS share_ppm,
        |         (t.budget * w.w_sqrt) // sw.w_sum AS planned
        |  FROM w, t, sw)
        |SELECT source, n_chars_src, w_sqrt,
        |       CAST(share_ppm AS BIGINT) AS share_ppm,
        |       CAST(planned AS BIGINT) AS planned_chars,
        |       CAST((planned * 1000000) // n_chars_src AS BIGINT) AS epochs_ppm,
        |       (planned * 1000000) // n_chars_src > 4000000 AS capped,
        |       CAST(least(planned, 4 * CAST(n_chars_src AS HUGEINT)) AS BIGINT)
        |         AS planned_capped_chars
        |FROM p""".stripMargin,
    // d28: q48's cluster closure decides the split key — a doc outside any
    // cluster represents itself
    "d28_leakfree_split" ->
      s"""WITH RECURSIVE $d04PairsCte,
         |edges AS MATERIALIZED (SELECT id_a AS a, id_b AS b FROM dup_pairs
         |          UNION ALL SELECT id_b, id_a FROM dup_pairs),
         |walk(id, r) AS (
         |  SELECT DISTINCT a, a FROM edges
         |  UNION
         |  SELECT w.id, e.b FROM walk w JOIN edges e ON e.a = w.r),
         |cl AS (SELECT id AS doc_id, min(r) AS cluster_id FROM walk GROUP BY 1),
         |rep AS (
         |  SELECT d.doc_id, d.n_chars,
         |         coalesce(cl.cluster_id, d.doc_id) AS rep
         |  FROM documents d LEFT JOIN cl USING (doc_id))
         |SELECT ${Sampling.md5SplitSql("rep", splitFractions)} AS split,
         |       count(*) AS n_docs,
         |       count(DISTINCT rep) AS n_groups,
         |       CAST(sum(n_chars) AS BIGINT) AS total_chars
         |FROM rep GROUP BY 1""".stripMargin)
}
