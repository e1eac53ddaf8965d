package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression tests: the 100 TB story depends on these plans
  * keeping their shape (pushdown, pruning, broadcast, codegen), so assert
  * it — a future edit that silently drops a broadcast or widens a scan
  * fails here, not on a cluster. */
class PlanQualitySpec extends AnyFunSuite {
  import SparkTestSession._

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("quality-score gate is a shuffle-free codegen'd one-pass projection") {
    val p = plan("d21_quality_score")
    assert(!p.contains("Exchange"), "model scoring must not shuffle\n" + p)
    assert(!p.contains("lambdafunction"), "interpreted HOF crept into d21\n" + p)
    assert(p.contains("*(1)"), "scoring fell out of whole-stage codegen\n" + p)
    // the scorer must run ONCE per row: a filter on n_feats gets pushed
    // below the projection and re-evaluates the expression in the Filter
    assert(p.sliding("hashedngramscore".length).count(_ == "hashedngramscore") == 1,
      "scoring expression evaluated more than once per row\n" + p)
  }

  test("substring repeat detection is linear: semi-join on fp, no pair join") {
    val p = plan("d20_repeat_regions")
    assert(p.contains("LeftSemi"), "cross-doc fp gate must be a semi-join\n" + p)
    assert(!p.contains("Inner"), "no pairwise join may appear — the plan " +
      "must stay linear in the fingerprint count\n" + p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("incremental repeat detection keeps d20's linear shape (no pair join)") {
    val p = plan("d24_incr_regions")
    assert(p.contains("LeftSemi"), "shared-fp gate must be a semi-join\n" + p)
    assert(!p.contains("CartesianProduct"), p)
    // the only inner join allowed is the registry probe on `fp` — never a
    // pairwise doc-doc join
    assert(p.linesIterator.filter(_.contains("Inner")).forall(_.contains("fp")),
      "pairwise join crept into the incremental path\n" + p)
  }

  test("model-gated funnel evaluates the scorer once") {
    // (the funnel tail's segment HOFs keep cheap lambdas — the blanket
    // sweep below polices their bodies; the gate here is the model cost)
    val p = plan("d25_model_funnel")
    // the funnel fans out into one documents-scan per consumer branch
    // (census, dedup window, survivors — same recompute-per-branch shape
    // as d18; a deployment persists the gated batch). The invariant is
    // per-branch: ONE scorer evaluation per scan — a filter pushed below
    // the scoring projection would re-evaluate the model and double the
    // scan-side work.
    val scans = p.sliding("documents.parquet".length)
      .count(_ == "documents.parquet")
    val evals = p.sliding("hashedngramscore".length)
      .count(_ == "hashedngramscore")
    assert(evals <= scans,
      s"$evals scorer evaluations for $scans scans — a branch pays the model twice\n" + p)
  }

  test("incremental embedding near-dup broadcasts the new side") {
    val p = plan("e07_incr_neardup")
    // the pair space is new × total by construction; the join must be a
    // broadcast nested loop (new side small per increment), never a
    // repartition-everything cartesian
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "expected the new batch to broadcast\n" + p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("semi-join pushes the price filter into the orders scan") {
    val p = plan("q03_semi_join")
    assert(p.contains("PushedFilters: [IsNotNull(o_totalprice), GreaterThan(o_totalprice,200000.0)"), p)
    assert(p.contains("LeftSemi"), p)
  }

  test("lineage join broadcasts every dimension") {
    val p = plan("q02_lineage_join")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), "dimensions should broadcast at this scale\n" + p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("scans are column-pruned to what the query needs") {
    val p = plan("q16_value_counts")
    assert(p.contains("ReadSchema: struct<o_custkey:bigint,o_orderpriority:string>"), p)
  }

  test("FK lookup stays a broadcast join") {
    val p = plan("q27_fk_lookup")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("token stats are a shuffle-free pruned projection") {
    // (array-lambda HOFs keep the projection itself out of whole-stage
    // codegen — the invariants that matter at scale are: no shuffle, and a
    // scan pruned to exactly the two consumed columns)
    val p = plan("d01_token_stats")
    assert(!p.contains("Exchange"), "a pure projection must not shuffle\n" + p)
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), p)
  }

  test("jaccard pipeline: posting lists, no self-join of the shingle table") {
    val p = plan("d04_ngram_jaccard")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("ObjectHashAggregate"), "CappedCollect postings missing\n" + p)
    // pair generation must come from the posting arrays, not a shingle
    // self-join: the only joins left are the two size lookups on the pair
    // endpoints, reading the cached index
    assert(p.linesIterator.count(_.contains("Join")) <= 2,
      "capped jaccard must not self-join the shingle table\n" + p)
    assert(p.contains("InMemoryTableScan"),
      "posting index should be served from its persisted copy\n" + p)
  }

  test("as-of join plans the native merge exec: no window, no generic join") {
    val p = plan("q44_asof_attribution")
    assert(p.contains("AsOfJoin ["), "q44 must use the native operator\n" + p)
    assert(!p.contains("Window"), "no window state in the native path\n" + p)
    assert(!p.toLowerCase.contains("mergejoin") && !p.contains("BroadcastHashJoin"), p)
    assert(p.contains("PushedFilters: [IsNotNull(event_type), EqualTo(event_type,purchase)]"),
      "event-type filters must still push to the scans\n" + p)
  }

  test("range join is a bucketized equi-join, not a nested-loop scan") {
    val p = plan("q45_interval_join")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "range predicate fell back to nested-loop\n" + p)
    assert(!p.contains("CartesianProduct"), p)
    // the inner operator's plan, asserted directly — the left variant's
    // persist could otherwise serve the join from a cache scan and make
    // the two negative asserts above vacuous
    import org.apache.spark.sql.functions._
    val ev = graft.Tables(spark, sf).events
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id"), expr("ts div 1000").as("s_us"),
        (expr("ts div 1000") + 300000000L).as("e_us"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(expr("ts div 1000").as("p_us"))
    val ip = graft.ops.RangeJoin.pointsInIntervals(errors, purchases,
      "s_us", "e_us", "p_us", 300000000L)
      .queryExecution.executedPlan.toString
    assert(!ip.contains("BroadcastNestedLoopJoin") && !ip.contains("CartesianProduct"), ip)
    assert(ip.contains("Generate explode"), "bucket explode missing\n" + ip)
  }

  test("hash split never reads the text column and never joins") {
    val p = plan("q46_hash_split")
    assert(!p.contains("Join"), p)
    assert(p.contains("ReadSchema: struct<doc_id:bigint,lang:string,n_chars:bigint>"),
      "split census must prune the scan to 3 columns\n" + p)
  }

  test("anti-join seeding compiles to a broadcast or shuffled anti join") {
    val p = plan("q04_anti_join")
    assert(p.contains("LeftAnti"), p)
  }

  test("6-way lineage join broadcasts the dimension sides, no cartesian") {
    val p = plan("q37_lineage6_readcount")
    assert(p.contains("BroadcastHashJoin"), "no broadcast in lineage join")
    assert(!p.contains("CartesianProduct"), "cartesian in lineage join")
    // the run table is a materialized parquet star table since r06, so
    // the ACTIVE-status gate must push into its scan as a plain column
    // filter (before materialization it folded into `% 17` key arithmetic)
    assert(p.contains("EqualTo(status,ACTIVE)") || p.contains("% 17"),
      "run status gate did not reach the scan:\n" + p)
  }

  test("7-way lineage join: string-key hop, anti-join, no cartesian") {
    val p = plan("q38_lineage7_fastq")
    assert(!p.contains("CartesianProduct"))
    assert(p.toLowerCase.contains("anti"), "seeded exclusion must be an anti join")
    assert(p.contains("BroadcastHashJoin"))
  }

  test("bounded top-k aggregates with partial (map-side) combine") {
    val p = plan("q10_topk_per_group")
    // ObjectHashAggregate runs TopKRows in partial + final mode: map-side
    // k-capping is what keeps the shuffle bounded
    assert(p.contains("ObjectHashAggregate"), p)
    assert(p.contains("partial_topkrows") || p.contains("partial_"), p)
    assert(!p.contains("Window"), "q10 must not fall back to a window sort")
  }

  test("global-order queries carry no un-partitioned window") {
    for (q <- Seq("q26_ntile_binpack", "q12_running_sum", "q10_topk_per_group")) {
      val p = plan(q)
      p.linesIterator.filter(_.contains("windowspecdefinition")).foreach { l =>
        assert(l.contains("partitionBy") || l.contains("__go_pid") ||
          l.contains("l_suppkey") || l.contains("_w"),
          s"$q has a suspicious window line: $l")
      }
    }
  }

  test("NFC normalization is a shuffle-free pruned projection") {
    val p = plan("q56_nfc_normalize")
    assert(!p.contains("Exchange"), "a pure projection must not shuffle\n" + p)
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), p)
  }

  test("BPE pair counts: no interpreted lambda re-inlined below the word agg") {
    // the InferFiltersFromGenerate regression (round 6): an inferred
    // size(ps) > 0 filter re-inlines the pair-building lambda chain and
    // runs it per TOKEN below the aggregation — 6x the query. A Filter
    // evaluating a lambdafunction anywhere in this plan means it's back.
    val p = plan("d15_bpe_pairs")
    val badFilter = p.linesIterator.exists(l =>
      l.trim.startsWith("+- Filter") && l.contains("lambdafunction"))
    assert(!badFilter, "inferred filter re-inlines interpreted lambdas:\n" + p)
  }

  test("approx KNN buckets are codegen'd — no interpreted lambdas anywhere") {
    // the r05 e03 regression: per-plane zip_with/aggregate HOF dots fell
    // out of whole-stage codegen and allocated per row (0.78 → 1.91 s).
    // The bucket must come from the single codegen'd QuantLshBucket loop.
    val p = plan("e03_knn_approx")
    // interpreted lambdas are allowed ONLY in the top exact-rescore
    // projection (runs on ~k survivors per query); the per-row hot path —
    // bucket assignment and the fast prefilter score — must stay codegen'd
    val hotLambdas = p.linesIterator.filter(_.contains("lambdafunction"))
      .filterNot(_.contains("AS cos#")).toSeq
    assert(hotLambdas.isEmpty,
      "interpreted HOF lambda in the e03 hot path:\n" + hotLambdas.mkString("\n"))
    assert(p.contains("quantlshbucket"), "QuantLshBucket missing from plan:\n" + p)
    assert(p.contains("doubledot"), "codegen'd prefilter dot missing:\n" + p)
  }

  test("source overlap: posting-list plan, no shingle self-join") {
    val p = plan("d17_source_overlap")
    assert(!p.contains("CartesianProduct"), p)
    // d17 is a one-shot bench query: persistIndex=false (caching the
    // postings cost more than recomputing them — 8.1 s vs 1.0 s), so the
    // plan must NOT contain a persisted copy. Callers that reuse the index
    // (incremental overlap) pass persistIndex=true and get the cache.
    assert(!p.contains("InMemoryTableScan"),
      "one-shot overlap must not pay the persist\n" + p)
    // only the two size lookups on the pair endpoints remain as joins
    assert(p.linesIterator.count(_.contains("Join")) <= 2,
      "exact overlap must not self-join the shingle table\n" + p)
  }

  test("kmeans assignment: literal-model codegen'd argmin, pure map — " +
       "zero exchanges, zero sorts, zero aggregates") {
    import SparkTestSession.spark.implicits._
    import org.apache.spark.sql.functions.col
    val pts = graft.similarity.KMeansExact.quantize(
      spark.read.parquet(s"$sf/embeddings.parquet")
        .select(col("vec_id").as("id"), col("embedding").as("vec")))
    val cents = Seq((0, Seq.fill(64)(0L)), (1, Seq.fill(64)(5L))).toDF("cid", "cq")
    val p = graft.similarity.KMeansExact.assign(pts, cents)
      .queryExecution.executedPlan.toString
    // the r15 shape: the k-row model is a plan literal (QuantArgminId),
    // so an assignment pass is one scan + one codegen'd projection — the
    // old crossJoin → groupBy(id) → min(struct) formulation paid Sort +
    // SortAggregate + Exchange over n·k rows per pass (struct min cannot
    // hash-aggregate)
    assert(p.contains("quantargminid"), "argmin must be the codegen'd " +
      "literal-model QuantArgminId\n" + p)
    assert(p.contains("quantizevec"), "quantization must be the codegen'd " +
      "QuantizeVec loop, not an interpreted transform HOF\n" + p)
    assert(!p.contains("Exchange"), "assignment must be exchange-free\n" + p)
    assert(!p.contains("Aggregate"), "assignment must not aggregate\n" + p)
    assert(!p.contains("Sort"), "assignment must not sort\n" + p)
    assert(!p.contains("Join"), "assignment must not join\n" + p)
  }

  test("ivfpq encode: fused literal-model codegen'd encode — single scan, " +
       "no join, no aggregate, no exchange") {
    import org.apache.spark.sql.functions.col
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val cents = graft.similarity.IvfPq.seedCentroids(e, nCells = 8)
    val cb = graft.similarity.IvfPq.residualCodebook(e, cents, dims = 64,
      m = 8, seedFrom = 8)
    val p = graft.similarity.IvfPq.encode(e, cents, cb, dims = 64, m = 8)
      .queryExecution.executedPlan.toString
    assert(p.contains("ivfpqencodevec"), "encode must be the fused " +
      "codegen'd IvfPqEncodeVec\n" + p)
    assert(!p.contains("Exchange"), "encode must be exchange-free\n" + p)
    assert(!p.contains("Aggregate"), "encode must not aggregate\n" + p)
    assert(!p.contains("Join"), "encode must not join\n" + p)
  }

  test("ngram contamination: single corpus scan, join-free, shingle-keyed " +
       "window") {
    val p = plan("q57_ngram_contamination")
    assert(!p.contains("CartesianProduct"), p)
    // the r8 single-scan shape: NO join anywhere — train membership is a
    // window max over the shingle key on the one exploded shingle table
    assert(!p.contains("Join"), "q57 must stay join-free\n" + p)
    assert(p.contains("windowspecdefinition(sh"),
      "train-hit must come from a shingle-partitioned window\n" + p)
    assert(p.sliding("documents.parquet".length)
      .count(_ == "documents.parquet") == 1,
      "q57 must scan documents exactly once\n" + p)
  }

  test("stored-registry twins probe parquet registries, never rebuild " +
       "the stored side") {
    val BNL = "\n"
    def scans(pl: String, tbl: String) =
      pl.sliding(tbl.length).count(_ == tbl)
    // d26b: stored signatures come from the registry scan; the only
    // documents scan left is the NEW batch's signature pass
    val d26  = plan("d26_incr_minhash")
    val d26b = plan("d26b_incr_minhash_stored")
    assert(d26b.contains("graft_registry"),
      "d26b must scan the stored signature registry" + BNL + d26b)
    assert(scans(d26b, "documents.parquet") < scans(d26, "documents.parquet"),
"d26b still rebuilds the stored-side signatures" + BNL + d26b)
    // q57b: the train corpus is never re-shingled — exactly one documents
    // scan (the 2% eval slice); the train side is the registry parquet
    val q57b = plan("q57b_contamination_stored")
    assert(q57b.contains("graft_registry"), q57b)
    assert(scans(q57b, "documents.parquet") == 1,
      "q57b must scan documents exactly once (the eval slice)" + BNL + q57b)
    // e07b: history's buckets come from the registry scan, and only the
    // new batch is hashed — at most 5 embeddings scans (the new-side
    // bucket table referenced by both candidate arms + the id_a/id_b
    // rescore joins); rebuilding the stored side would add scans
    val e07b = plan("e07b_incr_neardup_stored")
    assert(e07b.contains("graft_registry"), e07b)
    assert(scans(e07b, "embeddings.parquet") <= 5,
      "e07b re-reads embeddings beyond the new-side hash + rescore joins" +
        BNL + e07b)
    // d31: cluster sizes come from the stored registry; the only
    // documents scan is the (doc_id, source) projection being weighted —
    // rebuilding the clusters would re-run shingling + CC per consumer
    val d31 = plan("d31_soft_dedup")
    assert(d31.contains("graft_registry"), d31)
    assert(scans(d31, "documents.parquet") == 1,
      "d31 must scan documents exactly once (the weighted projection)" +
        BNL + d31)
    // d30b: the registry-shaped audit — BOTH detector sides probe stored
    // registries (lex: band index + signatures; sem: LSH buckets), no
    // broadcast-nested-loop pair generation anywhere (d30, the worst-case
    // twin, keeps the whitelisted BNLJ; this is the plan that scales)
    val d30b = plan("d30b_lexsem_audit_stored")
    assert(d30b.contains("graft_registry"),
      "d30b must probe the stored registries" + BNL + d30b)
    assert(!d30b.contains("BroadcastNestedLoopJoin") &&
      !d30b.contains("CartesianProduct"),
      "d30b must not pair via BNLJ/cartesian" + BNL + d30b)
    // the audit adds ZERO documents scans beyond its lex detector (d26b
    // references the cached new-batch signatures in its probe/union/
    // rescore arms; history itself is never re-signed in either)
    assert(scans(d30b, "documents.parquet") <= scans(d26b, "documents.parquet"),
      "d30b re-signs history beyond the d26b probe" + BNL + d30b)
    // d39b: history's histogram comes from the stored registry — exactly
    // one documents scan (the new drop being histogrammed); re-scanning
    // history would add a second
    val d39b = plan("d39b_drift_stored")
    assert(d39b.contains("graft_registry"),
      "d39b must probe the stored reference histogram" + BNL + d39b)
    assert(scans(d39b, "documents.parquet") == 1,
      "d39b must scan documents exactly once (the drop)" + BNL + d39b)
    // e17b: the frozen model and history labels come from registries —
    // exactly one embeddings scan (the drop being assigned); e17, the
    // worst-case twin, re-fits and re-assigns the whole corpus
    val e17b = plan("e17b_cell_drift_stored")
    assert(e17b.contains("graft_registry"),
      "e17b must probe the stored model + label registries" + BNL + e17b)
    assert(scans(e17b, "embeddings.parquet") == 1,
      "e17b must scan embeddings exactly once (the drop)" + BNL + e17b)
    // d38b: the extreme of the family — the nightly mixture re-plan
    // touches NO base table at all, only the ~20-row census registry
    val d38b = plan("d38b_mixture_stored")
    assert(d38b.contains("graft_registry"),
      "d38b must read the stored census" + BNL + d38b)
    assert(scans(d38b, "documents.parquet") == 0,
      "d38b must not scan the corpus at all" + BNL + d38b)
  }

  test("perceptual hash clustering windows partition by the hash") {
    // an unpartitioned window would serialize the whole corpus through
    // one task — the cluster-id must come from a hash-partitioned window
    for ((q, key) <- Seq("m06_image_phash" -> "dhash",
                         "m07_audio_fingerprint" -> "fingerprint")) {
      val p = plan(q)
      assert(p.contains(s"windowspecdefinition($key"),
        s"$q cluster window must partition by $key\n" + p)
    }
  }

  test("novelty: materialized tokens, one window, no joins") {
    val p = plan("d22_novelty")
    assert(!p.contains("Join"), "novelty must stay join-free\n" + p)
    // the tokenizer must be materialized before the shingle lambda: an
    // inline tokenizer re-runs the regex split per lambda element (the
    // d11/d15/d19/d22 trap — 8.9 s vs 0.5 s at sf0.1)
    val tokenizerInLambda = p.linesIterator.filter(l =>
      l.contains("lambdafunction") && l.contains("regexp"))
    assert(tokenizerInLambda.isEmpty,
      "tokenizer inlined into a HOF lambda:\n" + tokenizerInLambda.mkString("\n"))
  }

  // The blanket version of the trap gate: the interpreted-lambda re-eval
  // bug walked in through FOUR separate queries (d11, d15, d19, d22)
  // while per-query gates pinned only the fixed ones. This sweeps EVERY
  // registered query plan for the signature — a Filter or Generate whose
  // condition/generator re-inlines an expensive expression (regex/split)
  // inside an interpreted HOF lambda. New queries are covered on arrival.
  /** The body (balanced-paren span) of each `lambdafunction(...)` on the
    * line. `filter(split(s), lambdafunction(x != ""))` is FINE — the split
    * is an argument evaluated once per row; the trap is the expensive
    * expression INSIDE the lambda body, re-run per array element. */
  private def lambdaBodies(line: String): Seq[String] = {
    val marker = "lambdafunction("
    Iterator.iterate(line.indexOf(marker))(i => line.indexOf(marker, i + 1))
      .takeWhile(_ >= 0).map { i =>
        var depth = 1; var j = i + marker.length
        while (j < line.length && depth > 0) {
          if (line(j) == '(') depth += 1 else if (line(j) == ')') depth -= 1
          j += 1
        }
        line.substring(i, j)
      }.toSeq
  }

  test("no query evaluates a regex/split inside an interpreted lambda body " +
       "(blanket sweep over every registered query)") {
    val offenders = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      val bad = plan(name).linesIterator.flatMap(lambdaBodies)
        .filter(b => b.contains("regexp_") || b.contains("split("))
        .toSeq
      if (bad.isEmpty) Nil else Seq(name + ":\n  " + bad.mkString("\n  "))
    }
    assert(offenders.isEmpty,
      "regex/split re-evaluated per element inside an interpreted lambda in:\n" +
        offenders.mkString("\n"))
  }

  test("no query plans a cartesian or nested-loop join " +
       "(blanket sweep over every registered query)") {
    // the two quadratic join shapes that silently appear when an equi-key
    // gets lost (type mismatch, renamed column, non-deterministic expr).
    // Whitelist: queries whose cross-products are intentionally
    // broadcast-tiny and require-guarded at the call site.
    val whitelist = Set(
      "q28_pivot_matrix",     // explicit 3x4 grid fill: range crossJoin, broadcast
      "e09_pq_adc",           // ADC table: codebook x query, both require-capped
      "e10_ivfpq",            // same ADC shape per probed cell
      "e10b_ivfpq_stored",    // same ADC shape, probing the stored cells
      "e15_ivfpq_incr",       // same ADC shape over (stored history ∪ delta)
      "d27_mixture_plan",     // per-source weights x ONE global-budget row
      "d38_temperature_mix",  // same shape: census x two ONE-row global frames
      "d38b_mixture_stored",  // same shape from the stored census registry
      "e01_knn_brute",        // brute-force baseline IS all-pairs by contract
      "e02_cosine_neardup",   // exact verification path (sketch path is e03)
      "d30_lexsem_audit",     // composes e02's require-capped exact pair side
      "e04_centroid_assign",  // vectors x broadcast k-row centroid table
      "e16_assign_margin",    // same k-row broadcast shape, widened to top-2
      "e11_semdedup_kmeans",  // same k-row broadcast assignment feeding cells
      "e13_cell_source_mix",  // same k-row broadcast assignment feeding census
      "e17_cell_drift",       // same k-row broadcast assignment feeding the PSI histogram
      "e17b_cell_drift_stored", // drop-only assignment against the stored 8-row model
      "e14_ann_recall",       // truth side: md5-sampled (<=64-row) broadcast query set x corpus
      "e07_incr_neardup",     // new-batch side broadcasts (plan-gated elsewhere)
      // q38: the synthetic star derivation constant-folds the 1-row
      // name-filtered pipeline dim, so Catalyst proves the pipeline_id
      // equi-condition true and plans a 1-row-broadcast BNLJ; on a real
      // (non-derived) pipeline table the key survives and this is a BHJ
      "q38_lineage7_fastq")
    val offenders = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(whitelist)
      .flatMap { name =>
        val p = plan(name)
        val bad = p.linesIterator.filter(l =>
          l.contains("CartesianProduct") || l.contains("BroadcastNestedLoopJoin")).toSeq
        if (bad.isEmpty) Nil else Seq(s"$name: ${bad.head.trim}")
      }
    assert(offenders.isEmpty,
      "quadratic join shape (lost equi-key?) in:\n" + offenders.mkString("\n"))
  }

  test("e18 two-pass kth-threshold keeps its scale shape: coded probe " +
       "rows, one reused slim qid exchange, no candidate sort, " +
       "shuffle-hash kth join") {
    // AQE defers exchange reuse to runtime stages; the static planner's
    // ReuseExchange makes the sharing visible in the plan string, so the
    // gate pins the non-adaptive plan (the reuse-eligibility property —
    // both consumers pruning to the identical exchange — is what either
    // mechanism needs)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val p = try plan("e18_ann_adaptive")
      finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    // (a) the slim candidate frame is never sorted (the r12 rank-window
    // regression: sorting 302M candidate rows WAS 192 of 200 s at sf10).
    // The only sort allowed is the final exact-rescore window over the
    // ~k survivors per query, which orders by the exact `cos`.
    val badSorts = p.linesIterator.filter(l =>
      l.contains("Sort ") && (l.contains("cos_fast") || l.contains("__eps")))
      .toSeq
    assert(badSorts.isEmpty,
      "the slim candidate frame is being sorted:\n" + badSorts.mkString("\n"))
    // (b) the qid repartition is the plan's one sharing point: exactly
    // ONE exchange materializes the slim candidate frame, and the heap
    // aggregate reads it as a ReusedExchange — the probe join executes
    // once. Splitting the consumers' column sets (e.g. separate lo/hi
    // bound columns) breaks pruning-identity and silently doubles the
    // probe join; this caught exactly that during the r14 rework.
    val qidExchanges = p.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning(qid") && !l.contains("Reused"))
    assert(qidExchanges == 1,
      s"expected 1 materialized qid exchange, found $qidExchanges\n" + p)
    assert(p.contains("ReusedExchange"),
      "the second consumer of the slim frame no longer reuses the " +
        "exchange — the probe join runs twice\n" + p)
    // (c) the kth-threshold join stays SHUFFLE_HASH on qid (a sort-merge
    // would re-sort the candidates; a broadcast caps |queries| at driver
    // memory), with the branch-and-bound interval condition inline
    assert(p.contains("ShuffledHashJoin"), p)
    assert(p.contains("__kth"), "kth-threshold filter missing\n" + p)
    // (d) probe rows carry the 72 B int8 code, never the float vector:
    // the explode (whose output feeds the bucket exchange) must move the
    // code column only, and scoring must be the code expressions (the
    // sf30 probe-exchange byte wall, SCALE.md Addendum 6)
    val gen = p.linesIterator.filter(_.contains("Generate explode")).toSeq
    assert(gen.nonEmpty, "probe explode missing\n" + p)
    assert(gen.forall(l => l.contains("code#") && !l.contains("vec#")),
      "probe explode carries a float vector instead of the int8 code:\n" +
        gen.mkString("\n"))
    assert(p.contains("code16dot"),
      "coded probe scoring missing from the plan\n" + p)
    // the constant sound radius must ride the plan as a folded literal
    // (5.0E-4 = 2·Code16CosEps in the kth filter), never a per-row
    // column — an __eps column on the slim exchange both breaks
    // exchange-reuse pruning-identity and costs more bytes than the
    // probe-side cut saves (measured, r14)
    assert(!p.contains("__eps"),
      "a materialized eps column crept onto the slim candidate frame\n" + p)
  }

  test("bucketed near-dup probes prefilter BEFORE the pair-dedup shuffle " +
    "and exact-rescore after it") {
    // the scale contract of Knn.bucketedNearDupProbe: the codegen'd
    // double prefilter (doubledot) must sit BELOW the pair-dedup
    // HashAggregate in the plan tree (plans print top-down, parents
    // first), so only prefilter survivors are shuffled for dedup; the
    // exact rescore (q9dot) must sit ABOVE it, running on deduped
    // survivors only. The r11 shape deduped every raw candidate and then
    // sorted vector-attached rows — ~70 GB of sf10 spill.
    for (name <- Seq("e07b_incr_neardup_stored", "e19_incr_neardup_adaptive")) {
      val p = plan(name)
      val dedup = p.indexOf("HashAggregate(keys=[id_a")
      val pre = p.indexOf("doubledot")
      val exact = p.indexOf("q9dot")
      assert(dedup >= 0, s"$name: pair-dedup aggregate missing\n" + p)
      assert(pre > dedup,
        s"$name: double prefilter must be below (before) the pair-dedup " +
          "shuffle, not after it\n" + p)
      assert(exact >= 0 && exact < dedup,
        s"$name: exact rescore must run on deduped survivors only\n" + p)
    }
  }
}
