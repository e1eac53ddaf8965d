package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (not driver contract): scale the document/embedding corpora
  * by replication-with-rewrite and time the sketch operators, to observe
  * how their cost curves bend well past the provided scale factors.
  * Usage: `sbt "runMain graft.ScaleProbe [factor]"`. */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      // every TypedImperativeAggregate in graft keeps an O(k)-bounded
      // buffer (CappedCollect, TopKRows, MinHashSig, SimHashSig), so the
      // 128-key sort-based fallback only costs (measured 2-5x on the
      // posting-list dedup paths) without protecting anything
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", 1 << 21)
      // Tables.events casts TIMESTAMP_NTZ via the session timezone; pin it
      // like every other entry point so timings/counts are TZ-independent
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t = Tables(spark, "/root/testdata/sf0.1")

    // replicate docs with per-copy id offsets and a token of divergence so
    // copies are near-dups (not exact dups) of their source
    val docs = t.documents
      .crossJoin(spark.range(factor).toDF("copy"))
      .withColumn("doc_id", col("doc_id") * factor + col("copy"))
      .withColumn("text", concat(col("text"), lit(" marker"), col("copy")))
      .drop("copy").repartition(32).cache()
    val n = docs.count()

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"$name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s   ($rows rows)")
    }
    println(s"corpus: $n documents")

    // --- m14 hot-triple cap (runnable standalone: `runMain graft.ScaleProbe 8 m14`):
    // plant one ubiquitous 3-frame shingle (the
    // black-card / station-ident case) carried by h videos on top of a
    // base corpus of unique streams. Uncapped pair volume grows h²; the
    // capped path (HotTripleCap, the registered m14 shape) drops the
    // bucket once h crosses the cap, so its cost flattens. Watch the
    // uncapped column bend quadratic while capped stays level.
    println("== m14 hot-triple cap curve ==")
    val baseStreams = spark.range(50000).select(
      col("id").as("doc_id"),
      // 5 unique frames per video: dhash = f(doc, idx), never shared
      explode(expr("sequence(0, 4)")).as("frame_idx"))
      .withColumn("dhash", abs(xxhash64(col("doc_id") * 7 + col("frame_idx"))) % (1L << 24))
    for (h <- Seq(512, 2048, 8192)) {
      val hot = spark.range(h).select(
        (col("id") + 1000000L).as("doc_id"),
        explode(expr("sequence(0, 2)")).as("frame_idx"))
        .withColumn("dhash", col("frame_idx") + (1L << 25)) // shared triple
      val corpus = baseStreams.unionByName(hot).repartition(32).cache()
      corpus.count()
      time(f"m14_hot$h%5d_capped") {
        graft.queries.MultimodalQ.clipPairs(corpus,
          maxBucket = Some(graft.queries.MultimodalQ.HotTripleCap)).count()
      }
      if (h <= 2048) time(f"m14_hot$h%5d_uncapped") {
        graft.queries.MultimodalQ.clipPairs(corpus).count()
      }
      corpus.unpersist()
    }
    if (args.lift(1).contains("m14")) { spark.stop(); return }

    time("minhash_lsh") {
      graft.dedup.MinHashLsh.nearDuplicates(docs, "doc_id", "text", 0.5).count()
    }
    time("simhash_nocap") {
      graft.dedup.SimHash.nearDuplicates(docs, "doc_id", "text", 6, 8).count()
    }
    time("simhash_balanced") {
      graft.dedup.SimHash.nearDuplicates(docs, "doc_id", "text",
        graft.dedup.SimHash.Balanced).count()
    }
    time("exact_jaccard_nocap") {
      graft.dedup.Shingles.jaccardPairs(docs, "doc_id", "text", 3, 0.5).count()
    }
    time("exact_jaccard_cap64") {
      graft.dedup.Shingles.jaccardPairs(docs, "doc_id", "text", 3, 0.5,
        Some(64)).count()
    }
    time("exact_jaccard_cap64_legacy_selfjoin") {
      // r3 formulation: stop-list + anti-join + shingle self-join
      val sh = graft.dedup.Shingles.explodeShingleHashes(docs, "doc_id", "text", 3)
      val stop = sh.groupBy("sh").agg(count(lit(1)).as("df"))
        .filter(col("df") > 64).select("sh")
      val filtered = sh.join(broadcast(stop), Seq("sh"), "left_anti")
      val sizes = filtered.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
      val a = filtered.select(col("doc_id").as("id_a"), col("sh"))
      val b = filtered.select(col("doc_id").as("id_b"), col("sh"))
      a.join(b, Seq("sh")).filter(col("id_a") < col("id_b"))
        .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_common"))
        .join(sizes.select(col("doc_id").as("id_a"), col("sz").as("n_a")), Seq("id_a"))
        .join(sizes.select(col("doc_id").as("id_b"), col("sz").as("n_b")), Seq("id_b"))
        .withColumn("jaccard", col("n_common").cast("double") /
          (col("n_a") + col("n_b") - col("n_common")).cast("double"))
        .filter(col("jaccard") >= 0.5).count()
    }
    time("token_stats") {
      graft.queries.TextQ.tokenStats(spark, "/root/testdata/sf0.1").count()
    }
    time("dup_clusters_cc") {
      graft.ops.ConnectedComponents.clusters(
        graft.dedup.Shingles.jaccardPairs(docs, "doc_id", "text", 3, 0.5,
          Some(64)), "id_a", "id_b").count()
    }
    time("winnow_fps_native") {
      graft.text.Winnowing.fingerprintRows(docs, "doc_id", "text").count()
    }
    time("winnow_shared_pairs") {
      // worst-case input for the fp self-join: a ~30-word-vocabulary soup
      // means every 7-char gram is corpus-wide boilerplate, so the df cap
      // drops ALL fingerprints (0 pairs is the correct answer here — no
      // 7-gram distinguishes the copies) — what this measures is that the
      // capped join stays bounded instead of going quadratic (the uncapped
      // variant hangs on this corpus); pair recovery on realistic text is
      // NlpSpec's planted-near-dup test
      graft.text.Winnowing.sharedFingerprintPairs(docs, "doc_id", "text",
        minShared = 30).count()
    }
    time("langid_join") {
      graft.text.LangId.classify(docs, "doc_id", "text").count()
    }
    time("langid_native") {
      graft.text.LangId.classifyNative(docs, "doc_id", "text").count()
    }
    time("tfidf_topk") {
      graft.text.Relevance.topTerms(docs, "doc_id", "text", 3).count()
    }
    time("stratified_exact") {
      graft.ops.Sampling.stratifiedExact(docs, Seq("source", "lang"),
        col("doc_id"), 1, 10).count()
    }

    // perceptual-hash banding at hash-collapse scale: near-dup-heavy
    // corpora collapse short perceptual hashes onto few distinct values
    // (sf0.1 images: 5000 docs -> 105 dHashes), so model that regime
    // directly — 200 base 24-bit patterns, every 7th doc a 1-bit-flipped
    // neighbor. Per-row banding pays bucket-quadratic candidate volume
    // (needs the hot-chunk cap, which DROPS pairs); the grouped variant
    // bands distinct values only — complete AND cheaper, and the gap
    // widens with corpus size at fixed distinct-hash count.
    val phashes = docs.select(col("doc_id"),
      (abs(xxhash64(col("doc_id") % 200)) % 16777216)
        .bitwiseXOR(when(col("doc_id") % 7 === 0,
          expr("shiftleft(1L, cast(doc_id % 24 as int))"))
          .otherwise(0L)).as("dhash"))
    time("phash_perrow_cap256") {
      graft.dedup.SimHash.hammingNearDuplicates(phashes, "doc_id", "dhash",
          maxDist = 2, chunks = 4, maxChunkBucket = Some(256), bits = 24)
        .filter(col("hamming") >= 1).count()
    }
    time("phash_grouped_nocap") {
      graft.dedup.SimHash.hammingNearDuplicatesGrouped(phashes, "doc_id", "dhash",
        maxDist = 2, chunks = 4, bits = 24).count()
    }

    // events-side operators: replicate with fresh event ids AND fresh user
    // ids, so the key space grows with the factor (the scale-out shape; the
    // per-key history length stays constant)
    val ev = t.events
      .crossJoin(spark.range(factor).toDF("copy"))
      .withColumn("event_id", col("event_id") * factor + col("copy"))
      .withColumn("user_id", col("user_id") * factor + col("copy"))
      .drop("copy").repartition(32).cache()
    println(s"events x$factor: ${ev.count()} rows")
    time("asof_union_window") {
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), expr("ts div 1000").as("p_us"))
      val c = ev.filter(col("event_type") === "click")
        .select(col("user_id"), expr("ts div 1000").as("c_us"))
      graft.ops.AsOfJoin.backward(p, c, Seq("user_id"), "p_us", "c_us").count()
    }
    time("asof_native_merge") {
      graft.GraftExtensions.registerAll(spark)
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), expr("ts div 1000").as("p_us"))
      val c = ev.filter(col("event_type") === "click")
        .select(col("user_id"), expr("ts div 1000").as("c_us"))
      graft.ops.AsOfJoin.backwardMerge(p, c, Seq("user_id"), "p_us", "c_us").count()
    }
    time("sessionize_batch") {
      graft.ops.Sessionize.sessions(
        ev.withColumn("us", expr("ts div 1000")),
        "user_id", "us", "event_id", 30L * 60 * 1000000).count()
    }
    time("range_join_bucketized") {
      val e = ev.filter(col("event_type") === "error")
        .select(col("event_id"), expr("ts div 1000").as("s_us"),
          (expr("ts div 1000") + 300000000L).as("e_us"))
      val p = ev.filter(col("event_type") === "purchase")
        .select(expr("ts div 1000").as("p_us"))
      graft.ops.RangeJoin.pointsInIntervals(e, p, "s_us", "e_us", "p_us",
        300000000L).count()
    }

    // bounded top-k vs window top-k on a replicated fact: the window sorts
    // everything in as many tasks as there are groups; the heap aggregate's
    // shuffle stays O(groups x partitions x k) regardless of factor
    val li = t.lineitem
      .crossJoin(spark.range(factor).toDF("copy"))
      .withColumn("l_orderkey", col("l_orderkey") * factor + col("copy"))
      .drop("copy").repartition(32).cache()
    println(s"lineitem x$factor: ${li.count()} rows")
    time("segment_dedup") {
      graft.text.Segments.segmentDedup(docs, "doc_id", "text", 3).count()
    }
    time("boilerplate_exact") {
      graft.text.Segments.boilerplate(docs, "doc_id", "text", 3, 3).count()
    }
    time("boilerplate_sketch_mg") {
      val segs = graft.text.Segments.explodeSegments(docs, "doc_id", "text", 3)
        .where(col("seg").isNotNull)
      segs.agg(graft.functions.FreqSketch.freqSketch(col("seg"), 64).as("s"))
        .select(explode(col("s"))).count()
    }
    time("bpe_train_distributed_8") {
      graft.text.Bpe.train(docs, "text", numMerges = 8).merges.size.toLong
    }
    time("bpe_encode") {
      val model = graft.text.Bpe.trainAuto(docs, "text", numMerges = 24)
      docs.select(size(graft.functions.BpeEncode.bpeEncode(col("text"), model))
        .as("n")).agg(sum("n")).head.getLong(0)
    }
    time("source_overlap_exact") {
      graft.dedup.CorpusOverlap.exactPairJaccard(docs, "source", "text", 3).count()
    }
    time("source_overlap_sketch") {
      graft.dedup.CorpusOverlap.sketchPairJaccard(docs, "source", "text", 3, 128).count()
    }
    time("bigram_fluency") {
      graft.text.Fluency.bigramFluency(docs, "doc_id", "text").count()
    }
    time("bpe_encode_ids") {
      val model = graft.text.Bpe.trainAuto(docs, "text", numMerges = 24)
      docs.select(size(graft.functions.BpeEncode.bpeEncodeIds(col("text"), model))
        .as("n")).agg(sum("n")).head.getLong(0)
    }
    time("bloom_prune_semijoin") {
      // decontamination shape: probe side too big to want an exact
      // broadcast — 1/50 of the corpus's texts
      val probe = docs.filter(col("doc_id") % 50 === 0)
        .select(col("text").as("probe_text"))
      graft.ops.BloomPrune.semiJoin(docs, "text", probe, "probe_text",
        expectedItems = n / 50 + 1).count()
    }
    time("topk_window") {
      graft.ops.WindowOps.topK(li, Seq("l_returnflag"),
        Seq(col("l_extendedprice").desc, col("l_orderkey").asc,
          col("l_linenumber").asc), k = 3).count()
    }
    time("topk_bounded_heap") {
      graft.ops.WindowOps.topKBounded(li
          .select("l_returnflag", "l_extendedprice", "l_orderkey", "l_linenumber"),
        Seq("l_returnflag"),
        Seq(("l_extendedprice", true), ("l_orderkey", false), ("l_linenumber", false)),
        k = 3).count()
    }
    // perceptual-hash dedup path at scale: dHash the replicated corpus's
    // payloads (decode-bound) then the banded hamming join (index-bound)
    val hashes = {
      import spark.implicits._
      docs.select(col("doc_id"), length(col("text").cast("binary")).as("nn"))
        .as[(Long, Long)]
        .mapPartitions(_.flatMap { case (id, nn) =>
          graft.multimodal.Multimodal.CompressedImage.dhash(id,
            graft.multimodal.Multimodal.CompressedImage.renderPattern(
              nn, (nn % 13).toInt + 4, ((nn / 13) % 11).toInt + 4))
        }).toDF().cache()
    }
    time("image_dhash_decode") { hashes.count() }
    time("hamming_neardup_banded") {
      graft.dedup.SimHash.hammingNearDuplicates(hashes, "doc_id", "dhash",
        maxDist = 2, chunks = 4, maxChunkBucket = Some(256), bits = 24).count()
    }
    time("hamming_incremental") {
      graft.dedup.SimHash.incrementalHammingNearDuplicates(
        hashes.filter(col("doc_id") % 8 === 0), hashes.filter(col("doc_id") % 8 =!= 0),
        "doc_id", "dhash", maxDist = 2, chunks = 4,
        maxChunkBucket = Some(256), bits = 24).count()
    }

    // --- adversarial d04 at 64x: a heavily-templated corpus, the posting
    // cap's worst case. Every copy shares a ~35-word boilerplate template
    // and diverges only in a short tail, so nearly every trigram shingle
    // is corpus-wide: the stop-shingle preprocessing must absorb ALL of
    // it (df cap) and the capped posting lists must stay bounded instead
    // of fanning 64k^2 pairs through the hot shingles. Watch for a cliff:
    // wall time should stay ~linear in corpus size across the cap values.
    val template = (1 to 35).map(i => s"boiler$i plate$i").mkString(" ")
    val tfac = 64
    val templated = t.documents.limit(1000)
      .crossJoin(spark.range(tfac).toDF("copy"))
      .withColumn("doc_id", col("doc_id") * tfac + col("copy"))
      .withColumn("text", concat(lit(template), lit(" "),
        substring(col("text"), 1, 60), lit(" tail"), col("copy")))
      .drop("copy").repartition(32).cache()
    println(s"templated corpus: ${templated.count()} docs (64x, shared boilerplate)")
    for (cap <- Seq(64, 256, 1024))
      time(s"d04_templated_cap$cap") {
        graft.dedup.Shingles.jaccardPairs(templated, "doc_id", "text", 3, 0.5,
          Some(cap)).count()
      }


    // --- registry growth: 50 simulated daily drops. Each drop signs ~2%
    // of the corpus and probes the registry accumulated from every
    // earlier drop (the d26b shape). The quantity under test is the
    // probe-cost CURVE as the registry grows 49x. Both probe shapes are
    // measured: re-banding the stored signature table per drop (the r7
    // API — cost grows with registry size because the stored side's
    // banding is recomputed every day), and joining the DURABLE band
    // index (`incrementalNearDupFromIndex` — the banding is stored state,
    // so the probe pays only the batch's bands + matched buckets; this
    // probe's finding, now the d26b production shape).
    println("== registry growth: 50 daily drops ==")
    val sigDir = java.nio.file.Files.createTempDirectory("probe_sig").toString
    val bandDir = java.nio.file.Files.createTempDirectory("probe_band").toString
    // self-compacting twin dirs: same appends, but BatchCommit.maybeCompact
    // (threshold 8 files) runs after each drop — the r8 probe diagnosed the
    // toy-scale growth as per-drop FILE-COUNT overhead (listing + footer +
    // one task per file); this twin shows the auto-compaction policy
    // flattens the curve while the probe stays result-identical
    val sigDirC = java.nio.file.Files.createTempDirectory("probe_sigc").toString
    val bandDirC = java.nio.file.Files.createTempDirectory("probe_bandc").toString
    def nFiles(dir: String) = new java.io.File(dir).listFiles()
      .count(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
    val reportAt = Set(2, 10, 25, 50)
    var drop = 0
    while (drop < 50) {
      val batch = t.documents.filter(col("doc_id") % 50 === drop)
      val newSig = graft.dedup.MinHashLsh.signatures(batch, "doc_id", "text")
        .cache()
      newSig.count()
      val newBands = graft.dedup.MinHashLsh.bandIndex(newSig, "doc_id")
      if (drop == 0) {
        newSig.write.mode("overwrite").parquet(sigDir)
        newBands.write.mode("overwrite").parquet(bandDir)
        newSig.write.mode("overwrite").parquet(sigDirC)
        newBands.write.mode("overwrite").parquet(bandDirC)
      } else {
        val storedSig = spark.read.parquet(sigDir)
        val t0 = System.nanoTime()
        val pairsResign = graft.dedup.MinHashLsh.incrementalNearDupFromSig(
          newSig, storedSig, "doc_id", minEstJaccard = 0.5)._1.count()
        val t1 = System.nanoTime()
        val pairsIndex = graft.dedup.MinHashLsh.incrementalNearDupFromIndex(
          newSig, spark.read.parquet(bandDir), storedSig, "doc_id",
          minEstJaccard = 0.5)._1.count()
        val t2 = System.nanoTime()
        val pairsCompacted = graft.dedup.MinHashLsh.incrementalNearDupFromIndex(
          newSig, spark.read.parquet(bandDirC), spark.read.parquet(sigDirC),
          "doc_id", minEstJaccard = 0.5)._1.count()
        val t3 = System.nanoTime()
        require(pairsResign == pairsIndex, "probe shapes disagree")
        require(pairsCompacted == pairsIndex, "compacted registry diverged")
        if (reportAt(drop + 1))
          println(f"drop ${drop + 1}%2d: resign ${(t1 - t0) / 1e9}%6.3f s | " +
            f"index ${(t2 - t1) / 1e9}%6.3f s (${nFiles(bandDir)}%3d files) | " +
            f"compacted ${(t3 - t2) / 1e9}%6.3f s (${nFiles(bandDirC)}%3d files) " +
            f"($pairsIndex pairs, registry ${storedSig.count()} sigs)")
        newSig.write.mode("append").parquet(sigDir)
        newBands.write.mode("append").parquet(bandDir)
        newSig.write.mode("append").parquet(sigDirC)
        newBands.write.mode("append").parquet(bandDirC)
        graft.streaming.BatchCommit.maybeCompact(spark, sigDirC, maxFiles = 8)
        graft.streaming.BatchCommit.maybeCompact(spark, bandDirC, maxFiles = 8)
        ()
      }
      newSig.unpersist()
      drop += 1
    }

    // --- cluster-maintenance growth: 20 drops through d33's update step
    // (pairs from the durable band index, labels = CC over stored label
    // edges ∪ the drop's pairs, labels rewritten). The quantity under
    // test: per-drop update cost as the LABEL table grows — it should
    // track |labels| + |drop pairs|, never the accumulated pair count.
    println("== cluster maintenance: 20 daily drops ==")
    val sig3 = java.nio.file.Files.createTempDirectory("probe_cm_sig").toString
    val band3 = java.nio.file.Files.createTempDirectory("probe_cm_band").toString
    val lab3 = java.nio.file.Files.createTempDirectory("probe_cm_lab").toString + "/l"
    val reportCm = Set(2, 5, 10, 20)
    var d2 = 0
    while (d2 < 20) {
      val batch = docs.filter(col("doc_id") % 20 === d2) // 8x corpus slices
      val newSig = graft.dedup.MinHashLsh.signatures(batch, "doc_id", "text").cache()
      newSig.count()
      val newBands = graft.dedup.MinHashLsh.bandIndex(newSig, "doc_id")
      if (d2 == 0) {
        newSig.write.mode("overwrite").parquet(sig3)
        newBands.write.mode("overwrite").parquet(band3)
        graft.ops.ConnectedComponents.clusters(
            graft.dedup.MinHashLsh.nearDupFromSig(newSig, "doc_id", 0.5, graft.dedup.MinHashLsh.Params()),
            "id_a", "id_b")
          .select(col("id").as("doc_id"), col("cluster_id"))
          .write.mode("overwrite").parquet(lab3)
      } else {
        val t0 = System.nanoTime()
        val pairs = graft.dedup.MinHashLsh.incrementalNearDupFromIndex(
          newSig, spark.read.parquet(band3), spark.read.parquet(sig3),
          "doc_id", minEstJaccard = 0.5)._1
        val stored = spark.read.parquet(lab3)
        val edges = stored.filter(col("doc_id") =!= col("cluster_id"))
          .select(col("doc_id").as("id_a"), col("cluster_id").as("id_b"))
          .unionByName(pairs.select("id_a", "id_b"))
        val labels = graft.ops.ConnectedComponents.clusters(edges, "id_a", "id_b")
          .select(col("id").as("doc_id"), col("cluster_id"))
        labels.write.mode("overwrite").parquet(lab3 + "__tmp")
        val nLabels = spark.read.parquet(lab3 + "__tmp").count()
        val t1 = System.nanoTime()
        if (reportCm(d2 + 1))
          println(f"drop ${d2 + 1}%2d: update ${(t1 - t0) / 1e9}%6.3f s " +
            f"($nLabels labels)")
        // swap tmp in (probe-local; the stream does the aside dance)
        val fsP = new org.apache.hadoop.fs.Path(lab3)
        val fs = fsP.getFileSystem(spark.sessionState.newHadoopConf())
        fs.delete(fsP, true)
        fs.rename(new org.apache.hadoop.fs.Path(lab3 + "__tmp"), fsP)
        newSig.write.mode("append").parquet(sig3)
        newBands.write.mode("append").parquet(band3)
      }
      newSig.unpersist()
      d2 += 1
    }
    spark.stop()
  }
}
