package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
  * "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD'03 —
  * the MOSS algorithm). The reference's fingerprint needs stop at whole-file
  * md5 (fileutils.py calculate_file_checksum); winnowing is the standard
  * scale-path upgrade: position-robust partial-overlap detection for
  * plagiarism / contamination scans, with guaranteed density (at least one
  * fingerprint per `w` consecutive k-grams).
  *
  * Algorithm: hash every k-char-gram, slide a window of `w` hashes, and in
  * each window select the minimum hash — rightmost occurrence on ties (the
  * paper's robust-winnowing tie rule). The union of selected (position,
  * hash) pairs is the document's fingerprint set; any shared substring of
  * length ≥ w + k − 1 between two documents is guaranteed to share a
  * fingerprint.
  *
  * Implementation is two shuffle-free projections: one materializes the
  * k-gram hash array, the next runs the window selection over it with
  * array higher-order functions. The split is load-bearing, not cosmetic:
  * HOF lambdas are interpreted, and an interpreted lambda RE-EVALUATES
  * every expression subtree it references per element — embedding the hash
  * array's defining expression inside the per-window lambda multiplies the
  * md5 work by O(windows × window refs), measured as a ~1000× blowup at
  * sf0.01. With the array bound to a column, each reference is an O(1)
  * buffer access. Same reason the selection uses `element_at` on the bound
  * array rather than `slice` (which would copy the window per reference).
  *
  * The k-gram hash is the first 12 hex chars of md5 (48 bits; fixed-width
  * lowercase hex, so lexicographic MIN == numeric MIN), chosen over
  * xxhash64 because every SQL engine has md5 — the DuckDB oracle
  * reproduces it verbatim.
  */
object Winnowing {

  /** Array of (1-based) k-gram hashes of `text`: h(i) = hex12(md5(substr(text, i, k))).
    * Guarded for short text — Spark's sequence(1, stop) turns DESCENDING
    * when stop < 1 ([1, 0]), it does not return empty. */
  def kgramHashes(text: Column, k: Int): Column =
    when(length(text) >= k,
      transform(
        sequence(lit(1), length(text) - (k - 1)),
        i => substring(md5(text.substr(i, lit(k)).cast("binary")), 1, 12)))
      .otherwise(array().cast("array<string>"))

  /** Selected fingerprints as an array of struct(pos, fp), given a BOUND
    * k-gram hash array column (see the class doc for why it must be a
    * column reference, not the defining expression).
    *
    * Per window start j in [1, m-w+1]: a single left-to-right fold keeps
    * the best (hash, position) with `<=` so the RIGHTMOST minimum wins.
    * Adjacent windows mostly re-select the same position; `array_distinct`
    * collapses them to the fingerprint set.
    */
  def fingerprintsFromHashes(h: Column, w: Int): Column = {
    val m = size(h)
    val picks = transform(
      sequence(lit(1), m - (w - 1)),
      j =>
        aggregate(
          sequence(lit(0), lit(w - 1)),
          // sentinel above any 12-char hex; pos 0 can never survive w >= 1
          struct(lit(0).as("pos"), lit("￿").as("fp")),
          (acc, o) => {
            val v = element_at(h, j + o)
            when(v <= acc.getField("fp"),
              struct((j + o).as("pos"), v.as("fp"))).otherwise(acc)
          }))
    // descending-sequence guard: documents with fewer than w k-grams
    // produce no window, not a bogus [1, 0] one
    when(m >= w, array_distinct(picks))
      .otherwise(array().cast("array<struct<pos:int,fp:string>>"))
  }

  /** Per-document fingerprint rows: (idCol, pos, fp), through the one-pass
    * native [[graft.functions.WinnowFps]] expression (compiled md5 +
    * monotonic-deque window minimum; ~10x the interpreted HOF formulation,
    * which remains below as [[fingerprintRowsReference]] and is proven
    * bit-identical in WinnowFpsSpec). Shuffle-free: one projection + one
    * generator. */
  def fingerprintRows(df: DataFrame, idCol: String, textCol: String,
                      k: Int = 7, w: Int = 4): DataFrame =
    df.select(col(idCol),
        explode_outer(graft.functions.WinnowFpsFn.winnowFps(col(textCol), k, w)).as("f"))
      .filter(col("f").isNotNull)
      .select(col(idCol), col("f.pos").as("pos"), col("f.fp").as("fp"))

  /** The declarative reference formulation of [[fingerprintRows]] (array
    * HOFs over built-ins only — the ground truth WinnowFpsSpec checks the
    * native expression against).
    *
    * explode_outer + null filter, NOT explode: InferFiltersFromGenerate
    * would synthesize size(fps)>0 from an inner explode and push it below
    * the projection, re-inlining and re-evaluating the ENTIRE md5 +
    * window-selection pipeline once more per row (measured ~2x here, 10x
    * on d12's trigram explode). */
  def fingerprintRowsReference(df: DataFrame, idCol: String, textCol: String,
                               k: Int = 7, w: Int = 4): DataFrame =
    df.select(col(idCol), kgramHashes(col(textCol), k).as("__h"))
      .select(col(idCol), explode_outer(fingerprintsFromHashes(col("__h"), w)).as("f"))
      .filter(col("f").isNotNull)
      .select(col(idCol), col("f.pos").as("pos"), col("f.fp").as("fp"))

  /** Substring-level repeat detection: per-document regions whose content
    * also appears in at least one OTHER document (RefinedWeb/The-Pile-style
    * repeated-substring removal, the dedup flavor between exact-document
    * (d03) and segment-level C4 (d13); reference's nearest analog is the
    * whole-file md5 of fileutils.py calculate_file_checksum).
    *
    * Winnowing guarantees every shared substring of length ≥ w+k−1 shares a
    * fingerprint, and selects a fingerprint at least every w k-grams inside
    * it — so a long cross-document repeat shows up as a RUN of
    * cross-document-shared fingerprints at small position gaps. Regions are
    * those runs (gaps-and-islands over positions, new island when the gap
    * exceeds `gapMax`), reported as [start_pos, end_pos] character spans
    * with their fingerprint count; `minFps` ≥ 2 suppresses single-
    * fingerprint coincidences. Spans are winnowing-resolution estimates of
    * the true repeat (± w+k−2 chars at each edge) — the guarantee is
    * recall: no repeat of length ≥ gapMax+k survives undetected.
    *
    * Scale shape (the reason this beats a suffix array at 100 TB): NO pair
    * join anywhere — one hash-agg + semi-join on `fp` to find cross-doc
    * fingerprints, one window over (doc, pos) to form islands. Both
    * exchanges are linear in the fingerprint count (~2/(w+1) of the
    * corpus chars); a hot boilerplate fingerprint costs one aggregation
    * row, not an O(df²) fan-out.
    */
  def repeatedRegions(df: DataFrame, idCol: String, textCol: String,
                      k: Int = 7, w: Int = 4, gapMax: Int = 10,
                      minFps: Int = 2): DataFrame = {
    val fps = fingerprintRows(df, idCol, textCol, k, w)
    val crossDoc = fps.groupBy("fp")
      .agg(countDistinct(col(idCol)).as("__nd"))
      .filter(col("__nd") > 1).select("fp")
    regionsFromFps(fps, crossDoc, idCol, k, gapMax, minFps)
  }

  /** The gaps-and-islands tail shared by [[repeatedRegions]] and
    * [[incrementalRepeatedRegions]]: restrict `fps` to the shared
    * fingerprint set, form islands per document, report spans. */
  private def regionsFromFps(fps: DataFrame, sharedFps: DataFrame,
                             idCol: String, k: Int, gapMax: Int,
                             minFps: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byDoc = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    fps.join(sharedFps, Seq("fp"), "left_semi")
      // lag is null on the first row → the `otherwise` arm opens island 1
      .withColumn("__brk",
        when(col("pos") - lag(col("pos"), 1).over(byDoc) <= gapMax, 0)
          .otherwise(1))
      .withColumn("__isl", sum(col("__brk")).over(byDoc))
      .groupBy(col(idCol), col("__isl"))
      .agg(
        min(col("pos")).as("start_pos"),
        (max(col("pos")) + (k - 1)).as("end_pos"),
        count(lit(1)).cast("int").as("n_fps"))
      .filter(col("n_fps") >= minFps)
      .select(col(idCol), col("start_pos"), col("end_pos"),
        (col("end_pos") - col("start_pos") + 1).as("span"), col("n_fps"))
  }

  /** Incremental [[repeatedRegions]] — the daily-crawl flow: report the
    * repeated regions of a NEW batch of documents against everything seen
    * so far WITHOUT rescanning history (the [[graft.text.Segments.incrementalSegmentDedup]]
    * pattern at the substring level).
    *
    * `knownFps` is the stored `(fp)` registry: the distinct winnowing
    * fingerprints of every previous batch (what [[fingerprintRows]] emits,
    * projected and deduped — a production pipeline materializes it as the
    * append-only side table). A new doc's fingerprint is cross-document iff
    * it is in the registry (some earlier doc contains the content — batch
    * ids are disjoint from history by contract) OR at least two distinct
    * docs of this batch share it. That is exactly the full-rerun
    * cross-document predicate restricted to the new ids, so
    * `incrementalRepeatedRegions(new, fps(old))._1 == repeatedRegions(old ∪ new)`
    * filtered to the new batch (RepeatedRegionsSpec proves it; unlike the
    * segment twin there is NO id-ordering requirement — the cross-doc flag
    * is order-free). Regions history would newly gain in OLD docs are out
    * of scope by design: yesterday's data is immutable, today's repeats of
    * it are today's problem.
    *
    * Returns (regions of the new batch, registry delta to append). Cost per
    * increment: fingerprint the batch, one hash-agg + one join against the
    * registry on `fp` — linear in the batch, never a rescan of the corpus.
    * A caller consuming both outputs should persist the batch's
    * fingerprint rows (both derive from them; the streaming twin
    * [[graft.streaming.DocStreams.repeatedRegionsStream]] does per
    * micro-batch). */
  def incrementalRepeatedRegions(newDocs: DataFrame, idCol: String,
                                 textCol: String, knownFps: DataFrame,
                                 k: Int = 7, w: Int = 4, gapMax: Int = 10,
                                 minFps: Int = 2): (DataFrame, DataFrame) = {
    val fps = fingerprintRows(newDocs, idCol, textCol, k, w)
    incrementalFromFps(fps, knownFps, idCol, k, gapMax, minFps)
  }

  /** [[incrementalRepeatedRegions]] split at the fingerprint rows, so a
    * caller (the streaming twin) can persist them across both consumers. */
  private[graft] def incrementalFromFps(fps: DataFrame, knownFps: DataFrame,
                                        idCol: String, k: Int, gapMax: Int,
                                        minFps: Int): (DataFrame, DataFrame) = {
    // registry probe, the scale shape shared with dedupImpactStream and
    // Segments.incrementalFlags: the fingerprint registry (append-only,
    // distinct by construction — a delta is anti-joined before it lands)
    // is SCANNED IN PLACE and semi-joined against a broadcast of the
    // batch's distinct fps; the old shape distinct-ed and left/anti-
    // joined the whole registry per increment — three registry-sized
    // exchanges per drop, growing with stream age. The known set is
    // batch-bounded; its defensive distinct costs a batch-sized exchange
    // and keeps the join-back multiplicity-proof even against a
    // hand-edited registry with duplicate rows.
    val batchFps = fps.select(col("fp")).distinct()
    val known = knownFps.select(col("fp"))
      .join(broadcast(batchFps), Seq("fp"), "left_semi")
      .distinct()
    // one aggregation pass over the batch's fingerprints decides BOTH
    // cross-doc conditions (>1 distinct batch docs, or known to history) —
    // a union of separate probes would scan the fingerprint plan twice more
    val shared = fps.groupBy("fp")
      .agg(countDistinct(col(idCol)).as("__nd"))
      .join(broadcast(known.withColumn("__known", lit(true))), Seq("fp"), "left")
      .filter(col("__nd") > 1 || col("__known").isNotNull)
      .select("fp")
    val regions = regionsFromFps(fps, shared, idCol, k, gapMax, minFps)
    val delta = batchFps.join(broadcast(known), Seq("fp"), "left_anti")
    (regions, delta)
  }

  /** Documents sharing ≥ `minShared` fingerprints — the winnowing twin of
    * the shingle-Jaccard pair generator: fingerprints are ~2/(w+1) of the
    * k-grams, so the self-join index is smaller than d04's for the same
    * guarantee on matches of length ≥ w+k−1.
    *
    * `maxFpDf` is the same stop-key cap the shingle path needs at scale
    * (d04's lesson): a fingerprint appearing in more than `maxFpDf`
    * documents is boilerplate — each such bucket fans out O(df²) pairs,
    * and on a template-heavy corpus the join degenerates without the cap
    * (measured: an 8× replicated word-soup corpus hung the uncapped join;
    * capped it runs in seconds with the planted pairs intact). */
  def sharedFingerprintPairs(df: DataFrame, idCol: String, textCol: String,
                             k: Int = 7, w: Int = 4, minShared: Int = 2,
                             maxFpDf: Option[Int] = Some(256)): DataFrame = {
    val fps0 = fingerprintRows(df, idCol, textCol, k, w)
      .select(col(idCol).as("id"), col("fp")).distinct()
    val fps = maxFpDf match {
      case None => fps0
      case Some(cap) =>
        val hot = fps0.groupBy("fp").agg(count(lit(1)).as("df"))
          .filter(col("df") > cap).select("fp")
        fps0.join(hot, Seq("fp"), "left_anti")
    }
    fps.as("a").join(fps.as("b"),
        col("a.fp") === col("b.fp") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }
}
