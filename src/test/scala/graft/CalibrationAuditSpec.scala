package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the round-10 audit trio: d36 dedup impact, d37 quality
  * calibration, e16 assignment margin. Each query's cell-exact values are
  * pinned by its DuckDB oracle; these tests pin the CONTRACTS the oracle
  * comparison can't state — cross-query consistency (d36 vs d03, e16 vs
  * e04), conservation totals, and monotonicity.
  */
class CalibrationAuditSpec extends AnyFunSuite {
  import SparkTestSession._

  test("d36: per-source counts conserve the corpus and pin GLOBAL canonicals") {
    val impact = SparkEntry.queries("d36_dedup_impact")(spark, sf)
    val docs = Tables(spark, sf).documents
    val byCol = impact.agg(
      sum("n_docs"), sum("n_kept"), sum("chars_total"), sum("chars_removed")).head()
    assert(byCol.getLong(0) == docs.count())
    // global canonical choice: total keeps == distinct texts (a per-source
    // canonical would count a cross-source copy once PER source instead)
    assert(byCol.getLong(1) == docs.select("text").distinct().count())
    assert(byCol.getLong(2) == docs.agg(sum("n_chars")).head().getLong(0))
    // chars_removed is the complement of the kept docs' chars
    val keptChars = docs
      .withColumn("__keep", col("doc_id") === min(col("doc_id")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("text"))))
      .filter(col("__keep")).agg(sum("n_chars")).head().getLong(0)
    assert(byCol.getLong(2) - byCol.getLong(3) == keptChars)
    val badShare = impact.filter(col("removed_share") < 0 || col("removed_share") > 1)
    assert(badShare.isEmpty)
  }

  test("d36: planted cross-source copies are charged to the mirror, not the origin") {
    import spark.implicits._
    // origin srcA holds the canonical (lowest doc_id); mirrors srcB/srcC
    // carry byte-identical copies; srcB also has one unique doc
    val docs = Seq(
      (1L, "srcA", 10L, "shared text one"),
      (2L, "srcB", 10L, "shared text one"),
      (3L, "srcC", 10L, "shared text one"),
      (4L, "srcB", 7L, "unique text"),
      (5L, "srcA", 5L, "another unique")
    ).toDF("doc_id", "source", "n_chars", "text")
    val rows = graft.queries.TextQ.dedupImpactFrom(docs)
      .collect().map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_kept"),
          r.getAs[Long]("chars_removed"))).toMap
    // the origin keeps everything; each mirror loses its copy even
    // though ITS copy is the only one in that source — the global
    // canonical is what a per-source dedup report cannot express
    assert(rows("srcA") == ((2L, 2L, 0L)))
    assert(rows("srcB") == ((2L, 1L, 10L)))
    assert(rows("srcC") == ((1L, 0L, 10L)))
  }

  test("d37: survival counts are suffix sums of the bins and bounded by the corpus") {
    val cal = SparkEntry.queries("d37_quality_calibration")(spark, sf)
      .orderBy(col("score_bin")).collect()
    assert(cal.nonEmpty)
    val total = cal.map(_.getAs[Long]("n_docs")).sum
    // threshold at the lowest bin's edge keeps every scored doc
    assert(cal.head.getAs[Long]("surv_docs") == total)
    // suffix-sum identity bin by bin, strictly decreasing upward
    cal.sliding(2).foreach { case Array(lo, hi) =>
      assert(lo.getAs[Long]("surv_docs") ==
        hi.getAs[Long]("surv_docs") + lo.getAs[Long]("n_docs"))
    }
    assert(cal.last.getAs[Long]("surv_docs") == cal.last.getAs[Long]("n_docs"))
    cal.foreach { r =>
      val share = r.getAs[Double]("surv_share")
      assert(share > 0 && share <= 1.0)
    }
    // the scored population is d21's (empty-text docs carry no evidence)
    val scored = SparkEntry.queries("d21_quality_score")(spark, sf).count()
    assert(total == scored)
  }

  test("e16: best centroid agrees with e04 cell-exactly; margins are ordered") {
    val margin = SparkEntry.queries("e16_assign_margin")(spark, sf)
    val assign = SparkEntry.queries("e04_centroid_assign")(spark, sf)
    assert(margin.count() == assign.count())
    // e16's (cid1, cos1) must be exactly e04's assignment — same float
    // policy, so equality is exact, not approximate
    val disagree = margin.alias("m").join(assign.alias("a"), Seq("vec_id"))
      .filter(col("m.cid1") =!= col("a.cid") || col("m.cos1") =!= col("a.cos"))
    assert(disagree.isEmpty)
    val bad = margin.filter(
      col("margin") < 0 || col("cid1") === col("cid2") ||
        (col("ambiguous") === 1) =!= (col("margin") < 0.05))
    assert(bad.isEmpty)
  }

  test("d41: recall reconciles with the raw d04 ∩ d06 pair intersection " +
       "and high-Jaccard bands are caught") {
    val audit = SparkEntry.queries("d41_sketch_recall")(spark, sf).collect()
    assert(audit.nonEmpty)
    audit.foreach { r =>
      val t = r.getAs[Long]("n_true"); val c = r.getAs[Long]("n_caught")
      assert(c >= 0 && c <= t, r.toString)
      val b = r.getAs[Long]("jac_band")
      assert(b >= 5 && b <= 9, s"band below the 0.5 truth threshold: $b")
      assert(r.getAs[Double]("recall")
        == BigDecimal(c.toDouble / t.toDouble)
          .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble, r.toString)
    }
    // cap is non-binding at this scale, so summed counts equal the raw
    // pair-set sizes: n_true == |d04|, n_caught == |d04 ∩ d06|
    val d04 = SparkEntry.queries("d04_ngram_jaccard")(spark, sf)
      .select("id_a", "id_b")
    val d06 = SparkEntry.queries("d06_minhash_dedup")(spark, sf)
      .select("id_a", "id_b")
    assert(audit.map(_.getAs[Long]("n_true")).sum == d04.count())
    assert(audit.map(_.getAs[Long]("n_caught")).sum
      == d04.intersect(d06).count())
    // the S-curve's top: near-identical pairs must not be missed — a
    // band-9 collapse is exactly the regression this audit exists for
    audit.filter(_.getAs[Long]("jac_band") == 9L).foreach { r =>
      assert(r.getAs[Double]("recall") >= 0.75, r.toString)
    }
  }

  test("d41: a planted controlled-Jaccard corpus populates every band " +
       "5..9 and the S-curve holds (band-9 perfect, top beats bottom)") {
    import spark.implicits._
    // 40 doc pairs per band; pair p's docs share a (k+2)-token prefix
    // then diverge into pair-unique vocabulary, so the pair's trigram
    // Jaccard is exactly k/(2m-k) with m = 40 shingles per doc, and no
    // shingle is shared across pairs (vocabulary disjoint by p)
    val m = 40
    val bands = Seq(28 -> 5L, 32 -> 6L, 35 -> 7L, 37 -> 8L, 39 -> 9L)
    val docs = bands.zipWithIndex.flatMap { case ((k, _), bi) =>
      (0 until 40).flatMap { j =>
        val p = bi * 40 + j
        val shared = (0 until k + 2).map(t => s"p${p}s$t")
        val a = shared ++ (0 until m - k).map(t => s"p${p}a$t")
        val b = shared ++ (0 until m - k).map(t => s"p${p}b$t")
        Seq((p * 2L, a.mkString(" ")), (p * 2L + 1, b.mkString(" ")))
      }
    }.toDF("doc_id", "text")
    val audit = graft.queries.TextQ.sketchRecallFrom(docs, maxTruthPairs = 4096)
      .collect().map(r => r.getAs[Long]("jac_band") -> r).toMap
    assert(audit.keySet == Set(5L, 6L, 7L, 8L, 9L),
      s"planted bands missing: ${audit.keySet}")
    // every pair is a true near-dup by construction
    assert(audit.values.map(_.getAs[Long]("n_true")).sum == 200L)
    val recall = audit.map { case (b, r) => b -> r.getAs[Double]("recall") }
    // deterministic md5 hashes → these are fixed values, not flaky draws:
    // near-identical pairs are all caught; the threshold-adjacent band
    // sits below the top of the curve (est-Jaccard noise around 0.5)
    assert(recall(9L) == 1.0, s"band-9 dropped pairs: $recall")
    assert(recall(5L) <= recall(9L) && recall(5L) >= 0.5,
      s"S-curve bottom out of range: $recall")
  }
}
