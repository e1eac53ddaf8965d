package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the round-10 planning/audit additions: d38 temperature-
  * scaled mixture and d39 snapshot-drift PSI. Cell-exact values are pinned
  * by the DuckDB oracles; these tests pin the semantic CONTRACTS —
  * temperature damping direction, budget conservation, the repetition cap,
  * PSI's zero-on-identical / positive-on-shift behavior, and term/total
  * consistency.
  */
class MixtureDriftSpec extends AnyFunSuite {
  import SparkTestSession._

  test("d38: sqrt weights damp big sources and boost small ones") {
    val mix = SparkEntry.queries("d38_temperature_mix")(spark, sf).collect()
    assert(mix.length > 1)
    val totalChars = mix.map(_.getAs[Long]("n_chars_src")).sum
    // natural (α=1) share vs temperature (α=0.5) share, both in ppm
    val shares = mix.map { r =>
      val natural = r.getAs[Long]("n_chars_src") * 1000000L / totalChars
      (natural, r.getAs[Long]("share_ppm"))
    }
    val biggest = shares.maxBy(_._1)
    val smallest = shares.minBy(_._1)
    assert(biggest._2 < biggest._1,
      s"largest source not damped: natural ${biggest._1} ppm vs ${biggest._2}")
    assert(smallest._2 > smallest._1,
      s"smallest source not boosted: natural ${smallest._1} ppm vs ${smallest._2}")
    // floor(sqrt) weight is the integer square root
    mix.foreach { r =>
      val n = r.getAs[Long]("n_chars_src"); val w = r.getAs[Long]("w_sqrt")
      assert(w * w <= n && (w + 1) * (w + 1) > n, s"w_sqrt not isqrt: $w vs $n")
    }
  }

  test("d38: planned chars conserve the budget; the cap binds at 4 epochs") {
    val mix = SparkEntry.queries("d38_temperature_mix")(spark, sf).collect()
    val totalChars = mix.map(_.getAs[Long]("n_chars_src")).sum
    val planned = mix.map(_.getAs[Long]("planned_chars")).sum
    // floor-division loses < 1 char per source, never overshoots
    assert(planned <= totalChars && planned > totalChars - mix.length)
    mix.foreach { r =>
      val n = r.getAs[Long]("n_chars_src")
      val p = r.getAs[Long]("planned_chars")
      val pc = r.getAs[Long]("planned_capped_chars")
      val epochs = r.getAs[Long]("epochs_ppm")
      assert(epochs == p * 1000000L / n)
      assert(r.getAs[Boolean]("capped") == (epochs > 4000000L))
      assert(pc == math.min(p, 4L * n))
    }
  }

  test("d39: identical snapshots give PSI exactly zero") {
    import spark.implicits._
    // every text length appears once in each snapshot (even/odd doc_id)
    // docs (2k, 2k+1) form an old/new pair with the same source and length
    val docs = (0 until 40).map { i =>
      (i.toLong, s"src${(i / 2) % 2}", (i / 2 * 100).toLong)
    }.toDF("doc_id", "source", "n_chars")
    val out = graft.queries.TextQ.snapshotDriftFrom(docs).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Double]("psi_term") == 0.0, r.toString)
      assert(r.getAs[Double]("psi_total") == 0.0, r.toString)
    }
  }

  test("d39: a planted length shift raises PSI only in the shifted source") {
    import spark.implicits._
    // srcStable: identical length mix across snapshots.
    // srcShift: old snapshot all short (bin 0), new all long (bin 24).
    val stable = (0 until 200).map(i => (i.toLong, "srcStable", 300L))
    val shift = (0 until 200).map { i =>
      (1000L + i, "srcShift", if (i % 2 == 0) 10L else 99999L)
    }
    val out = graft.queries.TextQ.snapshotDriftFrom(
      (stable ++ shift).toDF("doc_id", "source", "n_chars"))
      .select("source", "psi_total").distinct().collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out("srcStable") == 0.0)
    // a total old->new bin swap is a severe shift: PSI far above the
    // standard 0.2 "population changed" alarm line
    assert(out("srcShift") > 0.2, s"shift PSI ${out("srcShift")}")
  }

  test("e17: cell counts conserve the corpus; totals are the sum of terms") {
    val drift = SparkEntry.queries("e17_cell_drift")(spark, sf)
    val rows = drift.collect()
    assert(rows.length <= 8 && rows.nonEmpty)
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    assert(rows.map(r => r.getAs[Long]("n_old") + r.getAs[Long]("n_new")).sum
      == emb.count())
    val total = BigDecimal(rows.head.getAs[Double]("psi_total"))
    val termSum = rows.map(r => BigDecimal(r.getAs[Double]("psi_term"))).sum
    assert((total - termSum).abs < BigDecimal("1e-9"))
    rows.foreach { r =>
      assert(r.getAs[Double]("psi_term") >= 0.0, r.toString)
      assert(r.getAs[Double]("psi_total") == rows.head.getAs[Double]("psi_total"))
    }
  }

  test("Drift.psi: zero on identical histograms, positive on a swap, " +
       "smoothing defines bins absent from one snapshot") {
    import spark.implicits._
    val same = Seq((0, 10L, 10L), (1, 5L, 5L), (2, 0L, 0L))
      .toDF("bin", "n_old", "n_new")
    graft.ops.Drift.psi(same, Seq(), bins = 8).collect().foreach { r =>
      assert(r.getAs[Double]("psi_term") == 0.0)
      assert(r.getAs[Double]("psi_total") == 0.0)
    }
    // total occupancy swap between two bins: both terms positive
    val swap = Seq((0, 100L, 0L), (1, 0L, 100L)).toDF("bin", "n_old", "n_new")
    val out = graft.ops.Drift.psi(swap, Seq(), bins = 2).collect()
    out.foreach(r => assert(r.getAs[Double]("psi_term") > 0.0, r.toString))
    assert(out.head.getAs[Double]("psi_total") > 0.2)
  }

  test("d40: snapshot sums reconcile with q58 and ppm ratios are exact " +
       "floor divisions") {
    val drift = SparkEntry.queries("d40_fertility_drift")(spark, sf).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    val q58 = SparkEntry.queries("q58_token_fertility")(spark, sf).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    assert(drift.keySet == q58.keySet)
    q58.foreach { case (src, f) =>
      val d = drift(src)
      assert(d.getAs[Long]("n_docs_old") + d.getAs[Long]("n_docs_new")
        == f.getAs[Long]("n_docs"))
      assert(d.getAs[Long]("tokens_old") + d.getAs[Long]("tokens_new")
        == f.getAs[Long]("n_tokens"))
      assert(d.getAs[Long]("chars_old") + d.getAs[Long]("chars_new")
        == f.getAs[Long]("n_chars"))
      // a snapshot with zero tokens reports null ppm (nullif guard),
      // and null propagates into drift_ppm
      def cpt(chars: Long, toks: Long): Option[Long] =
        if (toks == 0L) None else Some(chars * 1000000L / toks)
      val cptOld = cpt(d.getAs[Long]("chars_old"), d.getAs[Long]("tokens_old"))
      val cptNew = cpt(d.getAs[Long]("chars_new"), d.getAs[Long]("tokens_new"))
      def field(n: String): Option[Long] =
        if (d.isNullAt(d.fieldIndex(n))) None else Some(d.getAs[Long](n))
      assert(field("cpt_old_ppm") == cptOld)
      assert(field("cpt_new_ppm") == cptNew)
      assert(field("drift_ppm") ==
        (for (o <- cptOld; n <- cptNew) yield n - o))
    }
  }

  test("d39b: the stored-registry probe is bitwise-equal to the " +
       "from-scratch d39") {
    val full = SparkEntry.queries("d39_snapshot_drift")(spark, sf).collect()
      .map(_.toString).sorted
    val stored = SparkEntry.queries("d39b_drift_stored")(spark, sf).collect()
      .map(_.toString).sorted
    assert(stored.sameElements(full),
      s"d39b diverged from d39: ${full.length} vs ${stored.length} rows")
    // and the registry itself conserves history: its counts sum to the
    // even-id doc count (zero rows lost or double-counted in the build)
    val reg = graft.store.Registries.driftHistogram(spark, sf)
    val evens = Tables(spark, sf).documents
      .filter(col("doc_id") % 2 === 0).count()
    assert(reg.agg(sum("n_old")).head().getLong(0) == evens)
  }

  test("e17b: the frozen-model registry probe is bitwise-equal to the " +
       "from-scratch e17") {
    val full = SparkEntry.queries("e17_cell_drift")(spark, sf).collect()
      .map(_.toString).sorted
    val stored = SparkEntry.queries("e17b_cell_drift_stored")(spark, sf)
      .collect().map(_.toString).sorted
    assert(stored.sameElements(full),
      s"e17b diverged from e17: ${full.length} vs ${stored.length} rows")
    // the label registry conserves history: one label per even vector
    val labels = graft.store.Registries.cellLabels(spark, sf)
    val evens = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter(col("vec_id") % 2 === 0).count()
    assert(labels.count() == evens)
  }

  test("m16: image-bucket counts conserve the corpus; per-source totals " +
       "are the sum of terms") {
    val rows = SparkEntry.queries("m16_image_drift")(spark, sf).collect()
    val docs = Tables(spark, sf).documents.count()
    assert(rows.map(r => r.getAs[Long]("n_old") + r.getAs[Long]("n_new")).sum
      == docs, "every document's image must land in exactly one bucket")
    rows.groupBy(_.getAs[String]("source")).foreach { case (src, rs) =>
      val total = BigDecimal(rs.head.getAs[Double]("psi_total"))
      val termSum = rs.map(r => BigDecimal(r.getAs[Double]("psi_term"))).sum
      assert((total - termSum).abs < BigDecimal("1e-9"), s"$src: $total vs $termSum")
      rs.foreach { r =>
        assert(r.getAs[Double]("psi_term") >= 0.0, r.toString)
        val b = r.getAs[Long]("hash_bin")
        assert(b >= 0 && b < 16, s"bucket out of the fixed B=16 space: $b")
      }
    }
  }

  test("Drift.psi properties on generated histograms: terms nonnegative, " +
       "zero exactly when smoothed ratios agree, totals sum terms, " +
       "old/new symmetric") {
    import spark.implicits._
    val histGen: Gen[Seq[(Int, Long, Long)]] = for {
      nBins <- Gen.chooseNum(1, 12)
      rows <- Gen.listOfN(nBins,
        Gen.zip(Gen.chooseNum(0L, 100000L), Gen.chooseNum(0L, 100000L)))
    } yield rows.zipWithIndex.map { case ((o, n), i) => (i, o, n) }
    val samples = Iterator.continually(histGen.sample).flatten.take(40).toSeq
    for (hist <- samples) {
      val df = hist.toDF("bin", "n_old", "n_new")
      val out = graft.ops.Drift.psi(df, Seq(), bins = hist.length).collect()
      val No = hist.map(_._2).sum; val Nn = hist.map(_._3).sum
      val b = hist.length
      out.foreach { r =>
        val term = r.getAs[Double]("psi_term")
        assert(term >= 0.0, r.toString)
        // smoothed-ratio equality ⇒ exact 0.0 (an integer identity the
        // smoothing makes decidable even on empty bins); the converse is
        // only one-way — a genuinely tiny shift can round to 0.0 at the
        // 6-decimal grain
        val zero = (r.getAs[Long]("n_new") + 1) * (No + b) ==
          (r.getAs[Long]("n_old") + 1) * (Nn + b)
        if (zero) assert(term == 0.0, s"equal smoothed ratios, term != 0: $r")
      }
      val total = out.head.getAs[Double]("psi_total")
      val termSum = out.map(r => BigDecimal(r.getAs[Double]("psi_term"))).sum
      assert((BigDecimal(total) - termSum).abs < BigDecimal("1e-9"))
      // PSI is symmetric in the two snapshots (each term is
      // (p-q)ln(p/q)); the two directions compute ln on reciprocal
      // correctly-rounded quotients, so agreement is to the rounding
      // grain, not bitwise
      val sw = graft.ops.Drift.psi(
        df.select(col("bin"), col("n_new").as("n_old"), col("n_old").as("n_new")),
        Seq(), bins = hist.length).collect()
      // each of the ≤12 terms can land on the other side of a 1e-6
      // rounding boundary in the reversed direction
      assert(math.abs(sw.head.getAs[Double]("psi_total") - total) <= 1.3e-5)
    }
  }

  test("d38 portability domain: floor of IEEE sqrt IS the integer sqrt " +
       "for per-source char counts up to 2^44 (generated)") {
    // the engine-portability argument: both engines floor the SAME
    // correctly-rounded sqrt; this pins the stronger claim that the
    // result is the EXACT isqrt throughout the realistic domain (2^44
    // chars/source ≈ 17 TB of text in ONE source) — including the
    // adversarial k^2-1 / k^2 boundary values where a rounding slip
    // would land
    val gen = Gen.oneOf(
      Gen.chooseNum(0L, 1L << 44),
      Gen.chooseNum(1L, 1L << 22).map(k => k * k - 1),
      Gen.chooseNum(1L, 1L << 22).map(k => k * k))
    val ns = Iterator.continually(gen.sample).flatten.take(2000).toSeq
    for (n <- ns) {
      val w = math.floor(math.sqrt(n.toDouble)).toLong
      assert(w * w <= n && (w + 1) * (w + 1) > n, s"floor-sqrt != isqrt at $n")
    }
  }

  test("d38b: the census-registry plan is bitwise-equal to the " +
       "corpus-scan d38") {
    val full = SparkEntry.queries("d38_temperature_mix")(spark, sf).collect()
      .map(_.toString).sorted
    val stored = SparkEntry.queries("d38b_mixture_stored")(spark, sf)
      .collect().map(_.toString).sorted
    assert(stored.sameElements(full),
      s"d38b diverged from d38: ${full.length} vs ${stored.length} rows")
    // the census registry conserves the corpus: char totals match a
    // direct scan, so the zero-scan plan is planning over real totals
    val census = graft.store.Registries.sourceCensus(spark, sf)
    val docs = Tables(spark, sf).documents
    assert(census.agg(sum("n_chars_src")).head().getLong(0)
      == docs.agg(sum("n_chars")).head().getLong(0))
    assert(census.agg(sum("n_docs_src")).head().getLong(0) == docs.count())
  }

  test("d39: counts conserve the corpus and totals are the sum of terms") {
    val drift = SparkEntry.queries("d39_snapshot_drift")(spark, sf)
    val docs = Tables(spark, sf).documents
    val sums = drift.agg(sum("n_old"), sum("n_new")).head()
    assert(sums.getLong(0) + sums.getLong(1) == docs.count())
    val rows = drift.collect()
    rows.groupBy(_.getAs[String]("source")).foreach { case (src, rs) =>
      val total = BigDecimal(rs.head.getAs[Double]("psi_total"))
      val termSum = rs.map(r => BigDecimal(r.getAs[Double]("psi_term"))).sum
      assert((total - termSum).abs < BigDecimal("1e-9"), s"$src: $total vs $termSum")
      // PSI is a sum of (p-q)ln(p/q) terms, each >= 0
      rs.foreach(r => assert(r.getAs[Double]("psi_term") >= 0.0, r.toString))
    }
  }
}
