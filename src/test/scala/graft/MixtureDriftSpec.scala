package graft

import org.apache.spark.sql.functions._
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
