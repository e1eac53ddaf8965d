package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** m15 interleaved multimodal packing: the invariants the closed-form
  * construction promises — images never straddle a pack boundary, packs
  * never exceed capacity, every modality is charged its exact cost, and
  * the per-source token stream tiles with no gaps. */
class PackingSpec extends AnyFunSuite {
  import SparkTestSession._

  private val cap = 2048L
  private val imgTok = 64L
  private lazy val rows =
    graft.queries.MultimodalQ.interleavedPacking(spark, sf).collect()

  test("images are slot-aligned and never straddle a pack boundary") {
    val imgs = rows.filter(_.getAs[String]("modality") == "image")
    assert(imgs.nonEmpty)
    imgs.foreach { r =>
      val off = r.getAs[Long]("offset_in_stream")
      assert(r.getAs[Long]("n_tok") == imgTok)
      assert(off % imgTok == 0, s"unaligned image at $off")
      assert(off / cap == (off + imgTok - 1) / cap,
        s"image straddles pack boundary at $off")
    }
  }

  test("per-source stream is gapless from 0 (offsets tile exactly)") {
    rows.groupBy(_.getAs[String]("source")).foreach { case (src, g) =>
      val sorted = g.sortBy(_.getAs[Long]("offset_in_stream"))
      assert(sorted.head.getAs[Long]("offset_in_stream") == 0L, src)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("offset_in_stream") + a.getAs[Long]("n_tok")
            == b.getAs[Long]("offset_in_stream"),
            s"$src: gap/overlap after item ${a.getAs[Long]("doc_id")}/${a.getAs[Int]("item_idx")}")
        case _ =>
      }
    }
  }

  test("no pack is charged more than its capacity") {
    // exact occupancy: each item's overlap with every pack window it
    // touches (text may straddle; that split is the point of packing)
    val occ = scala.collection.mutable.Map.empty[(String, Long), Long]
    rows.foreach { r =>
      val off = r.getAs[Long]("offset_in_stream")
      val end = off + r.getAs[Long]("n_tok")
      var ch = off / cap
      while (ch * cap < end) {
        val part = math.min(end, (ch + 1) * cap) - math.max(off, ch * cap)
        val k = (r.getAs[String]("source"), ch)
        occ(k) = occ.getOrElse(k, 0L) + part
        ch += 1
      }
      // chunk_id is the item's STARTING pack
      assert(r.getAs[Long]("chunk_id") == off / cap)
    }
    assert(occ.nonEmpty)
    assert(occ.values.max <= cap, s"pack overflow: ${occ.maxBy(_._2)}")
    // every pack except each source's last is filled EXACTLY
    occ.groupBy(_._1._1).foreach { case (_, packs) =>
      val lastCh = packs.keys.map(_._2).max
      packs.filter(_._1._2 < lastCh).values.foreach(v => assert(v == cap))
    }
  }

  test("non-divisor modality cost (imgTok=48, capacity=2048): the " +
       "reserved-tail closed form keeps every image whole") {
    // usable = floor(2048/48)*48 = 2016 content tokens per pack; the
    // 32-token physical tail of each pack is reserved pad. Same
    // invariants as the divisor case, against the usable boundary.
    val tok = 48L
    val usable = (2048L / tok) * tok
    val nd = graft.queries.MultimodalQ
      .interleavedPacking(spark, sf, imgTok = tok.toInt, capacity = 2048)
      .collect()
    assert(nd.nonEmpty)
    val imgs = nd.filter(_.getAs[String]("modality") == "image")
    assert(imgs.nonEmpty)
    imgs.foreach { r =>
      val off = r.getAs[Long]("offset_in_stream")
      assert(r.getAs[Long]("n_tok") == tok)
      assert(off % tok == 0, s"unaligned image at $off")
      assert(off / usable == (off + tok - 1) / usable,
        s"image straddles the usable pack boundary at $off")
    }
    // occupancy: no pack carries more than `usable` content tokens, and
    // every non-final pack is filled exactly
    val occ = scala.collection.mutable.Map.empty[(String, Long), Long]
    nd.foreach { r =>
      val off = r.getAs[Long]("offset_in_stream")
      val end = off + r.getAs[Long]("n_tok")
      var ch = off / usable
      while (ch * usable < end) {
        val part = math.min(end, (ch + 1) * usable) - math.max(off, ch * usable)
        val k = (r.getAs[String]("source"), ch)
        occ(k) = occ.getOrElse(k, 0L) + part
        ch += 1
      }
      assert(r.getAs[Long]("chunk_id") == off / usable)
    }
    assert(occ.values.max <= usable)
    occ.groupBy(_._1._1).foreach { case (_, packs) =>
      val lastCh = packs.keys.map(_._2).max
      packs.filter(_._1._2 < lastCh).values.foreach(v => assert(v == usable))
    }
    // a capacity that cannot fit one image slot is refused loudly
    val e = intercept[IllegalArgumentException] {
      graft.queries.MultimodalQ
        .interleavedPacking(spark, sf, imgTok = 3000, capacity = 2048)
    }
    assert(e.getMessage.contains("cannot fit one 3000-token image slot"))
  }

  test("modality costs are charged exactly") {
    val perDocTok = Tables(spark, sf).documents
      .select(col("doc_id"),
        graft.text.TextMetrics.bpeTokenCount(col("text")).cast("long").as("t"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val payloads = graft.multimodal.Multimodal.attachPayload(
      Tables(spark, sf).documents, "doc_id", "text")
    val perDocFrames = graft.multimodal.Multimodal
      .videoFrames(payloads, spark, frameBytes = 32, stride = 3)
      .groupBy("doc_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.keySet == perDocTok.keySet)
    byDoc.foreach { case (id, items) =>
      val text = items.filter(_.getAs[String]("modality") == "text")
      assert(text.length == 1 && text.head.getAs[Long]("n_tok") == perDocTok(id))
      val imgs = items.filter(_.getAs[String]("modality") == "image")
      assert(imgs.length.toLong == perDocFrames(id),
        s"doc $id charged ${imgs.length} images, has ${perDocFrames(id)} frames")
      val pads = items.filter(_.getAs[String]("modality") == "pad")
      val cost = perDocTok(id) + perDocFrames(id) * imgTok
      if (cost % imgTok == 0) assert(pads.isEmpty, s"doc $id padded needlessly")
      else {
        assert(pads.length == 1)
        assert(pads.head.getAs[Long]("n_tok") == imgTok - cost % imgTok)
      }
      // frames first, then text, then pad — image starts stay aligned
      val idxByMod = items.sortBy(_.getAs[Long]("offset_in_stream"))
        .map(_.getAs[String]("modality")).toSeq
      assert(idxByMod == idxByMod.sortBy(Seq("image", "text", "pad").indexOf(_)))
    }
  }

  test("streaming twin over id-ordered drops converges to the batch " +
       "packing: identical item rows, totals registry == per-source sums") {
    import org.apache.spark.sql.streaming.Trigger
    val stage = java.nio.file.Files.createTempDirectory("pack-stage").toString
    for ((lo, hi) <- Seq((0L, 100L), (100L, 210L), (210L, Long.MaxValue))) {
      Tables(spark, sf).documents
        .filter(col("doc_id") >= lo && col("doc_id") < hi)
        .repartition(1).write.mode("append").parquet(stage)
      Thread.sleep(1100)
    }
    val tmp = java.nio.file.Files.createTempDirectory("pack-out").toString
    val q = graft.streaming.DocStreams.packingStream(
        graft.streaming.DocStreams.readDocumentStream(
          spark, stage, maxFilesPerTrigger = Some(1)),
        totalsDir = s"$tmp/totals", itemsDir = s"$tmp/items")
      .option("checkpointLocation", s"$tmp/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(q.recentProgress.length >= 3, "expected a multi-batch run")

    def key(rs: Array[org.apache.spark.sql.Row]) = rs.map(r =>
      (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[Int]("item_idx"), r.getAs[String]("modality"),
        r.getAs[Long]("n_tok"), r.getAs[Long]("offset_in_stream"),
        r.getAs[Long]("chunk_id"))).toSeq.sorted
    val streamed = key(
      graft.streaming.RolledSink.read(spark, s"$tmp/items").collect())
    assert(streamed == key(rows), "streamed items diverged from batch m15")

    // the totals registry's per-source sums equal the batch stream lengths
    val totals = spark.read.parquet(s"$tmp/totals")
      .groupBy("source").agg(sum(col("delta")).as("t")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = rows.groupBy(_.getAs[String]("source")).view
      .mapValues(_.map(_.getAs[Long]("n_tok")).sum).toMap
    assert(totals == expected, "totals registry diverged from stream lengths")
  }
}
