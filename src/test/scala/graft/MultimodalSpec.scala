package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal

class MultimodalSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val payloads =
    Multimodal.attachPayload(Tables(spark, sf).documents, "doc_id", "text")

  test("decode stub is deterministic and consistent with byte length") {
    val metas = Multimodal.decodePartitions(payloads, spark).collect()
    assert(metas.nonEmpty)
    metas.foreach { m =>
      assert(m.width == (m.n_bytes % 1024) + 1)
      assert(m.height == (m.n_bytes / 1024) + 1)
      assert(m.channels == 3 && m.features.length == 8)
      assert(m.features.forall(f => f >= 0f && f <= 1f))
    }
  }

  test("frame sampling covers the payload with the right frame count") {
    val checked = Multimodal.sampleFrames(payloads, frameBytes = 64, stride = 2)
      .join(payloads, "doc_id")
      .select(size(col("frames")).as("n_frames"),
        (floor((length(col("payload")) - 1) / 128) + 1).as("expected"))
      .filter(col("n_frames") =!= col("expected"))
    assert(checked.count() == 0)
  }

  test("box-average resize tiles equal the closed-form floor means") {
    // render a known pattern, resize through the real codec, recompute
    // the expected tile means directly from the pattern formula
    val (seed, w, h, grid) = (77L, 11, 9, 4)
    val png = Multimodal.CompressedImage.renderPattern(seed, w, h)
    val tiles = Multimodal.CompressedImage.decodeTiles(1L, png, grid)
    assert(tiles.size == grid * grid)
    assert(tiles.map(_.n_px).sum == w.toLong * h)
    for (t <- tiles) {
      var (sr, sg, sb, n) = (0L, 0L, 0L, 0L)
      for (y <- 0 until h; x <- 0 until w
           if y * grid / h == t.tile_y && x * grid / w == t.tile_x) {
        sr += (3 * x + 7 * y + seed) % 256
        sg += (3 * x + 7 * y + 11 + seed) % 256
        sb += (3 * x + 7 * y + 22 + seed) % 256
        n += 1
      }
      assert(t.n_px == n)
      assert((t.r, t.g, t.b) == ((sr / n).toInt, (sg / n).toInt, (sb / n).toInt),
        s"tile (${t.tile_y},${t.tile_x})")
    }
  }

  test("resize: images smaller than the grid and hostile bytes yield no tiles") {
    val tiny = Multimodal.CompressedImage.renderPattern(5L, 3, 3)
    assert(Multimodal.CompressedImage.decodeTiles(1L, tiny, 4).isEmpty)
    assert(Multimodal.CompressedImage.decodeTiles(1L, Array[Byte](1, 2, 3), 4).isEmpty)
  }

  test("dhash: identical images hash equal; hostile bytes yield None") {
    val a = Multimodal.CompressedImage.dhash(1L,
      Multimodal.CompressedImage.renderPattern(42L, 10, 8))
    val b = Multimodal.CompressedImage.dhash(2L,
      Multimodal.CompressedImage.renderPattern(42L, 10, 8))
    assert(a.isDefined && a.map(_.dhash) == b.map(_.dhash))
    assert(Multimodal.CompressedImage.dhash(3L, Array[Byte](9, 9)).isEmpty)
    // 24-bit layout: no bit above 2*4*3
    assert((a.get.dhash >> 24) == 0L)
  }

  test("dhash is brightness-shift invariant while distinct shapes differ") {
    // +1 to every channel (seed+1... careful: seed shifts channels mod 256;
    // pick seeds where no channel wraps anywhere in the image so the
    // comparisons — hence the hash — are unchanged)
    val h1 = Multimodal.CompressedImage.dhash(1L,
      Multimodal.CompressedImage.renderPattern(10L, 8, 8)).get
    val h2 = Multimodal.CompressedImage.dhash(2L,
      Multimodal.CompressedImage.renderPattern(11L, 8, 8)).get
    assert(h1.dhash == h2.dhash, "small brightness shift must not flip bits")
    // a seed/size pushing channels past 255 wraps mid-image: the cliff
    // makes some adjacent-cell comparison non-increasing — a different
    // hash than the pure monotone gradient's
    val h3 = Multimodal.CompressedImage.dhash(3L,
      Multimodal.CompressedImage.renderPattern(200L, 16, 14)).get
    assert(java.lang.Long.bitCount(h1.dhash ^ h3.dhash) > 0)
  }

  test("hamming near-dup over dhashes finds exact and near pairs, banded") {
    import spark.implicits._
    val hashes = Seq(
      (1L, 0x000fffL), (2L, 0x000fffL),          // identical → hamming 0
      (3L, 0x000ffeL),                           // 1 bit off 1/2
      (4L, 0xf0f0f0L))                           // far from all
      .toDF("doc_id", "dhash")
    val pairs = graft.dedup.SimHash
      .hammingNearDuplicates(hashes, "doc_id", "dhash", maxDist = 3, chunks = 4,
        bits = 24)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(pairs == Set((1L, 2L, 0), (1L, 3L, 1), (2L, 3L, 1)))
  }

  test("short-hash banding: capped buckets keep pairs whose differing bits " +
       "straddle the low chunks (24-bit hashes, maxChunkBucket set)") {
    import spark.implicits._
    // 40 distractors + one near pair differing in bits 2 and 8. Banded
    // over bits=24 (4 chunks of 6), the pair agrees on populated chunks 2
    // and 3, each a small bucket, so it survives a tight hot-chunk cap.
    // (Banded as 4x16 over 64 bits, every 24-bit hash shares the all-zero
    // upper chunks — corpus-wide buckets a cap would drop, risking any
    // pair whose agreeing populated bits don't line up with chunk 0.)
    val base = 0x5a5a5aL
    val rows = Seq((1L, base), (2L, base ^ (1L << 2) ^ (1L << 8))) ++
      (10L until 50L).map(i => (i, (i * 0x9e37L) & 0xffffffL))
    val hashes = rows.toDF("doc_id", "dhash")
    val pairs = graft.dedup.SimHash
      .hammingNearDuplicates(hashes, "doc_id", "dhash", maxDist = 3, chunks = 4,
        maxChunkBucket = Some(8), bits = 24)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)),
      "pair with straddling bits must survive the hot-chunk cap under bits=24")
  }

  test("grouped banding equals per-row banding minus the hamming-0 pairs " +
       "(m12's distinct-hash-value rewrite)") {
    import spark.implicits._
    // heavy hash collapse (the perceptual-hash regime): 60 ids over 7
    // distinct values, several value pairs within hamming 1..2
    val vals = Seq(0x0fff00L, 0x0fff01L, 0x0fff03L, 0x0fff07L,
      0x00ff00L, 0xf000f0L, 0xf000f1L)
    val rows = (0L until 60L).map(i => (i, vals((i % 7).toInt)))
    val hashes = rows.toDF("doc_id", "dhash")
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val plain = norm(graft.dedup.SimHash
      .hammingNearDuplicates(hashes, "doc_id", "dhash", maxDist = 2, chunks = 4,
        bits = 24)
      .filter(org.apache.spark.sql.functions.col("hamming") >= 1))
    val grouped = norm(graft.dedup.SimHash
      .hammingNearDuplicatesGrouped(hashes, "doc_id", "dhash", maxDist = 2, chunks = 4,
        bits = 24))
    assert(grouped == plain)
    assert(plain.nonEmpty, "fixture must actually produce near pairs")
  }

  test("maxValueDocs caps the pair fan-out without changing cluster connectivity") {
    import spark.implicits._
    val vals = Seq(0x0fff00L, 0x0fff01L, 0x0fff03L, 0x0fff07L,
      0x00ff00L, 0xf000f0L, 0xf000f1L)
    val rows = (0L until 60L).map(i => (i, vals((i % 7).toInt)))
    val hashes = rows.toDF("doc_id", "dhash")
    def pairs(cap: Option[Int]) = graft.dedup.SimHash
      .hammingNearDuplicatesGrouped(hashes, "doc_id", "dhash",
        maxDist = 2, chunks = 4, bits = 24, maxValueDocs = cap)
    val unc = pairs(None).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val cap = pairs(Some(3)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // capped pairs are a subset, and each value contributes only its 3
    // lowest ids: 7 values here means no id >= 21 appears at all
    assert(cap.subsetOf(unc) && cap.nonEmpty && cap.size < unc.size)
    assert(cap.forall { case (a, b) => a < 21 && b < 21 })
    // connectivity is preserved: CC over (pairs ∪ per-value hamming-0
    // clusters) yields the same components either way — non-representative
    // members reach cross-value neighbors through their representatives
    val clusterEdges = hashes
      .withColumn("rep", org.apache.spark.sql.functions.min("doc_id")
        .over(org.apache.spark.sql.expressions.Window.partitionBy("dhash")))
      .select(col("doc_id").as("id_a"), col("rep").as("id_b"))
    def components(p: Set[(Long, Long)]) = {
      val edges = p.toSeq.toDF("id_a", "id_b").unionByName(clusterEdges)
      graft.ops.ConnectedComponents.clusters(edges, "id_a", "id_b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    assert(components(cap) == components(unc))
  }

  test("grouped == per-row banding on random hash tables (seeded property sweep)") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260814L)
    for (trial <- 0 until 6) {
      // random corpora across the collapse spectrum: few distinct values
      // (heavy collapse) through mostly-unique; random bit widths
      val bits = Seq(15, 24, 64)(trial % 3)
      val chunks = 4
      val nVals = Seq(5, 40, 300)(trial % 3)
      val nRows = 150 + rnd.nextInt(150)
      val mask = if (bits == 64) -1L else (1L << bits) - 1
      val vals = Array.fill(nVals)(rnd.nextLong() & mask)
      val rows = (0 until nRows).map { i =>
        val base = vals(rnd.nextInt(nVals))
        // half the rows get 0-3 random bit flips
        val h = if (rnd.nextBoolean()) base
          else (0 until rnd.nextInt(4)).foldLeft(base)((a, _) =>
            a ^ (1L << rnd.nextInt(bits)))
        (i.toLong, h & mask)
      }
      val df = rows.toDF("doc_id", "dhash")
      def norm(d: org.apache.spark.sql.DataFrame) =
        d.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val perRow = norm(graft.dedup.SimHash
        .hammingNearDuplicates(df, "doc_id", "dhash", maxDist = 2,
          chunks = chunks, bits = bits)
        .filter(org.apache.spark.sql.functions.col("hamming") >= 1))
      val grouped = norm(graft.dedup.SimHash
        .hammingNearDuplicatesGrouped(df, "doc_id", "dhash", maxDist = 2,
          chunks = chunks, bits = bits))
      assert(grouped == perRow, s"trial $trial (bits=$bits nVals=$nVals nRows=$nRows)")

      // incremental twins on a random split — including RE-CRAWLED ids
      // present on both sides with a perturbed hash (the self-pair
      // regression surface): grouped incremental must equal the per-row
      // incremental minus hamming-0, and emit no (id, id) rows
      val stored = df.filter($"doc_id" % 2 === 0)
      val fresh = df.filter($"doc_id" % 2 === 1).unionByName(
        stored.limit(5).select($"doc_id", $"dhash".bitwiseXOR(lit(1L)).as("dhash")))
      val incrPerRow = norm(graft.dedup.SimHash
        .incrementalHammingNearDuplicates(fresh, stored, "doc_id", "dhash",
          maxDist = 2, chunks = chunks, bits = bits)
        .filter(org.apache.spark.sql.functions.col("hamming") >= 1))
      val incrGrouped = norm(graft.dedup.SimHash
        .incrementalHammingNearDuplicatesGrouped(fresh, stored, "doc_id", "dhash",
          maxDist = 2, chunks = chunks, bits = bits))
      assert(incrGrouped.forall { case (a, b, _) => a != b },
        s"trial $trial: grouped incremental emitted a self-pair")
      assert(incrGrouped == incrPerRow, s"trial $trial incremental (bits=$bits)")
    }
  }

  test("audio fingerprint: deterministic, 15-bit, None on short/hostile input") {
    val wav = Multimodal.CompressedAudio.renderG711Wav(99L, 40, 8000, aLaw = false)
    val a = Multimodal.CompressedAudio.fingerprint(1L, wav)
    val b = Multimodal.CompressedAudio.fingerprint(2L, wav)
    assert(a.isDefined && a.map(_.fingerprint) == b.map(_.fingerprint))
    assert(a.get.n_samples == 40L && a.get.encoding == "ulaw")
    assert((a.get.fingerprint >> 15) == 0L, "16 frames → at most 15 bits")
    // fewer samples than frames: a slice would be empty → None
    val short = Multimodal.CompressedAudio.renderG711Wav(99L, 10, 8000, aLaw = true)
    assert(Multimodal.CompressedAudio.fingerprint(3L, short).isEmpty)
    assert(Multimodal.CompressedAudio.fingerprint(4L, Array[Byte](1, 2)).isEmpty)
  }

  test("audio fingerprint equals the formula-expanded energy profile") {
    // expand the stored bytes through the published µ-law formula (the
    // JDK converter is pinned to it in AudioCodecSpec) and recompute the
    // expected fingerprint independently of the decode path
    val (seed, ns, frames) = (123L, 53, 16)
    val wav = Multimodal.CompressedAudio.renderG711Wav(seed, ns, 8000, aLaw = false)
    def ulawExpand(bv: Int): Int = {
      val c = 255 - bv
      val sign = if ((c & 128) != 0) -1 else 1
      sign * (((((c & 15) << 3) + 132) << ((c >> 4) & 7)) - 132)
    }
    val energy = new Array[Long](frames)
    for (x <- 0 until ns)
      energy(x * frames / ns) += math.abs(ulawExpand(((5L * x + seed) % 256).toInt))
    var expected = 0L
    for (f <- 0 until frames - 1)
      if (energy(f + 1) > energy(f)) expected |= 1L << f
    assert(Multimodal.CompressedAudio.fingerprint(1L, wav).get.fingerprint == expected)
  }

  test("IMA ADPCM decodes a hand-computed golden stream exactly") {
    // seed 0x77 → first data byte 0x77: nibble0 = 7, nibble1 = 7.
    // sample0 = header predictor = 0 (step index 0).
    // nibble 7 at (pred 0, idx 0): step 7, diff = 0+7+3+1 = 11 → 11, idx 8
    // nibble 7 at (pred 11, idx 8): step 16, diff = 2+16+8+4 = 30 → 41, idx 16
    val wav = Multimodal.ImaAdpcm.renderWav(0x77L, 3, 8000)
    val d = Multimodal.ImaAdpcm.decode(1L, wav).get
    assert(d.encoding == "ima_adpcm" && d.n_samples == 3L)
    assert((d.sum_pcm, d.min_pcm, d.max_pcm) == (52L, 0, 41))
  }

  test("IMA ADPCM: deterministic; clamps hold; hostile input returns None") {
    val wav = Multimodal.ImaAdpcm.renderWav(999L, 60, 8000)
    val a = Multimodal.ImaAdpcm.decode(1L, wav)
    val b = Multimodal.ImaAdpcm.decode(2L, wav)
    assert(a.isDefined && a.map(x => (x.sum_pcm, x.min_pcm, x.max_pcm)) ==
      b.map(x => (x.sum_pcm, x.min_pcm, x.max_pcm)))
    assert(a.get.min_pcm >= -32768 && a.get.max_pcm <= 32767)
    assert(Multimodal.ImaAdpcm.decode(3L, Array[Byte](1, 2, 3)).isEmpty)
    // truncated: chop the data area
    assert(Multimodal.ImaAdpcm.decode(4L, wav.take(wav.length - 8)).isEmpty)
    // a G.711 wav is NOT IMA ADPCM (format tag mismatch routes to None)
    val g711 = Multimodal.CompressedAudio.renderG711Wav(5L, 30, 8000, aLaw = false)
    assert(Multimodal.ImaAdpcm.decode(5L, g711).isEmpty)
    // hostile 32-bit chunk length (>= 0x80000000): a naive Int advance
    // wraps negative and revisits the same offset forever — must be None,
    // and must TERMINATE (the fuzz corpus never reaches this path because
    // random bytes essentially never spell RIFF/WAVE)
    val evil = Multimodal.ImaAdpcm.renderWav(7L, 8, 8000).clone()
    evil(16) = 0xff.toByte; evil(17) = 0xff.toByte  // fmt chunk len = 0xFFFFFFFF
    evil(18) = 0xff.toByte; evil(19) = 0xff.toByte
    assert(Multimodal.ImaAdpcm.decode(7L, evil).isEmpty)
    val evil2 = Multimodal.ImaAdpcm.renderWav(7L, 8, 8000).clone()
    evil2(19) = 0x80.toByte                         // fmt chunk len = 0x80000000
    assert(Multimodal.ImaAdpcm.decode(8L, evil2).isEmpty)
  }

  test("MJPEG-in-AVI: container walk + per-frame ImageIO decode match the " +
       "closed-form sums exactly (Motion-PNG frames)") {
    val (seed, nf, w, h) = (77L, 4, 9, 7)
    val avi = Multimodal.MjpegAvi.renderAvi(seed, nf, w, h)
    val frames = Multimodal.MjpegAvi.decode(5L, avi)
    assert(frames.length == nf)
    for (fr <- frames) {
      assert(fr.doc_id == 5L && fr.width == w && fr.height == h)
      var (er, eg, eb) = (0L, 0L, 0L)
      for (y <- 0 until h; x <- 0 until w) {
        er += (3L * x + 7L * y + seed + 131L * fr.frame_idx) % 256
        eg += (3L * x + 7L * y + 11 + seed + 131L * fr.frame_idx) % 256
        eb += (3L * x + 7L * y + 22 + seed + 131L * fr.frame_idx) % 256
      }
      assert((fr.sum_r, fr.sum_g, fr.sum_b) == ((er, eg, eb)),
        s"frame ${fr.frame_idx}")
    }
  }

  test("MJPEG-in-AVI: real JPEG frames decode through the same seam " +
       "(lossy, so only shape is asserted)") {
    val avi = Multimodal.MjpegAvi.renderAvi(9L, 3, 16, 16, format = "jpeg")
    val frames = Multimodal.MjpegAvi.decode(1L, avi)
    assert(frames.length == 3)
    assert(frames.forall(f => f.width == 16 && f.height == 16))
  }

  test("MJPEG-in-AVI: hostile bytes — garbage, truncation, wrapped chunk " +
       "lengths — yield Nil or fewer frames, and always terminate") {
    val M = Multimodal.MjpegAvi
    assert(M.decode(1L, Array[Byte](1, 2, 3)).isEmpty)
    assert(M.decode(2L, "RIFFxxxxWAVE".getBytes("US-ASCII")).isEmpty)
    val avi = M.renderAvi(3L, 3, 8, 8)
    // truncated mid-movi: decodable prefix only, no crash
    assert(M.decode(3L, avi.take(avi.length / 2)).length < 3)
    // hostile 32-bit length on the hdrl LIST (offset 12..15 is 'LIST',
    // 16..19 its length): 0xFFFFFFFF must not wrap the walk
    val evil = avi.clone()
    evil(16) = 0xff.toByte; evil(17) = 0xff.toByte
    evil(18) = 0xff.toByte; evil(19) = 0xff.toByte
    assert(M.decode(4L, evil).isEmpty) // walk ends at the unfit chunk
    // a frame chunk ImageIO cannot read is skipped, not fatal: corrupt
    // the first movi frame's PNG magic
    val movi = {
      // find 'movi' then the first '00dc' payload start
      val s2 = new String(avi.map(_.toChar))
      s2.indexOf("00dc") + 8
    }
    val oneBad = avi.clone()
    oneBad(movi) = 'X'.toByte
    assert(M.decode(5L, oneBad).length == 2)
  }

  test("per-frame video dHash equals the still-image dHash of the same " +
       "pattern (shared core), and hostile bytes yield no hashes") {
    val (seed, w, h) = (21L, 10, 9)
    val avi = Multimodal.MjpegAvi.renderAvi(seed, 3, w, h)
    val fh = Multimodal.MjpegAvi.frameHashes(5L, avi)
    assert(fh.map(_.frame_idx) == Seq(0, 1, 2))
    for (f <- 0 until 3) {
      val still = Multimodal.CompressedImage.dhash(1L,
        Multimodal.CompressedImage.renderPattern(seed + 131L * f, w, h)).get
      assert(fh(f).dhash == still.dhash, s"frame $f")
    }
    assert(Multimodal.MjpegAvi.frameHashes(6L, Array[Byte](9, 9, 9)).isEmpty)
    // frames smaller than the grid are skipped, not fatal
    assert(Multimodal.MjpegAvi
      .frameHashes(7L, Multimodal.MjpegAvi.renderAvi(1L, 2, 3, 3)).isEmpty)
  }

  test("incremental hamming near-dup == full rerun restricted to new ids " +
       "(the incremental-dedup contract, image-hash modality)") {
    import spark.implicits._
    // real dHashes from rendered patterns; odd ids are today's batch
    val hashes = (1L to 120L).flatMap { id =>
      Multimodal.CompressedImage.dhash(id,
        Multimodal.CompressedImage.renderPattern(id % 37, (id % 13).toInt + 4,
          ((id / 13) % 11).toInt + 4))
    }.map(h => (h.doc_id, h.dhash)).toDF("doc_id", "dhash")
    val stored = hashes.filter($"doc_id" % 2 === 0)
    val fresh = hashes.filter($"doc_id" % 2 === 1)
    val incr = graft.dedup.SimHash
      .incrementalHammingNearDuplicates(fresh, stored, "doc_id", "dhash",
        maxDist = 3, chunks = 4, bits = 24)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val full = graft.dedup.SimHash
      .hammingNearDuplicates(hashes, "doc_id", "dhash", maxDist = 3, chunks = 4,
        bits = 24)
      .filter($"id_a" % 2 === 1 || $"id_b" % 2 === 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(incr.nonEmpty, "vacuous: fixture produced no near pairs")
    assert(incr == full)
    // grouped incremental == grouped batch over the union restricted to
    // new-touching pairs (the hamming >= 1 contract both grouped forms
    // share; hamming-0 is the registry equality join's linear surface).
    // The rendered fixture collapses to equal hashes only, so plant
    // 2-bit-flipped neighbors to make the >= 1 surface non-vacuous.
    val hashes2 = hashes.unionByName(
      hashes.filter($"doc_id" <= 6).select(($"doc_id" + 1000).as("doc_id"),
        $"dhash".bitwiseXOR(lit(3L)).as("dhash")))
    val stored2 = hashes2.filter($"doc_id" % 2 === 0)
    val fresh2 = hashes2.filter($"doc_id" % 2 === 1)
    val incrG = graft.dedup.SimHash
      .incrementalHammingNearDuplicatesGrouped(fresh2, stored2, "doc_id", "dhash",
        maxDist = 3, chunks = 4, bits = 24)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val fullG = graft.dedup.SimHash
      .hammingNearDuplicatesGrouped(hashes2, "doc_id", "dhash", maxDist = 3,
        chunks = 4, bits = 24)
      .filter($"id_a" % 2 === 1 || $"id_b" % 2 === 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(incrG.nonEmpty, "vacuous: planted neighbors produced no >=1 pairs")
    assert(incrG == fullG)
    val perRow2 = graft.dedup.SimHash
      .incrementalHammingNearDuplicates(fresh2, stored2, "doc_id", "dhash",
        maxDist = 3, chunks = 4, bits = 24)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(incrG == perRow2.filter(_._3 >= 1),
      "grouped incremental must equal the per-row incremental minus hamming-0")
  }

  test("resize + dhash stages run distributed over payload partitions") {
    import spark.implicits._
    val media = Tables(spark, sf).documents.limit(64)
      .select(col("doc_id"), length(col("text").cast("binary")).as("n"))
      .as[(Long, Long)]
      .map { case (id, n) =>
        (id, Multimodal.CompressedImage.renderPattern(n, (n % 13).toInt + 4,
          ((n / 13) % 11).toInt + 4)) }
      .toDF("doc_id", "payload").repartition(8)
    val nDocs = media.count()
    assert(Multimodal.resizePartitions(media, spark).count() == nDocs * 16)
    assert(Multimodal.dhashPartitions(media, spark).count() == nDocs)
  }
}

/** Real decoders: synthesized PCM WAV and binary PPM payloads must decode
  * to exactly-known metadata through the distributed decode stage. */
class RealDecodersSpec extends org.scalatest.funsuite.AnyFunSuite {
  import SparkTestSession._
  import graft.multimodal.Multimodal

  private def wavBytes(rate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes); bb.putInt(36 + dataLen); bb.put("WAVE".getBytes)
    bb.put("fmt ".getBytes); bb.putInt(16)
    bb.putShort(1); bb.putShort(1)            // PCM, mono
    bb.putInt(rate); bb.putInt(rate * 2)      // byte rate
    bb.putShort(2); bb.putShort(16)           // block align, bits
    bb.put("data".getBytes); bb.putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  private def ppmBytes(w: Int, h: Int, rgb: Array[(Int, Int, Int)]): Array[Byte] = {
    val header = s"P6\n# test comment\n$w $h\n255\n".getBytes("US-ASCII")
    val body = rgb.flatMap { case (r, g, b) => Seq(r.toByte, g.toByte, b.toByte) }
    header ++ body
  }

  test("PCM WAV decodes to exact sample stats through mapPartitions") {
    import spark.implicits._
    val square = Array.tabulate(200)(i => if (i % 2 == 0) 1000.toShort else (-1000).toShort)
    val silent = Array.fill(80)(0.toShort)
    val df = Seq((1L, wavBytes(8000, square)), (2L, wavBytes(16000, silent)),
      (3L, "not a wav at all".getBytes)).toDF("doc_id", "payload")
    val got = Multimodal.decodeWavPartitions(df, spark).collect()
      .map(m => m.doc_id -> m).toMap
    assert(got.keySet == Set(1L, 2L)) // the non-WAV row routes away, no crash
    val a = got(1L)
    assert(a.sample_rate == 8000 && a.channels == 1 && a.bits == 16)
    assert(a.n_samples == 200 && a.duration_ms == 25.0)
    assert(a.rms == 1000.0 && a.peak == 1000) // |square wave| is constant
    assert(got(2L).rms == 0.0 && got(2L).peak == 0 && got(2L).n_samples == 80)
  }

  test("binary PPM decodes to exact dimensions and channel means") {
    import spark.implicits._
    val px = Array((255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 255))
    val df = Seq((7L, ppmBytes(2, 2, px)), (8L, Array[Byte]('P', '1'))).toDF("doc_id", "payload")
    val got = Multimodal.decodePpmPartitions(df, spark).collect()
    assert(got.length == 1)
    val m = got.head
    assert(m.doc_id == 7L && m.width == 2 && m.height == 2 && m.maxval == 255)
    assert(m.mean_r == 127.5 && m.mean_g == 127.5 && m.mean_b == 127.5)
  }
}

/** Malformed untrusted bytes must yield None, never hang or kill a task. */
class DecoderRobustnessSpec extends org.scalatest.funsuite.AnyFunSuite {
  import SparkTestSession._
  import graft.multimodal.Multimodal.{CompressedImage, PcmWav, Ppm}

  test("WAV: hostile chunk sizes return None instead of looping or throwing") {
    val base = "RIFF".getBytes ++ Array.fill(4)(0.toByte) ++ "WAVE".getBytes
    // chunk size 0xFFFFFFF8 => signed -8 => zero-advance loop in the old code
    val evil = base ++ "fmt ".getBytes ++
      Array(0xf8, 0xff, 0xff, 0xff).map(_.toByte) ++ Array.fill(24)(1.toByte)
    assert(PcmWav.decode(1L, evil).isEmpty)
    // chunk size far past the buffer
    val past = base ++ "fmt ".getBytes ++
      Array(0xff, 0xff, 0x00, 0x00).map(_.toByte) ++ Array.fill(24)(1.toByte)
    assert(PcmWav.decode(2L, past).isEmpty)
    assert(PcmWav.decode(3L, Array[Byte]()).isEmpty)
  }

  test("WAV: a truncated file (data chunk declaring more than present) decodes partially") {
    val bb = java.nio.ByteBuffer.allocate(44 + 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes); bb.putInt(36 + 8); bb.put("WAVE".getBytes)
    bb.put("fmt ".getBytes); bb.putInt(16)
    bb.putShort(1); bb.putShort(1); bb.putInt(8000); bb.putInt(16000)
    bb.putShort(2); bb.putShort(16)
    bb.put("data".getBytes); bb.putInt(1000000) // declares 1 MB, holds 8 B
    Seq(100, -100, 100, -100).foreach(s => bb.putShort(s.toShort))
    val got = PcmWav.decode(9L, bb.array())
    assert(got.nonEmpty && got.get.n_samples == 4 && got.get.peak == 100)
  }

  test("PPM: overflowing header numbers return None instead of throwing") {
    assert(Ppm.decode(1L, "P6 99999999999 2 255 ".getBytes ++ Array.fill(12)(0.toByte)).isEmpty)
    assert(Ppm.decode(2L, "P6 2 2 255 ".getBytes).isEmpty) // truncated body
  }

  test("ImageIO: PNG round-trip is pixel-exact (sums match the pattern)") {
    val (seed, w, h) = (12345L, 17, 9)
    val png = CompressedImage.renderPattern(seed, w, h)
    val got = CompressedImage.decode(7L, png)
    assert(got.nonEmpty)
    var (sr, sg, sb) = (0L, 0L, 0L)
    for (y <- 0 until h; x <- 0 until w) {
      sr += (3L * x + 7L * y + seed) % 256
      sg += (3L * x + 7L * y + 11 + seed) % 256
      sb += (3L * x + 7L * y + 22 + seed) % 256
    }
    assert(got.get == Multimodal.DecodedImage(7L, w, h, sr, sg, sb))
  }

  test("ImageIO: JPEG decodes with exact dimensions and near pattern sums") {
    val (seed, w, h) = (999L, 32, 24)
    val jpg = CompressedImage.renderPattern(seed, w, h, format = "jpg")
    val got = CompressedImage.decode(8L, jpg).get
    assert(got.width == w && got.height == h)
    // lossy: channel MEANS must land within a small tolerance of the source
    var (sr, sg, sb) = (0L, 0L, 0L)
    for (y <- 0 until h; x <- 0 until w) {
      sr += (3L * x + 7L * y + seed) % 256
      sg += (3L * x + 7L * y + 11 + seed) % 256
      sb += (3L * x + 7L * y + 22 + seed) % 256
    }
    val n = (w * h).toDouble
    assert(math.abs(got.sum_r / n - sr / n) < 16.0)
    assert(math.abs(got.sum_g / n - sg / n) < 16.0)
    assert(math.abs(got.sum_b / n - sb / n) < 16.0)
  }

  test("ImageIO: hostile bytes return None, never throw") {
    val rnd = new scala.util.Random(4L)
    val garbage = Array.fill(4096)(rnd.nextInt().toByte)
    assert(CompressedImage.decode(1L, garbage).isEmpty)
    assert(CompressedImage.decode(2L, Array[Byte]()).isEmpty)
    // valid PNG magic, truncated body
    val png = CompressedImage.renderPattern(1L, 16, 16)
    assert(CompressedImage.decode(3L, png.take(24)).isEmpty)
    // a PNG whose IHDR claims a huge size but carries no data
    val evil = png.take(33) // magic + IHDR only
    assert(CompressedImage.decode(4L, evil).isEmpty)
    // text bytes (what the documents table would feed it raw)
    assert(CompressedImage.decode(5L, "not an image at all".getBytes).isEmpty)
  }

  test("image decode stage runs distributed over payload partitions") {
    val payloads = spark.range(20).toDF("doc_id")
      .select(col("doc_id"), udf((id: Long) =>
        CompressedImage.renderPattern(id, (id % 7).toInt + 3, (id % 5).toInt + 3))
        .apply(col("doc_id")).as("payload"))
    val decoded = Multimodal.decodeImagePartitions(payloads, spark).collect()
    assert(decoded.length == 20)
    assert(decoded.forall(d => d.width == (d.doc_id % 7) + 3 && d.height == (d.doc_id % 5) + 3))
  }

  test("m14 clip semantics: a re-cut video built from another's exact " +
       "frames matches at sequence level; a shuffled frame SET does not") {
    import spark.implicits._
    import Multimodal.MjpegAvi
    // A: 8 real frames; B: frames 2..5 of A verbatim (a genuine clip);
    // C: the same four frames as B but shuffled — set-identical to B,
    // sequence-broken. dHash is deliberately brightness-tolerant and
    // renderPattern's monotone gradient collapses to a handful of hash
    // values, so A's frames carry seeded RANDOM pixels (like real
    // footage, whose consecutive frames hash distinctly) encoded through
    // the genuine PNG path. Distinctness asserted as the precondition.
    val (w, h) = (16, 14)
    def noiseFrame(seed: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val rnd = new scala.util.Random(seed)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, rnd.nextInt() & 0xffffff)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val framesA = (0 until 8).map(f => noiseFrame(9000 + f))
    val aviA = MjpegAvi.wrapAvi(framesA, w, h)
    val hashesA = MjpegAvi.frameHashes(0L, aviA).map(_.dhash)
    assert(hashesA.length == 8 && hashesA.distinct.length == 8,
      s"fixture needs 8 distinct frame hashes, got $hashesA")
    val aviB = MjpegAvi.wrapAvi(framesA.slice(2, 6), w, h)
    val aviC = MjpegAvi.wrapAvi(
      Seq(framesA(5), framesA(3), framesA(2), framesA(4)), w, h)
    val hashes = Seq((0L, aviA), (1L, aviB), (2L, aviC))
      .flatMap { case (id, avi) =>
        MjpegAvi.frameHashes(id, avi).map(fh => (id, fh.frame_idx, fh.dhash)) }
      .toDF("doc_id", "frame_idx", "dhash")
    val pairs = graft.queries.MultimodalQ.clipPairs(hashes)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // B = 4-frame clip of A -> exactly the clip's 2 interior triples shared
    assert(pairs.get((0L, 1L)).contains(2L),
      s"clip not detected: $pairs")
    // C shares A's and B's frame SET but no 3-frame run -> no pair at all
    assert(!pairs.contains((0L, 2L)) && !pairs.contains((1L, 2L)),
      s"shuffled set wrongly matched as a sequence: $pairs")

    // hot-triple cap: replicate B's clip into many "videos" so its
    // triples become ubiquitous — at a tight cap those buckets drop
    // (boilerplate suppressed) while an uncapped run pairs them all
    val crowd = (10L until 20L).map(id => (id, aviB))
    val hashes2 = (Seq((0L, aviA), (1L, aviB)) ++ crowd)
      .flatMap { case (id, avi) =>
        MjpegAvi.frameHashes(id, avi).map(fh => (id, fh.frame_idx, fh.dhash)) }
      .toDF("doc_id", "frame_idx", "dhash")
    val uncapped = graft.queries.MultimodalQ.clipPairs(hashes2).count()
    val capped = graft.queries.MultimodalQ
      .clipPairs(hashes2, maxBucket = Some(4)).count()
    assert(uncapped > capped && capped == 0,
      s"cap should suppress the ubiquitous clip ($uncapped vs $capped)")
  }

  test("clipPairs == brute-force sequence reference on random hash " +
       "streams (seeded property sweep)") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260814L)
    for (trial <- 0 until 5) {
      // random corpora across the collapse spectrum: few distinct hash
      // values (heavy frame re-use) through mostly-unique streams
      val nVals = Seq(3, 10, 200)(trial % 3)
      val vals = Array.fill(nVals)(rnd.nextLong() & 0xffffffL)
      val nDocs = 20 + rnd.nextInt(20)
      val streams = (0L until nDocs.toLong).map { id =>
        id -> Vector.fill(2 + rnd.nextInt(8))(vals(rnd.nextInt(nVals)))
      }
      val hashes = streams.flatMap { case (id, hs) =>
        hs.zipWithIndex.map { case (h, i) => (id, i, h) } }
        .toDF("doc_id", "frame_idx", "dhash")
      val got = graft.queries.MultimodalQ.clipPairs(hashes)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      // reference: per doc, the SET of consecutive triples; pair count =
      // |intersection| for every unordered pair sharing >= 1 triple
      val tris = streams.map { case (id, hs) =>
        id -> hs.sliding(3).filter(_.size == 3).map(_.toList).toSet }.toMap
      val want = (for {
        a <- streams.map(_._1); b <- streams.map(_._1) if a < b
        n = (tris(a) intersect tris(b)).size if n > 0
      } yield (a, b) -> n.toLong).toMap
      assert(got == want, s"trial $trial diverged")
      assert(want.nonEmpty || nVals > 100, s"trial $trial vacuous")
    }
  }

  test("videoFrames routes AVI payloads through the real container walk " +
       "and stub payloads through byte slicing — one frame source") {
    import spark.implicits._
    import Multimodal.MjpegAvi
    // a mixed corpus: ids 0-9 genuine Motion-PNG AVIs (5 frames each,
    // ids 0/1 share a seed so their frames are byte-identical), ids
    // 100-109 stub text payloads
    val aviRows = (0L until 10L).map { id =>
      val seed = if (id <= 1) 7L else 100L + id
      (id, MjpegAvi.renderAvi(seed, nFrames = 5, w = 6, h = 5))
    }
    val stubRows = (100L until 110L).map(id =>
      (id, s"stub video payload number $id with some trailing bytes".getBytes("UTF-8")))
    val mixed = (aviRows ++ stubRows).toDF("doc_id", "payload")
    val frames = Multimodal.videoFrames(mixed, spark, frameBytes = 32, stride = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1),
        r.getAs[Array[Byte]](2).toSeq))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap

    // AVI arm: every 3rd of 5 chunks -> frames 0 and 3, the chunks'
    // exact encoded bytes (pinned against frameChunks run directly)
    for ((id, avi) <- aviRows) {
      val expect = MjpegAvi.frameChunks(id, avi, 3).map(_.frame.toSeq).toSeq
      assert(expect.length == 2, s"doc $id expected 2 sampled chunks")
      assert(frames(id) == expect, s"doc $id AVI frames diverged from the walk")
    }
    // same-seed AVIs share every sampled frame byte-for-byte (the m09
    // shared-frame contract now holds at REAL frame granularity)
    assert(frames(0L) == frames(1L))
    assert(frames(0L) != frames(2L))
    // the sampled chunks decode as images (genuine frame bytes, not slices)
    assert(frames(0L).forall(f =>
      Multimodal.CompressedImage.decode(0L, f.toArray).isDefined))

    // stub arm: identical to the pure column-op slicing
    val stubOnly = mixed.filter(col("doc_id") >= 100L)
    val sliced = Multimodal.sampleFrames(stubOnly, frameBytes = 32, stride = 3)
      .select(col("doc_id"), posexplode(col("frames")).as(Seq("i", "f")))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getAs[Array[Byte]](2).toSeq))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    for (id <- 100L until 110L)
      assert(frames(id) == sliced(id), s"doc $id stub frames diverged")
  }
}
