package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.similarity.IvfPq

class IvfPqSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private val dims = 8
  private val m = 4
  private val nCells = 4
  private val seedFrom = 4 // codebook = residuals of ids 4..19
  private val n = 30L      // ids 0 and 11 collide (period 11): exercises ties

  private def vec(id: Long) =
    Array.tabulate(dims)(d => ((id * 7 + d * 3) % 11).toFloat / 10f - 0.5f)

  private val emb = (0L until n).map(id => (id, vec(id))).toDF("id", "vec")
  private def cents = IvfPq.seedCentroids(emb, nCells)
  private def cb = IvfPq.residualCodebook(emb, cents, dims, m, seedFrom)

  // ---- local integer reference twin ----
  private val q: Map[Long, Array[Long]] = (0L until n).map { id =>
    id -> vec(id).map(x => BigDecimal(x.toDouble * 1024)
      .setScale(0, BigDecimal.RoundingMode.HALF_EVEN).toLong)
  }.toMap
  private val subdim = dims / m
  private def sub(v: Array[Long], s: Int) = v.slice(s * subdim, s * subdim + subdim)
  private def sq(a: Array[Long], b: Array[Long]) =
    a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
  private def diff(a: Array[Long], b: Array[Long]) =
    a.zip(b).map { case (x, y) => x - y }
  private val cellOf: Map[Long, Int] = q.keys.map { id =>
    id -> (0 until nCells).map(c => (sq(q(id), q(c.toLong)), c)).min._2
  }.toMap
  private def resid(id: Long) = diff(q(id), q(cellOf(id).toLong))
  private val cbRef: Map[(Int, Int), Array[Long]] = // (sub, code) -> cq
    (for (id <- seedFrom.toLong until seedFrom + 16L; s <- 0 until m)
      yield (s, (id - seedFrom).toInt) -> sub(resid(id), s)).toMap
  private val encRef: Map[(Long, Int), Int] = // (id, sub) -> code
    (for (id <- 0L until n; s <- 0 until m) yield (id, s) ->
      (0 until 16).map(c => (sq(sub(resid(id), s), cbRef((s, c))), c)).min._2).toMap
  private def probesOf(qid: Long) =
    (0 until nCells).map(c => (sq(q(qid), q(c.toLong)), c)).sorted.take(2).map(_._2)
  private val adcRef: Map[(Long, Long), (Int, Long)] = // (qid, id) -> (cell, adc)
    (for (qid <- 0L until 3L; id <- 0L until n
          if id != qid && probesOf(qid).contains(cellOf(id))) yield {
      val qr = diff(q(qid), q(cellOf(id).toLong))
      (qid, id) -> (cellOf(id),
        (0 until m).map(s => sq(sub(qr, s), cbRef((s, encRef((id, s)))))).sum)
    }).toMap

  test("encode equals the local reference (cells, residual codes)") {
    val got = IvfPq.encode(emb, cents, cb, dims, m).collect()
      .map(r => (r.getLong(0), r.getInt(2)) -> (r.getInt(1), r.getInt(3))).toMap
    assert(got == encRef.map { case ((id, s), c) => (id, s) -> (cellOf(id), c) })
  }

  test("search equals the local reference and stays inside probed cells") {
    val got = IvfPq.search(emb, cents, cb, dims, m,
        nQueries = 3, nProbe = 2, topK = 1000)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getInt(2), r.getLong(3))).toMap
    assert(got == adcRef)
  }

  test("ranks are dense, ordered by (adc, vec_id), self excluded") {
    val rows = IvfPq.search(emb, cents, cb, dims, m, 3, 2, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getInt(4)))
    rows.groupBy(_._1).foreach { case (qid, rs) =>
      val sorted = rs.sortBy(_._4)
      assert(sorted.map(_._4).toSeq == (1 to rs.length), s"qid $qid")
      assert(sorted.map(r => (r._3, r._2)).toSeq ==
        rs.map(r => (r._3, r._2)).sortBy(identity).toSeq, s"qid $qid")
    }
    assert(!rows.exists(r => r._1 == r._2))
  }

  test("stored cell-partitioned codes: probe reads ONLY the probed cells' " +
       "files (partition-pruned scan), result equal to the in-memory search") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_codes").toString
    IvfPq.writeCodes(IvfPq.encode(emb, cents, cb, dims, m), dir)
    val allCellDirs = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell=")).toSeq
    assert(allCellDirs.size == nCells, s"expected $nCells cell dirs")
    def filesUnder(d: java.io.File) =
      d.listFiles().count(_.getName.endsWith(".parquet"))
    val totalFiles = allCellDirs.map(filesUnder).sum

    val stored = IvfPq.searchStored(dir, emb, cents, cb, dims, m,
      nQueries = 1, nProbe = 2, topK = 5)
    val inMem = IvfPq.search(emb, cents, cb, dims, m,
      nQueries = 1, nProbe = 2, topK = 5)
    val key = (df: org.apache.spark.sql.DataFrame) => df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3), r.getInt(4)))
      .toSet
    assert(key(stored) == key(inMem))

    // the probe is a PHYSICAL partition-pruned read: the scan's numFiles
    // metric covers the probed cells only (probesOf(0) = 2 of 4 cells)
    def scans(pl: org.apache.spark.sql.execution.SparkPlan)
        : Seq[FileSourceScanExec] = pl match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case f: FileSourceScanExec => Seq(f)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        scans(q.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
        scans(r.child)
      case other =>
        (other.children ++ other.subqueries).flatMap(scans)
    }
    val codeScans = scans(stored.queryExecution.executedPlan)
      .filter(_.relation.location.rootPaths.exists(_.toString.contains("ivfpq_codes")))
    assert(codeScans.nonEmpty,
      "codes scan not found in plan: " + stored.queryExecution.executedPlan)
    val probed = probesOf(0L).toSet
    val expectedFiles = allCellDirs
      .filter(d => probed.contains(d.getName.stripPrefix("cell=").toInt))
      .map(filesUnder).sum
    val numFiles = codeScans.map(_.metrics("numFiles").value).sum
    assert(numFiles == expectedFiles && numFiles < totalFiles,
      s"scan read $numFiles files; expected $expectedFiles of $totalFiles")
  }

  test("e14 recall audit: md5-keyed sample bounds the truth side at any query count") {
    import SparkTestSession.sf
    // the registered default (64) does not bind at 3 queries — every qid
    // audited, sample size reported alongside recall
    val full = graft.queries.SimilarityQ.ivfRecall(spark, sf).collect()
    assert(full.length == 3)
    assert(full.forall(_.getAs[Long]("n_sampled") == 3L))
    // a binding cap keeps exactly the md5-order prefix of the query set:
    // md5("1") < md5("2") < md5("0") ascending, so top-2 audits {1, 2}
    val capped = graft.queries.SimilarityQ.ivfRecall(spark, sf, sampleQueries = 2).collect()
    assert(capped.map(_.getAs[Long]("qid")).toSet == Set(1L, 2L))
    assert(capped.forall(_.getAs[Long]("n_sampled") == 2L))
    // the sampled qids' rows are identical to the unsampled audit's —
    // sampling restricts WHICH queries are audited, never their recall
    def row(rs: Array[org.apache.spark.sql.Row], q: Long) =
      rs.find(_.getAs[Long]("qid") == q).get.toSeq.dropRight(1)
    for (q <- Seq(1L, 2L)) assert(row(capped, q) == row(full, q))
  }

  test("e15 incremental maintenance: stored-history + delta probe equals " +
       "the full rebuild's, history scan still partition-pruned") {
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_half").toString
    // history = even ids' codes on disk; delta = odd ids encoded against
    // the SAME frozen models (encode is per-row, so delta == rebuild's subset)
    IvfPq.writeCodes(
      IvfPq.encode(emb.filter(col("id") % 2 === 0), cents, cb, dims, m), dir)
    val delta = IvfPq.encode(emb.filter(col("id") % 2 === 1), cents, cb, dims, m)
    val merged = IvfPq.searchStoredWithDelta(dir, delta, emb, cents, cb,
      dims, m, nQueries = 3, nProbe = 2, topK = 10)
    val rebuilt = IvfPq.search(emb, cents, cb, dims, m,
      nQueries = 3, nProbe = 2, topK = 10)
    val key = (df: org.apache.spark.sql.DataFrame) => df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3), r.getInt(4)))
      .toSet
    assert(key(merged) == key(rebuilt))
    // the stored-history read keeps e10b's partition pruning: only the
    // probed cells' dirs are opened even with the delta unioned in
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def scans(pl: org.apache.spark.sql.execution.SparkPlan)
        : Seq[FileSourceScanExec] = pl match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case f: FileSourceScanExec => Seq(f)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        scans(q.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
        scans(r.child)
      case other =>
        (other.children ++ other.subqueries).flatMap(scans)
    }
    // prune gate on a single-query probe (2 of 4 cells), since three
    // queries' probe union can legitimately cover every cell
    val one = IvfPq.searchStoredWithDelta(dir, delta, emb, cents, cb,
      dims, m, nQueries = 1, nProbe = 2, topK = 5)
    one.collect()
    val probed = probesOf(0L).toSet
    val cellDirs = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell=")).toSeq
    def filesUnder(d: java.io.File) =
      d.listFiles().count(_.getName.endsWith(".parquet"))
    val expectedFiles = cellDirs
      .filter(d => probed.contains(d.getName.stripPrefix("cell=").toInt))
      .map(filesUnder).sum
    val totalFiles = cellDirs.map(filesUnder).sum
    val codeScans = scans(one.queryExecution.executedPlan)
      .filter(_.relation.location.rootPaths.exists(_.toString.contains("ivfpq_half")))
    assert(codeScans.nonEmpty)
    val numFiles = codeScans.map(_.metrics("numFiles").value).sum
    assert(numFiles == expectedFiles && numFiles < totalFiles,
      s"history scan read $numFiles files; expected $expectedFiles of $totalFiles")
  }

  test("plans: encode is a fused literal-model map; search broadcasts the " +
       "distance table; no sort-merge join, no cartesian") {
    // encode is a pure map since r15 (IvfPqEncodeVec against the
    // collected centroids + codebook): no join, no aggregate, no exchange
    val pe = IvfPq.encode(emb, cents, cb, dims, m)
      .queryExecution.executedPlan.toString
    assert(pe.contains("ivfpqencodevec"), pe)
    assert(!pe.contains("Join") && !pe.contains("Exchange") &&
      !pe.contains("Aggregate"), "encode must be a pure map:\n" + pe)
    val ps = IvfPq.search(emb, cents, cb, dims, m, 3, 2, 10)
      .queryExecution.executedPlan.toString
    assert(ps.contains("Broadcast"), ps)
    assert(!ps.contains("SortMergeJoin"), "corpus-side shuffle join:\n" + ps)
    assert(!ps.contains("CartesianProduct"), ps)
  }
}
