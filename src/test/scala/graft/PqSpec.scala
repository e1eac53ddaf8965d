package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.similarity.{KMeansExact, Pq}

class PqSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private val dims = 8
  private val m = 4 // subdim 2
  private val k = 4

  // 12 deterministic vectors: ids 0..3 double as the seed codewords
  private val emb = (0L until 12L).map { id =>
    (id, Array.tabulate(dims)(d => ((id * 7 + d * 3) % 11).toFloat / 10f - 0.5f))
  }.toDF("id", "vec")

  private def cb = Pq.seedCodebook(emb, dims, m, k)

  /** Local BigInt reference twin: quantize, slice, argmin, ADC. */
  private def local(): (Map[(Long, Int), (Int, Long)], Map[(Long, Long), Long]) = {
    val q = (0L until 12L).map { id =>
      id -> Array.tabulate(dims) { d =>
        val x = ((id * 7 + d * 3) % 11).toFloat / 10f - 0.5f
        BigDecimal(x.toDouble * 1024)
          .setScale(0, BigDecimal.RoundingMode.HALF_EVEN).toLong
      }
    }.toMap
    val subdim = dims / m
    def sub(v: Array[Long], s: Int) = v.slice(s * subdim, s * subdim + subdim)
    def sq(a: Array[Long], b: Array[Long]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val enc = (for (id <- 0L until 12L; s <- 0 until m) yield {
      val best = (0 until k)
        .map(c => (sq(sub(q(id), s), sub(q(c.toLong), s)), c)).min
      (id, s) -> (best._2, best._1)
    }).toMap
    val adc = (for (qid <- 0L until 3L; id <- 0L until 12L if id != qid) yield {
      (qid, id) -> (0 until m).map { s =>
        val code = enc((id, s))._1
        sq(sub(q(qid), s), sub(q(code.toLong), s))
      }.sum
    }).toMap
    (enc, adc)
  }

  test("seed vectors encode to their own codes with zero reconstruction error") {
    val got = Pq.encode(emb, cb, dims, m)
      .filter(col("vec_id") < k)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.length == k)
    got.foreach { case (id, codes, err) =>
      assert(codes == Seq.fill(m)(id.toString).mkString("-"), s"id $id")
      assert(err == 0L, s"id $id")
    }
  }

  test("per-sub assignment and ADC equal the local integer reference") {
    val (encRef, adcRef) = local()
    val enc = Pq.encodePerSub(emb, cb, dims, m)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> (r.getInt(2), r.getLong(3)))
      .toMap
    assert(enc == encRef)
    val adc = Pq.adcTopK(emb, cb, dims, m, nQueries = 3, topK = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(adc == adcRef)
  }

  test("ADC ranks are dense per query, tie-broken by vec id, self excluded") {
    val rows = Pq.adcTopK(emb, cb, dims, m, nQueries = 3, topK = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(rows.groupBy(_._1).forall { case (_, rs) =>
      rs.sortBy(_._4).map(_._4).toSeq == (1 to rs.length) &&
        rs.sortBy(_._4).map(r => (r._3, r._2)).toSeq ==
          rs.map(r => (r._3, r._2)).sortBy(identity).toSeq
    })
    assert(!rows.exists(r => r._1 == r._2))
  }

  test("encode/search plans: literal-model codegen'd encode, no cartesian, " +
       "no shuffled vectors") {
    // encode is a pure map since r15 (PqEncodeVec against the collected
    // codebook): no join of any kind, no aggregate, no exchange
    val pe = Pq.encode(emb, cb, dims, m).queryExecution.executedPlan.toString
    // over this spec's LOCAL fixture the optimizer constant-folds the
    // whole map into a LocalTableScan — the strongest possible form of
    // "no distributed work"; over a parquet scan the expression shows
    assert(pe.contains("pqencodevec") || pe.contains("LocalTableScan"), pe)
    assert(!pe.contains("Join") && !pe.contains("Exchange") &&
      !pe.contains("Aggregate"), "encode must be a pure map:\n" + pe)
    // search still joins the broadcast distance table against the codes
    val ps = Pq.adcTopK(emb, cb, dims, m, 3, 10)
      .queryExecution.executedPlan.toString
    assert(ps.contains("pqencodevec"), ps)
    assert(ps.contains("BroadcastHashJoin"), ps)
    assert(!ps.contains("CartesianProduct"), ps)
    assert(!ps.contains("SortMergeJoin"), "corpus-side shuffle join:\n" + ps)
  }

  test("quantization agrees with KMeansExact.quantize on the same input") {
    val a = Pq.quantSubvectors(emb, dims, m)
      .groupBy("id").agg(flatten(sort_array(collect_list(struct(col("sub"),
        col("subq"))).cast("array<struct<sub:int,subq:array<bigint>>>"))
        .getField("subq")).as("q2"))
    val b = KMeansExact.quantize(emb)
    val j = a.join(b, Seq("id"))
      .filter(not(col("q2") === col("q"))).count()
    assert(j == 0L)
  }
}
