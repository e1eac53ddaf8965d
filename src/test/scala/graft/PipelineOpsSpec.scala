package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{AsOfJoin, ConnectedComponents, RangeJoin, Sampling}

/** Contract tests for the training-pipeline operators (as-of join, range
  * join, connected components, deterministic splits) against brute-force
  * formulations on data small enough to enumerate. */
class PipelineOpsSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  // ---- AsOfJoin ----

  private val trades = Seq(
    (1L, 100L, "t1"), (1L, 200L, "t2"), (1L, 300L, "t3"),
    (2L, 150L, "t4"), (3L, 50L, "t5")).toDF("k", "l_ts", "trade")
  private val quotes = Seq(
    (1L, 90L, 1.0), (1L, 200L, 2.0), (1L, 250L, 3.0),
    (2L, 160L, 4.0)).toDF("k", "r_ts", "px")

  test("asof backward: greatest r_ts <= l_ts per key, inclusive, null when none") {
    val got = AsOfJoin.backward(trades, quotes, Seq("k"), "l_ts", "r_ts")
      .select("trade", "r_ts", "px").as[(String, Option[Long], Option[Double])]
      .collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(got("t1") == ((Some(90L), Some(1.0))))   // 90 <= 100
    assert(got("t2") == ((Some(200L), Some(2.0))))  // tie: 200 <= 200 matches
    assert(got("t3") == ((Some(250L), Some(3.0))))
    assert(got("t4") == ((None, None)))             // only quote at 160 > 150
    assert(got("t5") == ((None, None)))             // key 3 has no quotes
  }

  test("asof forward: smallest r_ts >= l_ts; tolerance prunes far matches") {
    val got = AsOfJoin.forward(trades, quotes, Seq("k"), "l_ts", "r_ts")
      .select("trade", "r_ts").as[(String, Option[Long])].collect().toMap
    assert(got("t1") == Some(200L))
    assert(got("t2") == Some(200L)) // inclusive on ties
    assert(got("t3") == None)       // nothing at or after 300
    val tol = AsOfJoin.backward(trades, quotes, Seq("k"), "l_ts", "r_ts",
        tolerance = Some(10L))
      .select("trade", "r_ts").as[(String, Option[Long])].collect().toMap
    assert(tol("t1") == Some(90L))  // gap 10 <= 10
    assert(tol("t3") == None)       // gap 50 > 10 nulled out
  }

  test("asof matches the brute-force theta-join on random data") {
    val l = (1 to 300).map(i => ((i % 7).toLong, (i * 37 % 1000).toLong, i))
      .toDF("k", "l_ts", "lid")
    val r = (1 to 200).map(i => ((i % 5).toLong, (i * 53 % 1000).toLong, i * 1.5))
      .toDF("k", "r_ts", "payload")
      // the carried row on (k, r_ts) ties is sort-order dependent: dedupe
      // per the operator contract
      .groupBy("k", "r_ts").agg(max("payload").as("payload"))
    val got = AsOfJoin.backward(l, r, Seq("k"), "l_ts", "r_ts")
    val brute = l.join(r.withColumnRenamed("k", "rk"),
        col("k") === col("rk") && col("r_ts") <= col("l_ts"), "left")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("k", "l_ts", "lid")
          .orderBy(col("r_ts").desc_nulls_last)))
      .filter(col("rn") === 1)
      .select("k", "l_ts", "lid", "r_ts", "payload")
    assert(got.count() == l.count())
    assert(got.except(brute).count() == 0 && brute.except(got).count() == 0)
  }

  // ---- RangeJoin ----

  test("bucketized range join equals the cross-join filter; left keeps empties") {
    val iv = (1 to 50).map(i => (i.toLong, (i * 97 % 500).toLong))
      .map { case (id, s) => (id, s, s + (id * 13 % 80)) }
      .toDF("iv_id", "s", "e")
    val pts = (1 to 200).map(i => (i.toLong, (i * 31 % 600).toLong)).toDF("p_id", "p")
    val got = RangeJoin.pointsInIntervals(iv, pts, "s", "e", "p", bucketWidth = 80L)
    val brute = iv.crossJoin(pts).filter(col("p") >= col("s") && col("p") <= col("e"))
    assert(got.count() == brute.count())
    assert(got.except(brute).count() == 0 && brute.except(got).count() == 0)
    val left = RangeJoin.pointsInIntervalsLeft(iv, pts, "s", "e", "p", 80L)
    assert(left.select("iv_id").distinct().count() == 50)
    assert(left.filter(col("p_id").isNull).count() ==
      50 - brute.select("iv_id").distinct().count())
  }

  test("asof: null keys and null timestamps never match (join semantics)") {
    val l = Seq((Option(1L), Option(100L), "ok"), (Option.empty[Long], Option(100L), "nullkey"),
      (Option(1L), Option.empty[Long], "nullts")).toDF("k", "l_ts", "trade")
    val r = Seq((Option(1L), Option(90L), 1.0), (Option.empty[Long], Option(50L), 9.0),
      (Option(1L), Option.empty[Long], 8.0)).toDF("k", "r_ts", "px")
    val got = AsOfJoin.backward(l, r, Seq("k"), "l_ts", "r_ts")
      .select("trade", "px").as[(String, Option[Double])].collect().toMap
    assert(got("ok") == Some(1.0))     // normal match unaffected
    assert(got("nullkey") == None)     // null key matches nothing, row survives
    assert(got("nullts") == None)      // null time matches nothing
  }

  test("range join drops null-bound intervals instead of raising; left keeps them unmatched") {
    val iv = Seq((1L, Option(10L), Option(20L)), (2L, Option.empty[Long], Option(20L)),
      (3L, Option(10L), Option.empty[Long])).toDF("iv_id", "s", "e")
    val pts = Seq((1L, 15L)).toDF("p_id", "p")
    val inner = RangeJoin.pointsInIntervals(iv, pts, "s", "e", "p", 100L)
    assert(inner.select("iv_id").as[Long].collect().toSeq == Seq(1L))
    val left = RangeJoin.pointsInIntervalsLeft(iv, pts, "s", "e", "p", 100L)
    assert(left.count() == 3)
    assert(left.filter(col("p_id").isNull).select("iv_id").as[Long]
      .collect().toSet == Set(2L, 3L))
  }

  test("left range join is exact when intervals carry null attribute columns") {
    val iv = Seq((1L, 10L, 20L, Option("a")), (2L, 10L, 20L, Option.empty[String]),
      (3L, 400L, 420L, Option.empty[String])).toDF("iv_id", "s", "e", "label")
    val pts = Seq((1L, 15L)).toDF("p_id", "p")
    val left = RangeJoin.pointsInIntervalsLeft(iv, pts, "s", "e", "p", 100L)
    // interval 2 matched (despite its null label: the anti-join must be
    // null-safe); interval 3 is the only unmatched one
    assert(left.count() == 3)
    assert(left.filter(col("p_id").isNull).select("iv_id").as[Long]
      .collect().toSeq == Seq(3L))
  }

  test("range join refuses intervals wider than the bucket") {
    val iv = Seq((1L, 0L, 200L)).toDF("iv_id", "s", "e")
    val pts = Seq((1L, 10L)).toDF("p_id", "p")
    val ex = intercept[Exception] {
      RangeJoin.pointsInIntervals(iv, pts, "s", "e", "p", bucketWidth = 100L)
        .collect()
    }
    assert(ex.getMessage != null)
  }

  // ---- ConnectedComponents ----

  test("interval overlap join: exact vs naive cross join, dedup across shared buckets") {
    import graft.ops.RangeJoin
    // A=[5,15] and B=[8,18] share BOTH buckets {0,1} at width 10 — without
    // the groupBy dedup the pair would emit twice
    val a = Seq((1L, 5L, 15L), (2L, 95L, 105L), (3L, 200L, 205L), (4L, 300L, 308L))
      .toDF("aid", "as", "ae")
    val b = Seq((10L, 8L, 18L), (20L, 100L, 110L), (30L, 206L, 214L), (40L, 320L, 330L))
      .toDF("bid", "bs", "be")
    val got = RangeJoin.intervalsOverlap(a, b, "aid", "as", "ae",
        "bid", "bs", "be", bucketWidth = 10)
      .select("aid", "bid", "overlap").as[(Long, Long, Long)].collect().toSet
    val naive = a.crossJoin(b)
      .filter(col("as") <= col("be") && col("bs") <= col("ae"))
      .select(col("aid"), col("bid"),
        (least(col("ae"), col("be")) - greatest(col("as"), col("bs"))).as("ov"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == naive)
    assert(got == Set((1L, 10L, 7L), (2L, 20L, 5L)))
    // no duplicate pair rows
    val rows = RangeJoin.intervalsOverlap(a, b, "aid", "as", "ae",
      "bid", "bs", "be", bucketWidth = 10).collect()
    assert(rows.length == rows.map(r => (r.getLong(0), r.getLong(1))).distinct.length)
  }

  test("connected components: min-label clusters on a known graph") {
    // components: {1,2,3,4} (path), {5,6} (edge), {7,8,9} (triangle)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (5L, 6L),
      (7L, 8L), (8L, 9L), (7L, 9L)).toDF("a", "b")
    val got = ConnectedComponents.clusters(edges, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 5L, 6L -> 5L, 7L -> 7L, 8L -> 7L, 9L -> 7L))
  }

  test("connected components: long path needs multiple rounds and converges") {
    val n = 33
    val edges = (1 until n).map(i => (i.toLong + 1, i.toLong)).toDF("a", "b")
    // maxDriverEdges = 0 forces the distributed pointer-jumping path
    val got = ConnectedComponents.clusters(edges, "a", "b", maxDriverEdges = 0)
      .as[(Long, Long)].collect()
    assert(got.length == n && got.forall(_._2 == 1L))
  }

  test("connected components: empty edge list yields empty labels, both paths") {
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(ConnectedComponents.clusters(empty, "a", "b").isEmpty)
    assert(ConnectedComponents.clusters(empty, "a", "b", maxDriverEdges = 0).isEmpty)
  }

  test("connected components: driver and distributed strategies agree exactly") {
    // a seeded mix of paths, cliques, stars and singles-by-edge
    val rnd = new scala.util.Random(7)
    val edges = (Seq.tabulate(200)(i => (rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
        ++ (0 until 10).map(i => (200L + i, 200L + (i + 1) % 10)))
      .filter { case (a, b) => a != b }
      .toDF("a", "b")
    val local = ConnectedComponents.clusters(edges, "a", "b")
      .as[(Long, Long)].collect().toMap
    val dist = ConnectedComponents.clusters(edges, "a", "b", maxDriverEdges = 0)
      .as[(Long, Long)].collect().toMap
    assert(local == dist)
    // labels are component minima under both strategies
    assert(local.forall { case (id, c) => c <= id && local(c) == c })
  }

  // ---- Sampling ----

  test("md5 split is deterministic, complete, and near the target fractions") {
    val df = (1 to 20000).map(_.toLong).toDF("id")
    val fr = Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)
    val counts = df.withColumn("s", Sampling.md5Split(col("id"), fr))
      .groupBy("s").count().as[(String, Long)].collect().toMap
    assert(counts.values.sum == 20000)
    assert(math.abs(counts("train") - 18000) < 400)
    assert(math.abs(counts("val") - 1000) < 150)
    assert(math.abs(counts("test") - 1000) < 150)
    // stable under re-evaluation and row order
    val again = df.orderBy(rand(7)).withColumn("s", Sampling.md5Split(col("id"), fr))
      .groupBy("s").count().as[(String, Long)].collect().toMap
    assert(again == counts)
  }

  test("trainOrder: a permutation — dense per-shard ranks, stable under " +
       "row order and appends, fresh under a new seed") {
    import spark.implicits._
    val df = (1L to 500L).toDF("id")
    val o1 = Sampling.trainOrder(df, col("id"), seed = 42L, nShards = 8)
      .as[(Long, Int, Int)].collect().sortBy(_._1)
    // every row lands exactly once; ranks are dense 1..n per shard
    assert(o1.length == 500 && o1.map(_._1).distinct.length == 500)
    o1.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1 to rows.length)) }
    // input order must not matter
    val o2 = Sampling.trainOrder(df.orderBy(rand(3)), col("id"), 42L, 8)
      .as[(Long, Int, Int)].collect().sortBy(_._1)
    assert(o2.toSeq == o1.toSeq)
    // appending rows never moves an existing row across shards or swaps
    // the relative order of two old rows in a shard
    val o3 = Sampling.trainOrder((1L to 600L).toDF("id"), col("id"), 42L, 8)
      .as[(Long, Int, Int)].collect().sortBy(_._1)
    val shard3 = o3.map(r => r._1 -> r._2).toMap
    assert(o1.forall { case (id, sh, _) => shard3(id) == sh })
    val rank3 = o3.map(r => r._1 -> r._3).toMap
    o1.groupBy(_._2).foreach { case (_, rows) =>
      val oldOrder = rows.sortBy(_._3).map(_._1).toSeq
      assert(oldOrder.map(rank3).sliding(2).forall(p => p.length < 2 || p(0) < p(1)))
    }
    // a different seed is a genuinely different permutation
    val o4 = Sampling.trainOrder(df, col("id"), seed = 43L, nShards = 8)
      .as[(Long, Int, Int)].collect().sortBy(_._1)
    assert(o4.toSeq != o1.toSeq)
  }
}
