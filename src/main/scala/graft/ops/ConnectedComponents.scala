package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components over an undirected edge list — the step that turns
  * near-duplicate PAIRS (MinHash/SimHash/exact-Jaccard output) into
  * duplicate CLUSTERS so a curation pipeline can keep one canonical
  * document per group. Deterministic: every node is labeled with the
  * minimum node id in its component.
  *
  * Algorithm: min-label propagation with pointer jumping. Each round every
  * node takes the min of its own and its neighbors' labels (join +
  * groupBy on the node key), then follows its label TWO hops through the
  * label table (`l := l(l(l))`, two joins against the same persisted
  * table) — each jump shrinks the distance a min label still has to
  * travel, so rounds are O(log diameter) instead of O(diameter); dedup
  * graphs (near-cliques) converge in 2–3. Every round is lineage-truncated with
  * `localCheckpoint`: iterative plans otherwise grow exponentially (each
  * round references the previous twice) until the driver OOMs building the
  * plan string — the classic Spark iterative-algorithm trap.
  */
object ConnectedComponents {

  /** (id, cluster_id) for every node in `edges` (both endpoint columns);
    * cluster_id = min node id in the component. Long node ids.
    *
    * Strategy is RUNTIME-ADAPTIVE, the way AQE picks joins: the edge plan
    * is materialized once anyway (the iteration needs that), so its exact
    * cardinality is free — at or below `maxDriverEdges` the component
    * closure runs as driver-side union-find over one collect (a dedup
    * graph's edge list after LSH banding is tiny relative to the corpus;
    * paying 4–6 distributed rounds of scheduling floor to relabel a few
    * thousand pairs is pure overhead), above it the distributed
    * pointer-jumping loop below. Both paths are deterministic and agree
    * exactly (PipelineOpsSpec proves it on the same graphs). Driver memory
    * at the default 1M-edge cap, worst case 2M distinct nodes: the stream
    * itself is ~16 MB, the primitive open-addressed union-find map peaks
    * at 4M slots × 17 B ≈ 68 MB, and the boxed output tuples ~100 MB —
    * comfortably inside a default 1 GiB driver heap. A 100 TB all-corpus
    * pair set blows past the cap and takes the distributed path. */
  def clusters(edges: DataFrame, aCol: String, bCol: String,
               maxRounds: Int = 50, maxDriverEdges: Long = 1L << 20): DataFrame = {
    // materialize the (possibly expensive) edge plan ONCE before anything
    // references it twice — a lazy persist would race both branches into
    // recomputing it. localCheckpoint trades fault-tolerance for speed; a
    // production run on preemptible executors would use a reliable
    // checkpoint dir instead.
    val e0 = edges.select(col(aCol).as("src"), col(bCol).as("dst"))
      .localCheckpoint(true)
    if (e0.count() <= maxDriverEdges) clustersLocal(e0)
    else clustersDistributed(e0, maxRounds)
  }

  /** Primitive open-addressed long→long map (linear probing, ≤0.5 load,
    * power-of-two growth) — the union-find parent table. A boxed
    * java.util.HashMap costs ~48 B per entry in Long boxes + nodes; at the
    * edge cap that is hundreds of MB of driver heap for what two long
    * arrays hold in ~17 B/slot. */
  private final class LongLongMap(initialCapacity: Int) {
    private var cap = Integer.highestOneBit(math.max(16, initialCapacity * 2 - 1)) << 1
    private var keys = new Array[Long](cap)
    private var vals = new Array[Long](cap)
    private var used = new Array[Boolean](cap)
    private var n = 0
    def size: Int = n
    private def slot(k: Long): Int = {
      var h = k * -7046029254386353131L // 64-bit Murmur3 finalizer constant
      h ^= h >>> 32
      var i = (h & (cap - 1)).toInt
      while (used(i) && keys(i) != k) i = (i + 1) & (cap - 1)
      i
    }
    def apply(k: Long): Long = { val i = slot(k); if (used(i)) vals(i) else k }
    def put(k: Long, v: Long): Unit = {
      if ((n + 1) * 2 > cap) grow()
      val i = slot(k)
      if (!used(i)) { used(i) = true; keys(i) = k; n += 1 }
      vals(i) = v
    }
    private def grow(): Unit = {
      val ok = keys; val ov = vals; val ou = used
      cap <<= 1
      keys = new Array[Long](cap); vals = new Array[Long](cap)
      used = new Array[Boolean](cap)
      var j = 0
      while (j < ok.length) {
        if (ou(j)) { val i = slot(ok(j)); used(i) = true; keys(i) = ok(j); vals(i) = ov(j) }
        j += 1
      }
    }
    def foreachKey(f: Long => Unit): Unit = {
      var j = 0
      while (j < keys.length) { if (used(j)) f(keys(j)); j += 1 }
    }
  }

  /** Small-graph fast path: union-find with path compression, roots keyed
    * by MINIMUM id (union always attaches the larger root under the
    * smaller), so a root IS its component's cluster id. One Spark job in
    * (the collect), one distributed dataset out. Absent keys read as
    * self-parented, so only non-root links are ever stored. */
  private def clustersLocal(e0: DataFrame): DataFrame = {
    val spark = e0.sparkSession
    import spark.implicits._
    val parent = new LongLongMap(1 << 16)
    def find(x0: Long): Long = {
      var r = x0
      while (parent(r) != r) r = parent(r)
      var c = x0 // path compression: point the walked chain at the root
      while (parent(c) != r) { val nx = parent(c); parent.put(c, r); c = nx }
      r
    }
    // track every seen node (roots never appear as map keys)
    val seen = new LongLongMap(1 << 16)
    // ONE collect, not toLocalIterator: the iterator launches a job PER
    // PARTITION sequentially (32 jobs of scheduling floor for a few MB of
    // edges — measured ~0.5 s of pure overhead per call at bench scale);
    // the maxDriverEdges cap already bounds this array to ~16 MB of longs
    for ((a, b) <- e0.as[(Long, Long)].collect()) {
      seen.put(a, 0L); seen.put(b, 0L)
      val ra = find(a); val rb = find(b)
      if (ra != rb) parent.put(math.max(ra, rb), math.min(ra, rb))
    }
    val out = Array.newBuilder[(Long, Long)]
    out.sizeHint(seen.size)
    seen.foreachKey(id => out += ((id, find(id))))
    spark.createDataset(out.result().toSeq).toDF("id", "cluster_id")
  }

  private def clustersDistributed(e0: DataFrame, maxRounds: Int): DataFrame = {
    val sym = e0
      .unionByName(e0.select(col("dst").as("src"), col("src").as("dst")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("cluster_id", col("id"))
      .localCheckpoint(true)
    var round = 0
    var converged = false
    // convergence via the label-sum fixpoint: labels are per-node monotone
    // NON-INCREASING (min of self and neighbors, then a jump to an equal-
    // or-smaller label), so the total is strictly decreasing until the
    // fixpoint and equal exactly there — a scan-only aggregate.
    // decimal(38,0): at 10^11 nodes × 10^11 max id a long sum overflows.
    //
    // Job fusion (the q48/e05 per-round floor): the round runs as ONE Spark
    // job — neigh is a LAZY persist (referenced twice by the jump join;
    // block-level locking dedups the concurrent compute), next is a LAZY
    // localCheckpoint, and the sum action materializes both, truncates
    // next's lineage, and returns the fixpoint probe in the same pass.
    // The old eager-checkpoint formulation paid 3 jobs per round; measured
    // q48 3.1 -> 2.0 s at sf0.1 (e05 unchanged — pair generation dominates
    // it, not the rounds).
    var prevSum: java.math.BigDecimal = null
    var first = true
    while (!converged && round < maxRounds) {
      val neigh = labels.join(sym, col("id") === col("src"))
        .select(col("dst").as("id"), col("cluster_id"))
        .unionByName(labels)
        .groupBy("id").agg(min("cluster_id").as("cluster_id"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      // pointer jump, TWO hops per round: l := l(l(l)) — labels always
      // point inside their component and are monotone non-increasing, so
      // any number of jumps per round is safe; the second hop cuts the
      // round count from ~log2(diameter) to ~log3 for the price of one
      // extra join against the SAME persisted label table. Rounds are
      // where the cost sits at cluster scale (each is a full shuffle
      // barrier) and in contended local runs (each is a separate job
      // chain exposed to scheduling noise).
      val jumpTbl = neigh
        .select(col("id").as("cluster_id"), col("cluster_id").as("__jump"))
      def hop(labelTbl: DataFrame): DataFrame = labelTbl
        .join(jumpTbl, Seq("cluster_id"), "left")
        .select(col("id"), coalesce(col("__jump"), col("cluster_id")).as("cluster_id"))
      val next = hop(hop(neigh)).localCheckpoint(false)
      val s = next.agg(sum(col("cluster_id").cast("decimal(38,0)"))).head.getDecimal(0)
      // next's checkpoint blocks now hold the round result — neigh's cache
      // is dead weight (one cached table per round otherwise accumulates)
      neigh.unpersist(false)
      labels = next
      converged = !first && s == prevSum
      prevSum = s
      first = false
      round += 1
    }
    sym.unpersist()
    require(converged, s"connected components did not converge in $maxRounds rounds")
    labels
  }
}
