package graft.similarity

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorExpressions

/** IVF+PQ — the composed production ANN index (the FAISS IVFPQ shape):
  * a coarse quantizer routes each vector to a cell, PQ compresses the
  * RESIDUAL against the cell centroid (residuals are small → far less
  * quantization error than whole-vector PQ at the same code budget), and
  * a query scans only its `nProbe` nearest cells' code lists with a
  * per-cell asymmetric distance table.
  *
  * At 100 TB: the code lists are written bucketed by cell id, so a probe
  * is a partition-pruned scan of nProbe/k of the corpus reading m bytes
  * per vector — the only full-corpus passes are the one-time build. Both
  * build and search keep every model artifact (centroids, codebooks,
  * distance tables) broadcast.
  *
  * Arithmetic is the [[Pq]] contract: scale-1024 integer quantization,
  * exact integer squared distances (codegen'd [[graft.functions
  * .IntVecSqDist]]), argmin ties to the lower id — cross-engine exact,
  * so build AND search sit behind a full DuckDB oracle (e10).
  *
  * Coarse centroids here are the first `nCells` vectors and codebooks the
  * residuals of the next 16 (the e04 seeding convention); production
  * swaps both for [[KMeansExact.lloyd]] output — the operators take
  * centroids and codebooks as data.
  */
object IvfPq {

  /** Coarse centroids (cell, cellq) = quantized vectors with id < nCells. */
  def seedCentroids(emb: DataFrame, nCells: Int): DataFrame =
    KMeansExact.quantize(emb.filter(col("id") < nCells))
      .select(col("id").cast("int").as("cell"), col("q").as("cellq"))

  /** Cell assignment + integer residual: (id, cell, r). One corpus scan
    * against the broadcast centroids; argmin collapses map-side (ties to
    * the lower cell id; cellq rides in the min-struct unconsulted because
    * (d, cell) is already unique). */
  def assignResiduals(emb: DataFrame, cents: DataFrame): DataFrame =
    KMeansExact.quantize(emb)
      .crossJoin(broadcast(cents))
      .withColumn("d", VectorExpressions.intVecSqDist(col("q"), col("cellq")))
      .groupBy(col("id"))
      .agg(min(struct(col("d"), col("cell"), col("cellq"))).as("best"),
        first(col("q")).as("q"))
      .select(col("id"), col("best.cell").as("cell"),
        zip_with(col("q"), col("best.cellq"), (a, b) => a - b).as("r"))

  /** Residual PQ codebook: (sub, code, cq) from the residuals of the 16
    * vectors with seedFrom <= id < seedFrom + 16. seedFrom should skip the
    * centroid ids — centroid vectors have all-zero residuals. */
  def residualCodebook(emb: DataFrame, cents: DataFrame, dims: Int, m: Int,
                       seedFrom: Int): DataFrame =
    Pq.subspaceSplit(
        assignResiduals(
          emb.filter(col("id") >= seedFrom && col("id") < seedFrom + 16), cents),
        "r", dims, m, keep = Seq("id"))
      .select(col("sub"), (col("id") - seedFrom).cast("int").as("code"),
        col("subq").as("cq"))

  /** The stored index: (id, cell, sub, code) — m rows per vector, each
    * residual subvector snapped to its nearest codeword. Cell argmin,
    * residual, and per-sub codeword argmin are FUSED into one codegen'd
    * map against the literal models ([[graft.functions.IvfPqEncodeVec]];
    * centroids and codebook are k and m·k rows by contract, collected at
    * plan-build time like [[searchStored]]'s probe list) — r14's plans
    * showed the assignResiduals → subspaceSplit → join → min(struct)
    * chain paying two Sort + SortAggregate + Exchange rounds over the
    * exploded corpus per encode. */
  def encode(emb: DataFrame, cents: DataFrame, cb: DataFrame,
             dims: Int, m: Int): DataFrame = {
    val (cellIds, centVecs) =
      graft.functions.ModelArgmin.collectModel(cents, "cell", "cellq")
    val (codeIds, cbs) = graft.functions.ModelArgmin.collectCodebook(cb, m)
    KMeansExact.quantize(emb)
      .select(col("id"),
        explode(graft.functions.ModelArgmin.ivfPqEncodeVec(col("q"), cellIds,
          centVecs, dims / m, codeIds, cbs)).as("e"))
      .select(col("id"), col("e.cell").as("cell"), col("e.sub").as("sub"),
        col("e.code").as("code"))
  }

  /** ADC search over the probed cells only: for each query id < nQueries,
    * rank cells by exact distance, take the nProbe nearest, build the
    * per-cell residual distance table, and sum table lookups over the
    * stored codes of vectors IN those cells. Output one row per survivor:
    * (qid, vec_id, cell, adc, rk), rank ties to the lower vec id, self
    * excluded. The codes table joins a BROADCAST distance table on
    * (cell, sub, code) — unprobed cells never leave the scan. */
  def search(emb: DataFrame, cents: DataFrame, cb: DataFrame, dims: Int,
             m: Int, nQueries: Int, nProbe: Int, topK: Int): DataFrame =
    searchCodes(encode(emb, cents, cb, dims, m), emb, cents, cb, dims, m,
      nQueries, nProbe, topK)

  /** Write the stored index CELL-PARTITIONED — the physical layout the
    * scaladoc promises: one directory per coarse cell, so a probe list
    * becomes a partition filter and the scan reads nProbe/nCells of the
    * files (IvfPqSpec measures the pruned file count). At 100 TB, append
    * new days' codes into the same cell dirs. */
  def writeCodes(codes: DataFrame, dir: String): Unit =
    codes.write.mode("overwrite").partitionBy("cell").parquet(dir)

  /** ADC search probing a STORED cell-partitioned codes table. The probed
    * cell ids (at most nQueries x nProbe — a bounded driver-scale contract
    * point, like the model artifacts this index already broadcasts) become
    * a literal partition filter on the codes read, so unprobed cells'
    * files are never opened, let alone scanned. */
  def searchStored(codesDir: String, emb: DataFrame, cents: DataFrame,
                   cb: DataFrame, dims: Int, m: Int, nQueries: Int,
                   nProbe: Int, topK: Int): DataFrame = {
    val spark = emb.sparkSession
    val probedCells = probeCells(emb, cents, nQueries, nProbe)
      .select(col("cell")).distinct().collect().map(_.getInt(0)).sorted
    val codes = spark.read.parquet(codesDir)
      .filter(col("cell").isin(probedCells.map(_.asInstanceOf[Any]): _*))
      .select(col("id"), col("cell"), col("sub"), col("code"))
    searchCodes(codes, emb, cents, cb, dims, m, nQueries, nProbe, topK)
  }

  /** ADC search probing a STORED cell-partitioned codes table PLUS an
    * un-flushed delta — the steady state of a maintained index: history's
    * codes live cell-partitioned on disk (never re-encoded), today's
    * vectors arrive as `delta` (one [[encode]] pass against the FROZEN
    * centroids/codebook — encode is per-row against broadcast models, so
    * the delta's codes equal the codes a full rebuild would assign), and
    * the probe scans (pruned stored cells) ∪ (delta rows in probed
    * cells). Search output is therefore identical to [[searchStored]]
    * over the fully-rebuilt index — IvfPqSpec pins the equality, e15's
    * oracle (= e10's) pins it cell-exactly against DuckDB. At 100 TB the
    * delta is a day's crawl: flushing it is [[writeCodes]] in append mode
    * into the same cell dirs, and compaction is the registry's
    * file-count story, not a re-encode. */
  def searchStoredWithDelta(codesDir: String, delta: DataFrame,
                            emb: DataFrame, cents: DataFrame, cb: DataFrame,
                            dims: Int, m: Int, nQueries: Int,
                            nProbe: Int, topK: Int): DataFrame = {
    val spark = emb.sparkSession
    val probedCells = probeCells(emb, cents, nQueries, nProbe)
      .select(col("cell")).distinct().collect().map(_.getInt(0)).sorted
    val anyCells = probedCells.map(_.asInstanceOf[Any])
    val stored = spark.read.parquet(codesDir)
      .filter(col("cell").isin(anyCells: _*))
      .select(col("id"), col("cell"), col("sub"), col("code"))
    val merged = stored.unionByName(
      delta.filter(col("cell").isin(anyCells: _*))
        .select(col("id"), col("cell"), col("sub"), col("code")))
    searchCodes(merged, emb, cents, cb, dims, m, nQueries, nProbe, topK)
  }

  /** (qid, cell, qr): each query's nProbe nearest cells + its residual
    * against each probed centroid. */
  private def probeCells(emb: DataFrame, cents: DataFrame, nQueries: Int,
                         nProbe: Int): DataFrame =
    KMeansExact.quantize(emb.filter(col("id") < nQueries))
      .crossJoin(broadcast(cents))
      .withColumn("d", VectorExpressions.intVecSqDist(col("q"), col("cellq")))
      .withColumn("prk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("id"))
          .orderBy(col("d"), col("cell"))))
      .filter(col("prk") <= nProbe)
      .select(col("id").as("qid"), col("cell"),
        zip_with(col("q"), col("cellq"), (a, b) => a - b).as("qr"))

  /** The search tail over an already-available codes table (in-memory or
    * the stored cell-partitioned read). */
  def searchCodes(codes: DataFrame, emb: DataFrame, cents: DataFrame,
                  cb: DataFrame, dims: Int, m: Int, nQueries: Int,
                  nProbe: Int, topK: Int): DataFrame = {
    val probes = probeCells(emb, cents, nQueries, nProbe)
    val dt = Pq.subspaceSplit(probes, "qr", dims, m, keep = Seq("qid", "cell"))
      .join(broadcast(cb), Seq("sub"))
      .select(col("qid"), col("cell"), col("sub"), col("code"),
        VectorExpressions.intVecSqDist(col("subq"), col("cq")).as("d"))
    val adc = codes.join(broadcast(dt), Seq("cell", "sub", "code"))
      .filter(col("id") =!= col("qid"))
      .groupBy(col("qid"), col("id"), col("cell"))
      .agg(sum(col("d")).as("adc"))
    graft.ops.WindowOps.topKBounded(
        adc.select(col("qid"), col("id").as("vec_id"), col("cell"), col("adc")),
        part = Seq("qid"), order = Seq("adc" -> false, "vec_id" -> false),
        k = topK)
      .select(col("qid"), col("vec_id"), col("cell"), col("adc"),
        col("rk").cast("int").as("rk"))
  }
}
