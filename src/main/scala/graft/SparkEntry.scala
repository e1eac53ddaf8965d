package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query registry is assembled from per-domain modules under
  * [[graft.queries]]; every entry there with a SQL-expressible semantics has
  * a DuckDB oracle with identical output column names.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pooling_census")(spark, "/root/testdata/sf0.001")

  private def modules = Seq(
    graft.queries.Relational.queries -> graft.queries.Relational.oracles,
    graft.queries.Reshape.queries    -> graft.queries.Reshape.oracles,
    graft.queries.SetAgg.queries     -> graft.queries.SetAgg.oracles,
    graft.queries.Scalars.queries    -> graft.queries.Scalars.oracles,
    graft.queries.Events.queries     -> graft.queries.Events.oracles,
    graft.queries.TextQ.queries      -> graft.queries.TextQ.oracles,
    graft.queries.NlpQ.queries       -> graft.queries.NlpQ.oracles,
    graft.queries.CurationQ.queries  -> graft.queries.CurationQ.oracles,
    graft.queries.SimilarityQ.queries -> graft.queries.SimilarityQ.oracles,
    graft.queries.MultimodalQ.queries -> graft.queries.MultimodalQ.oracles,
    graft.queries.Extra.queries      -> graft.queries.Extra.oracles,
    graft.queries.PipelineQ.queries  -> graft.queries.PipelineQ.oracles,
    graft.queries.Lineage.queries    -> graft.queries.Lineage.oracles,
    graft.queries.CosmxQ.queries     -> graft.queries.CosmxQ.oracles)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    val merged = modules.map(_._1).reduce(_ ++ _)
    val total = modules.map(_._1.size).sum
    require(merged.size == total,
      s"duplicate query keys across modules: ${total - merged.size} collisions")
    merged
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.map(_._2).reduce(_ ++ _)
}
