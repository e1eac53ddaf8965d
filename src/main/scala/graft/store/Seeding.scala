package graft.store

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pipeline work-queue seeding — the reference's pipeline_seed table and
  * its NOT-IN anti-join feeders (pipelineadaptor.py:523-683, SURVEY §2.10).
  *
  * The queue is just a store table (pipeline_id, seed_id, seed_table,
  * status); seeding is an anti-join, state transitions are a validated
  * upsert. At scale both are single-shuffle ops; the entity side can be
  * 10^9 rows, the seed side shuffles on the same key.
  */
object Seeding {

  val ValidTransitions: Map[String, Set[String]] = Map(
    "SEEDED"  -> Set("RUNNING"),
    "RUNNING" -> Set("FINISHED", "FAILED"),
    "FAILED"  -> Set("SEEDED"))

  /** Entities not yet seeded for `pipelineId` → new SEEDED rows
    * (seed_new_seqruns / seed_new_experiments shape). */
  def seedNew(store: Store, seedTableName: String,
              entities: DataFrame, entityKey: String,
              pipelineId: Long, seedTable: String): Long = {
    val candidates = entities.select(
      lit(pipelineId).as("pipeline_id"),
      col(entityKey).cast("long").as("seed_id"),
      lit(seedTable).as("seed_table"),
      lit("SEEDED").as("status"))
    store.insertIfAbsent(seedTableName, candidates,
      Seq("pipeline_id", "seed_id", "seed_table"))
  }

  /** Status transition with validity gating: rows whose current status does
    * not allow the transition are left untouched (the reference raises
    * per-row; here violations surface as the returned rejected frame —
    * SURVEY §7.4 error-frame convention). Returns (applied, rejected). */
  def transition(store: Store, seedTableName: String,
                 picks: DataFrame, newStatus: String): (Long, DataFrame) = {
    val keys = Seq("pipeline_id", "seed_id", "seed_table")
    val current = store.read(seedTableName)
    val joined = current.join(picks.select(keys.map(col): _*), keys, "left_semi")
    val allowedFrom = ValidTransitions.collect {
      case (from, tos) if tos.contains(newStatus) => from
    }.toSeq
    val applicable = joined.filter(col("status").isin(allowedFrom: _*))
    // materialize BEFORE the upsert: on a live-DBMS store the lazy plan
    // would re-read post-mutation state (parquet snapshots pin the version,
    // JDBC doesn't); the error frame is small by contract
    val rejected = joined.filter(!col("status").isin(allowedFrom: _*))
      .localCheckpoint()
    val updated = applicable.withColumn("status", lit(newStatus))
    val n = updated.count()
    if (n > 0) store.upsert(seedTableName, updated, keys)
    (n, rejected)
  }

  /** Seeds of a (pipeline, status) joined back to their entity rows —
    * fetch_pipeline_seed_with_table_data (pipelineadaptor.py:213-254). */
  def fetchWithEntities(store: Store, seedTableName: String,
                        pipelineId: Long, status: String,
                        entities: DataFrame, entityKey: String): DataFrame =
    store.read(seedTableName)
      .filter(col("pipeline_id") === pipelineId && col("status") === status)
      .join(entities, col("seed_id") === col(entityKey).cast("long"))
}
