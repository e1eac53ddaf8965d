package graft.meta

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, TimestampType}

import graft.Tables

/** Derived cosmx spatial-omics star (igfTables.py:1250-1504) — same
  * contract as [[MetadataStar]]: every table is a deterministic,
  * SQL-mirrorable function of the testdata so the cosmx QC queries are
  * oracle-backed ([[CosmxStar.oracleCte]] is the DuckDB twin).
  *
  * Decimal QC metrics are synthesized as integer cents divided by a
  * DECIMAL(3,0) hundred — decimal-exact on both engines, so downstream
  * aggregation can round-trip to cents (metric × 100) losslessly.
  * Entity mapping: region→cosmx_run (5), supplier→cosmx_slide (1k·sf),
  * part→cosmx_fov (20k·sf) with RNA/PROTEIN split and per-FOV RNA QC.
  */
final class CosmxStar(s: SparkSession, dir: String) {
  private val t = Tables(s, dir)
  private def nullTs = lit(null).cast(TimestampType)

  /** static → cosmx_platform (igfTables.py:1250-1277). */
  lazy val cosmxPlatform: DataFrame = {
    import s.implicits._
    Seq((1L, "CSMX1", "AlphaUnit"), (2L, "CSMX2", "BetaUnit"))
      .toDF("cosmx_platform_id", "cosmx_platform_igf_id", "cosmx_platform_name")
      .withColumn("date_created", nullTs)
  }

  /** region → cosmx_run (igfTables.py:1278-1306). */
  lazy val cosmxRun: DataFrame = t.region.select(
    (col("r_regionkey") + 1).cast("long").as("cosmx_run_id"),
    concat(lit("CRUN"), col("r_regionkey")).as("cosmx_run_igf_id"),
    col("r_name").as("cosmx_run_name"),
    (col("r_regionkey") % 25 + 1).cast("long").as("project_id"))

  /** supplier → cosmx_slide (igfTables.py:1307-1349). Each slide carries a
    * `fov_range` attribute string ("1-N"), parsed by
    * [[graft.scalars.Genomics.fovRangeToList]] like cosmxutils.py:189-211. */
  lazy val cosmxSlide: DataFrame = t.supplier.select(
    (col("s_suppkey") + 1).cast("long").as("cosmx_slide_id"),
    concat(lit("SLIDE"), col("s_suppkey")).as("cosmx_slide_igf_id"),
    col("s_name").as("cosmx_slide_name"),
    (col("s_suppkey") % 5 + 1).cast("long").as("cosmx_run_id"),
    (col("s_suppkey") % 2 + 1).cast("long").as("cosmx_platform_id"),
    concat(lit("panel_"), col("s_suppkey") % 4).as("panel_info"),
    when(col("s_suppkey") % 3 === 0, "RNA_WTX").otherwise("PROTEIN_IO").as("assay_type"),
    lit("1.0").as("version"),
    nullTs.as("slide_run_date"),
    concat(lit("""{"fov_range": """"), CosmxStar.fovRangeExpr, lit("\"}"))
      .as("slide_metadata"),
    nullTs.as("date_created"))

  /** part → cosmx_fov (igfTables.py:1350-1373): ~20 FOVs per slide,
    * RNA/PROTEIN by parity. */
  lazy val cosmxFov: DataFrame = t.part.select(
    (col("p_partkey") + 1).cast("long").as("cosmx_fov_id"),
    (col("p_partkey") % 20 + 1).cast("string").as("cosmx_fov_name"),
    (col("p_partkey") % 100 + 1).cast("long").as("cosmx_slide_id"),
    when(col("p_partkey") % 2 === 0, "RNA").otherwise("PROTEIN").as("slide_type"))

  /** RNA FOVs → cosmx_fov_rna_qc (igfTables.py:1398-1424): DECIMAL(10,2/3)
    * metrics from integer cents (exact on both engines). */
  lazy val cosmxFovRnaQc: DataFrame = {
    def cents(mult: Int, mod: Int) =
      ((col("p_partkey") * mult) % mod).cast(DecimalType(10, 2)) /
        lit(100).cast(DecimalType(3, 0))
    t.part.filter(col("p_partkey") % 2 === 0).select(
      (col("p_partkey") + 1).cast("long").as("cosmx_fov_rna_qc_id"),
      (col("p_partkey") + 1).cast("long").as("cosmx_fov_id"),
      cents(13, 100000).cast(DecimalType(10, 2)).as("mean_transcript_per_cell"),
      cents(7, 50000).cast(DecimalType(10, 2)).as("mean_unique_genes_per_cell"),
      ((col("p_partkey") * 3) % 5000).cast("long").as("number_non_empty_cells"),
      cents(11, 10000).cast(DecimalType(10, 2)).as("pct_non_empty_cells"),
      cents(17, 200000).cast(DecimalType(10, 2)).as("percentile_90_transcript_per_cell"),
      cents(5, 20000).cast(DecimalType(10, 2)).as("percentile_10_transcript_per_cell"),
      lit(null).cast(DecimalType(10, 3)).as("mean_negprobe_counts_per_cell"))
  }
}

object CosmxStar {
  def apply(s: SparkSession, dir: String): CosmxStar = new CosmxStar(s, dir)

  /** fov_range strings in both shapes cosmxutils.py:189-211 accepts:
    * "1-N" ranges plus comma lists every 7th slide. */
  private[meta] def fovRangeExpr =
    when(col("s_suppkey") % 7 === 0, lit("2,4,6,8"))
      .otherwise(concat(lit("1-"), col("s_suppkey") % 17 + 4))

  /** DuckDB CTE prelude — keep in lockstep with the Spark derivations. */
  val oracleCte: String =
    """cosmx_run AS (
      |  SELECT r_regionkey + 1 AS cosmx_run_id,
      |         'CRUN' || r_regionkey AS cosmx_run_igf_id,
      |         r_name AS cosmx_run_name,
      |         r_regionkey % 25 + 1 AS project_id
      |  FROM region),
      |cosmx_slide AS (
      |  SELECT s_suppkey + 1 AS cosmx_slide_id,
      |         'SLIDE' || s_suppkey AS cosmx_slide_igf_id,
      |         s_name AS cosmx_slide_name,
      |         s_suppkey % 5 + 1 AS cosmx_run_id,
      |         s_suppkey % 2 + 1 AS cosmx_platform_id,
      |         CASE WHEN s_suppkey % 3 = 0 THEN 'RNA_WTX' ELSE 'PROTEIN_IO' END AS assay_type,
      |         CASE WHEN s_suppkey % 7 = 0 THEN '2,4,6,8'
      |              ELSE '1-' || (s_suppkey % 17 + 4) END AS fov_range
      |  FROM supplier),
      |cosmx_fov AS (
      |  SELECT p_partkey + 1 AS cosmx_fov_id,
      |         CAST(p_partkey % 20 + 1 AS VARCHAR) AS cosmx_fov_name,
      |         p_partkey % 100 + 1 AS cosmx_slide_id,
      |         CASE WHEN p_partkey % 2 = 0 THEN 'RNA' ELSE 'PROTEIN' END AS slide_type
      |  FROM part),
      |cosmx_fov_rna_qc AS (
      |  SELECT p_partkey + 1 AS cosmx_fov_rna_qc_id,
      |         p_partkey + 1 AS cosmx_fov_id,
      |         CAST((p_partkey * 13) % 100000 AS DECIMAL(10,2)) / CAST(100 AS DECIMAL(3,0)) AS mean_transcript_per_cell,
      |         CAST((p_partkey * 7) % 50000 AS DECIMAL(10,2)) / CAST(100 AS DECIMAL(3,0)) AS mean_unique_genes_per_cell,
      |         (p_partkey * 3) % 5000 AS number_non_empty_cells,
      |         CAST((p_partkey * 11) % 10000 AS DECIMAL(10,2)) / CAST(100 AS DECIMAL(3,0)) AS pct_non_empty_cells,
      |         CAST((p_partkey * 17) % 200000 AS DECIMAL(10,2)) / CAST(100 AS DECIMAL(3,0)) AS percentile_90_transcript_per_cell,
      |         CAST((p_partkey * 5) % 20000 AS DECIMAL(10,2)) / CAST(100 AS DECIMAL(3,0)) AS percentile_10_transcript_per_cell
      |  FROM part WHERE p_partkey % 2 = 0)""".stripMargin
}
