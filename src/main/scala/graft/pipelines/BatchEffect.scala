package graft.pipelines

import org.apache.spark.ml.feature.{PCA, VectorAssembler}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch-effect report analytics (batch_effect_report.py:95-185): merged
  * per-lane count matrices → CPM normalization → correlation matrix → PCA.
  *
  * The reference transposes a pandas frame and calls sklearn; here the
  * count matrix stays a DataFrame, CPM is a projection against broadcast
  * per-column totals, the correlation matrix is spark.ml's distributed
  * `Correlation`, and PCA is `org.apache.spark.ml.feature.PCA` — all
  * shuffle-bounded, no driver-side matrix materialization until the final
  * (tiny: lanes × components) result.
  */
object BatchEffect {

  /** Counts-per-million normalization of the value columns. */
  def cpm(counts: DataFrame, valueCols: Seq[String]): DataFrame = {
    val totals = counts.agg(
      valueCols.map(c => sum(col(c)).as(c)).head,
      valueCols.map(c => sum(col(c)).as(c)).tail: _*).head()
    valueCols.zipWithIndex.foldLeft(counts) { case (df, (c, i)) =>
      df.withColumn(c, col(c) * 1e6 / lit(totals.getDouble(i)))
    }
  }

  /** Pearson correlation matrix of the value columns (df.corr() of the CPM
    * matrix, batch_effect_report.py:160). Returns (col_a, col_b, corr). */
  def correlationMatrix(df: DataFrame, valueCols: Seq[String]): DataFrame = {
    import df.sparkSession.implicits._
    val assembled = new VectorAssembler()
      .setInputCols(valueCols.toArray).setOutputCol("features")
      .transform(df.na.fill(0.0, valueCols))
    val m = org.apache.spark.ml.stat.Correlation.corr(assembled, "features")
      .head().getAs[org.apache.spark.ml.linalg.Matrix](0)
    val rows = for {
      i <- valueCols.indices
      j <- valueCols.indices
    } yield (valueCols(i), valueCols(j), m(i, j))
    rows.toDF("col_a", "col_b", "corr")
  }

  /** 2-component PCA scores per row (batch_effect_report.py:172-185). */
  def pca2(df: DataFrame, valueCols: Seq[String], idCol: String): DataFrame = {
    val assembled = new VectorAssembler()
      .setInputCols(valueCols.toArray).setOutputCol("features")
      .transform(df.na.fill(0.0, valueCols))
    val model = new PCA().setInputCol("features").setOutputCol("pca")
      .setK(2).fit(assembled)
    import org.apache.spark.ml.functions.vector_to_array
    model.transform(assembled)
      .select(col(idCol),
        vector_to_array(col("pca")).getItem(0).as("pc1"),
        vector_to_array(col("pca")).getItem(1).as("pc2"))
  }
}
