package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Population-Stability-Index machinery shared by the snapshot-drift
  * audits (d39 over text-length bins, e17 over embedding cells): given a
  * pre-aggregated old/new histogram, attach the Laplace-smoothed PSI term
  * per bin and the per-population total.
  *
  * Engine-portability is by construction, the same argument d39's
  * scaladoc makes: each integer factor is cast to double FIRST (a
  * long→double cast and a double multiply are both correctly-rounded
  * IEEE operations, identical across engines — and immune to the Long
  * wraparound a raw integer product would hit once per-source bin
  * counts pass ~3e9), so only ln's final ulp can differ across
  * engines — rounded away at 6 decimals, with
  * `+ 0.0` normalizing -0.0; the total sums the ROUNDED terms as decimals
  * (order-free), never raw doubles. Scale shape: the input is already the
  * aggregated histogram (#populations × #bins rows), so the windows here
  * are over tiny frames regardless of corpus size.
  */
object Drift {

  /** Attach `psi_term` and `psi_total` to a histogram frame carrying
    * `n_old`/`n_new` counts. `part` names the population key columns
    * (empty = one global population); `bins` is the Laplace cell count B
    * in the (n+1)/(N+B) smoothing — the FIXED bin-space size, not the
    * number of observed rows, so a bin missing from one snapshot is
    * still defined. */
  def psi(hist: DataFrame, part: Seq[String], bins: Int): DataFrame = {
    val w =
      if (part.isEmpty) Window.partitionBy(lit(0))
      else Window.partitionBy(part.map(col): _*)
    hist
      .withColumn("__No", sum(col("n_old")).over(w))
      .withColumn("__Nn", sum(col("n_new")).over(w))
      .withColumn("psi_term",
        round(((col("n_new") + 1).cast("double") / (col("__Nn") + bins).cast("double")
            - (col("n_old") + 1).cast("double") / (col("__No") + bins).cast("double"))
          * log((col("n_new") + 1).cast("double") * (col("__No") + bins).cast("double")
            / ((col("n_old") + 1).cast("double") * (col("__Nn") + bins).cast("double"))), 6)
          + lit(0.0))
      .withColumn("psi_total",
        sum(col("psi_term").cast("decimal(18,6)")).over(w).cast("double"))
      .drop("__No", "__Nn")
  }
}
