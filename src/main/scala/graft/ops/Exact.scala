package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.functions.FixedPointExpressions

/** Oracle-stable numeric aggregation.
  *
  * Double sums are order-dependent; Spark's parallel partial aggregation and
  * a single-threaded oracle (DuckDB) will generally disagree in the last ulp.
  * Summing in DECIMAL is exact and order-independent, so both engines produce
  * the identical value; casting the final result back to double keeps the
  * output schema simple. The reference itself aggregates string-typed EAV
  * numerics with implicit casts (project_pooling_info.py:55-69) — here the
  * cast is explicit and documented.
  *
  * At 100 TB these remain single-shuffle hash aggregates with map-side
  * partial combine; DECIMAL(25,4) partials are 16 bytes, same ballpark as a
  * double accumulator.
  */
object Exact {
  // (18,4): wide enough for sums over 10^8 rows of 10^5-magnitude values,
  // narrow enough that a decimal*decimal product (37,8) stays inside both
  // Spark's and DuckDB's 38-digit ceiling without precision loss.
  //
  // The double→decimal conversion is graft's codegen'd [[ScaledDecimal]]
  // (long arithmetic, no Double.toString/BigDecimal per row) — semantically
  // the built-in cast, ~10× cheaper, which matters because this cast sits
  // inside every exact aggregate's per-row update. Inputs are routed
  // through double first: all reference quantities are doubles or small
  // integers (exact in double to 2^53).

  /** Order-independent sum of a numeric column, returned as double. */
  def dsum(c: Column): Column =
    sum(FixedPointExpressions.scaledDecimal(c.cast("double"), 18, 4)).cast("double")

  /** Exact average: decimal sum / count, divided in double (bit-identical
    * across engines because both evaluate the same IEEE expression). */
  def davg(c: Column): Column =
    (sum(FixedPointExpressions.scaledDecimal(c.cast("double"), 18, 4)).cast("double") /
      count(c)).cast("double")

  /** Sum of a product of two numeric columns, exact. The product is computed
    * on long-scaled fixed-point so the multiplication itself is order- and
    * engine-stable (identical to the decimal-cast multiply it replaces). */
  def dsumProduct(a: Column, b: Column): Column =
    sum(FixedPointExpressions.scaledProduct(a.cast("double"), b.cast("double"), 4))
      .cast("double")
}
