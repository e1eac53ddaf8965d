package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed as-of (nearest-event) join — the operator behind "attach the
  * most recent prior click to every purchase" attribution and time-series
  * feature joins. Spark has no built-in; the naive formulation (non-equi
  * theta join + per-left-row max) is a cartesian blow-up per key.
  *
  * This is the union+carry formulation: both sides are unioned on the join
  * keys, sorted once per key by (time, side), and the right payload is
  * carried across left rows with `last(_, ignoreNulls)` over a running
  * window. ONE shuffle on the keys, one sort, zero joins — each input row
  * is touched once, so the plan scales linearly and inherits AQE skew
  * splitting on hot keys. Matching is inclusive (a right row AT the left
  * timestamp matches): right rows order before left rows on timestamp ties.
  *
  * The caller supplies integer-comparable time columns (this repo's
  * convention: epoch microseconds as long — see [[graft.queries.Events]]).
  * If several right rows share (key, time) the carried one is the last in
  * the sort, which is nondeterministic — dedupe the right side first when
  * that can happen (the spec pins this contract).
  */
object AsOfJoin {

  /** Left as-of-backward join: for each left row, the right row with the
    * greatest `rightTs <= leftTs` for the same `keys` (within `tolerance`
    * microseconds when given). Output: all left columns, then the right
    * payload columns (`rightTs` plus every non-key right column), null
    * when no right row qualifies.
    */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String,
               tolerance: Option[Long] = None): DataFrame =
    asOf(left, right, keys, leftTs, rightTs, tolerance, forward = false)

  /** Backward as-of join through the NATIVE operator
    * ([[graft.plans.AsOfJoinPlan]] → [[graft.plans.AsOfJoinExec]]): same
    * semantics as [[backward]], but planned as an SMJ-style merge — each
    * side shuffled and sorted independently on (keys, time), one
    * streaming pass per co-partition, no union, no window state. Output
    * matches [[backward]]: left columns then right payload columns. Works
    * on any session — the strategy is attached to the plan by
    * [[graft.GraftExtensions.registerAll]]; call that first. */
  def backwardMerge(left: DataFrame, right: DataFrame, keys: Seq[String],
                    leftTs: String, rightTs: String,
                    tolerance: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.graftbridge.Bridge
    val payloadCols = right.columns.filterNot(keys.contains).toSeq
    require(payloadCols.contains(rightTs), s"right side must contain $rightTs")
    require(left.columns.intersect(payloadCols).isEmpty,
      s"right payload ${payloadCols.mkString(",")} must not collide with left columns")
    val lPlan = Bridge.analyzed(left)
    // A self-as-of over the same source shares ExprIds across the
    // children — including ids minted by withColumn/select aliases, which
    // relation-instance renewal cannot refresh — and ambiguous ids make
    // the optimizer mis-prune the right child (it attributes the node's
    // key reference to the LEFT side). Isolate the right side by renaming
    // every column through fresh aliases: a DIFFERENT name is never a
    // "redundant alias", so the optimizer cannot strip the barrier, and
    // every right-side output id is freshly minted.
    val renamed = right.select(right.columns.map(c => col(c).as("__r_" + c)).toSeq: _*)
    val rPlan = Bridge.analyzed(renamed)
    def attr(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
             name: String) =
      plan.output.find(_.name == name)
        .getOrElse(throw new IllegalArgumentException(s"no column $name"))
    val node = graft.plans.AsOfJoinPlan(lPlan, rPlan,
      keys.map(attr(lPlan, _)), keys.map(k => attr(rPlan, "__r_" + k)),
      attr(lPlan, leftTs), attr(rPlan, "__r_" + rightTs), tolerance)
    // project away the right side's key columns and restore payload names,
    // so the output shape is identical to backward(): left.* ++ payload
    val keep = lPlan.output.map(a => Bridge.column(a)) ++
      rPlan.output.filter(a => payloadCols.contains(a.name.stripPrefix("__r_")))
        .map(a => Bridge.column(a).as(a.name.stripPrefix("__r_")))
    Bridge.ofRows(left.sparkSession, node).select(keep: _*)
  }

  /** Left as-of-forward join: nearest right row with `rightTs >= leftTs`. */
  def forward(left: DataFrame, right: DataFrame, keys: Seq[String],
              leftTs: String, rightTs: String,
              tolerance: Option[Long] = None): DataFrame =
    asOf(left, right, keys, leftTs, rightTs, tolerance, forward = true)

  private def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
                   leftTs: String, rightTs: String,
                   tolerance: Option[Long], forward: Boolean): DataFrame = {
    val payloadCols = right.columns.filterNot(keys.contains).toSeq
    require(payloadCols.contains(rightTs), s"right side must contain $rightTs")
    require(left.columns.intersect(payloadCols).isEmpty,
      s"right payload ${payloadCols.mkString(",")} must not collide with left columns")

    val lStruct = struct(left.columns.map(col).toSeq: _*)
    val rStruct = struct(payloadCols.map(col): _*)
    // join semantics: a right row with a null key (or null time) can never
    // match anything — drop it here, or the null-key WINDOW partition
    // would happily carry it onto null-key left rows (which must instead
    // survive unmatched, as a left join and DuckDB's ASOF LEFT JOIN do)
    val matchableRight = (keys :+ rightTs)
      .foldLeft(right)((df, c) => df.filter(col(c).isNotNull))
    // build the right row first so the left side can null-cast to its type
    val r0 = matchableRight.select(keys.map(col) ++ Seq(
      col(rightTs).as("__t"), lit(false).as("__is_left"), rStruct.as("__r")): _*)
    val rType = r0.schema("__r").dataType
    val l = left.select(keys.map(col) ++ Seq(
      col(leftTs).as("__t"), lit(true).as("__is_left"),
      lit(null).cast(rType).as("__r"), lStruct.as("__l")): _*)
    val unioned = l.unionByName(r0.withColumn("__l",
      lit(null).cast(l.schema("__l").dataType)))

    // right rows sort BEFORE left rows on timestamp ties => inclusive match
    val ord =
      if (forward) Seq(col("__t").desc, col("__is_left").asc)
      else Seq(col("__t").asc, col("__is_left").asc)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = last(col("__r"), ignoreNulls = true).over(w)

    val within: Column = tolerance match {
      case Some(tol) =>
        val gap =
          if (forward) col("__m").getField(rightTs) - col("__t")
          else col("__t") - col("__m").getField(rightTs)
        col("__m").isNotNull && gap <= tol
      // a null left timestamp satisfies no comparison — never matches
      case None => col("__m").isNotNull && col("__t").isNotNull
    }
    unioned.withColumn("__m", carried)
      .filter(col("__is_left"))
      .withColumn("__m", when(within, col("__m")))
      .select(left.columns.map(c => col("__l").getField(c).as(c)) ++
        payloadCols.map(c => col("__m").getField(c).as(c)): _*)
  }
}
