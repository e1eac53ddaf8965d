package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.LongType

/** A NATIVE as-of join operator — the full custom-operator stack
  * (LogicalPlan node → SparkStrategy → SparkPlan) for the case where
  * composing built-ins is not the best physical shape. The union+window
  * formulation in [[graft.ops.AsOfJoin]] shuffles and sorts the UNION of
  * both sides and carries the right payload through a window function;
  * this operator instead declares SMJ-style requirements — both children
  * hash-clustered on the join keys, each sorted by (keys, time) — and
  * streams a single merge pass per co-partition, remembering one right
  * row at a time. Each side is shuffled and sorted independently
  * (smaller sorts), no struct carry, no window state, and Spark's
  * EnsureRequirements inserts the exchanges/sorts exactly like it does
  * for SortMergeJoin.
  *
  * Semantics are identical to [[graft.ops.AsOfJoin.backward]]: for each
  * left row the right row with the greatest `rightTs <= leftTs` on the
  * same keys (inclusive), optionally within `tolerance`; null keys and
  * null times never match; unmatched left rows survive with nulls.
  */
final case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTs: Expression, rightTs: Expression,
    tolerance: Option[Long]) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy mapping the logical node to its exec. Inject via
  * [[graft.GraftExtensions]] or `spark.experimental.extraStrategies`. */
object GraftStrategies extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lts, rts, tol) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lts, rts, tol) :: Nil
    case _ => Nil
  }
}

final case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTs: Expression, rightTs: Expression,
    tolerance: Option[Long]) extends BinaryExecNode {

  require(leftTs.dataType == rightTs.dataType,
    s"time columns must share a type (${leftTs.dataType} vs ${rightTs.dataType}); " +
      "cast before joining — the merge compares them with one ordering")
  require(leftKeys.map(_.dataType) == rightKeys.map(_.dataType),
    "key columns must share types side to side")
  require(tolerance.isEmpty || leftTs.dataType == LongType,
    "tolerance requires long (epoch-micros) time columns")

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // SMJ-style requirements: co-partition on the keys, sort by (keys, ts).
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTs).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTs).map(SortOrder(_, Ascending)))
  // rows stream out in the left child's order, one output row per left row
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyExprs = leftKeys; val rKeyExprs = rightKeys
    val lOut = left.output; val rOut = right.output
    val lTsExpr = leftTs; val rTsExpr = rightTs
    val tol = tolerance
    val keyTypes = leftKeys.map(_.dataType)
    val tsType = leftTs.dataType
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lOut)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rOut)
      val lTsBound = BindReferences.bindReference(lTsExpr, lOut)
      val rTsBound = BindReferences.bindReference(rTsExpr, rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val tsOrd = TypeUtils.getInterpretedOrdering(tsType)
        .asInstanceOf[Ordering[Any]]
      val nullRight = new GenericInternalRow(rOut.length)
      val joined = new JoinedRow
      val buffered = rIter.buffered

      // one remembered right row: the latest qualifying one for lastKey
      var last: InternalRow = null
      var lastKey: UnsafeRow = null
      var lastTs: Any = null

      lIter.map { l =>
        val lk = lKeyProj(l)
        val ltv = lTsBound.eval(l)
        if (!lk.anyNull && ltv != null) {
          // advance the right cursor: consume rows on earlier keys
          // (forgetting them) and same-key rows at or before ltv
          // (remembering the latest)
          var go = true
          while (go && buffered.hasNext) {
            val rh = buffered.head
            val rk = rKeyProj(rh)
            val c = keyOrd.compare(rk, lk)
            if (c < 0) { buffered.next() }
            else if (c == 0) {
              val rtv = rTsBound.eval(rh)
              if (rtv == null) { buffered.next() } // null time never matches
              else if (tsOrd.compare(rtv, ltv) <= 0) {
                val r = buffered.next()
                last = r.copy(); lastKey = lk.copy(); lastTs = rtv
              } else go = false
            } else go = false
          }
        }
        val matched =
          last != null && !lk.anyNull && ltv != null &&
            lastKey != null && keyOrd.compare(lastKey, lk) == 0 &&
            tol.forall(t =>
              ltv.asInstanceOf[Long] - lastTs.asInstanceOf[Long] <= t)
        joined(l, if (matched) last else nullRight)
      }
    }
  }
}
