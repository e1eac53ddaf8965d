package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.functions.BucketedEnd

/** Optimizer rule: rewrite an inner join whose only cross-side predicate
  * is a range containment `p >= s AND p <= bucketed_end(e, w)` into the
  * coarse-bucket equi-join — the declarative twin of
  * [[graft.ops.RangeJoin.pointsInIntervals]], triggered by the
  * [[BucketedEnd]] width annotation (the OSS analog of a RANGE_JOIN hint).
  *
  * Why a rule: Spark plans a bare range predicate as
  * BroadcastNestedLoopJoin — every point row scans every interval row,
  * the canonical 100 TB scale-killer. The rewrite projects
  * `floor(p / w)` on the point side, explodes each interval to the bucket
  * ids `floor(s / w) .. floor(e / w)` with a Generate, equi-joins on the
  * bucket id (hash-joinable, AQE-skew-splittable) and keeps the original
  * range predicate as the exact recheck. Any interval width remains
  * CORRECT (the sequence simply emits more buckets); `w` at or above the
  * longest interval keeps the fan-out at <= 2 rows per interval.
  *
  * Null semantics are preserved exactly: a null `p`, `s`, or `e` fails
  * the original comparisons (inner join drops the row) and here produces
  * a null bucket id or an empty bucket sequence (the join drops the row).
  * If the condition does not complete the pattern, the join is left
  * untouched — BucketedEnd is an identity at runtime, so nothing breaks;
  * it just stays a nested-loop join.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] {

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  private def bucketOf(x: Expression, w: Long): Expression =
    Floor(Divide(Cast(x, DoubleType), Cast(Literal(w), DoubleType)))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(_, _, Inner, Some(cond), _)
        if cond.collectFirst { case b: BucketedEnd => b }.isDefined =>
      rewrite(j).getOrElse(j)
  }

  private def rewrite(j: Join): Option[LogicalPlan] = {
    val cs = conjuncts(j.condition.get)
    // upper bound carrying the width annotation: p <= bucketed_end(e, w)
    val upper = cs.collectFirst {
      case u @ LessThanOrEqual(p, BucketedEnd(e, w)) => (u, p, e, w)
      case u @ GreaterThanOrEqual(BucketedEnd(e, w), p) => (u, p, e, w)
    }
    upper.flatMap { case (upperExpr, p, e, w) =>
      // matching lower bound on the same point expression: p >= s
      val lower = cs.collectFirst {
        case l @ GreaterThanOrEqual(p2, s) if p2.semanticEquals(p) => (l, s)
        case l @ LessThanOrEqual(s, p2) if p2.semanticEquals(p) => (l, s)
      }
      lower.flatMap { case (lowerExpr, s) =>
        val (left, right) = (j.left, j.right)
        val ivRefs = s.references ++ e.references
        // orient: the point expression must resolve against one side, the
        // interval bounds against the other
        val sides =
          if (p.references.subsetOf(left.outputSet) &&
              ivRefs.subsetOf(right.outputSet)) Some((left, right, true))
          else if (p.references.subsetOf(right.outputSet) &&
              ivRefs.subsetOf(left.outputSet)) Some((right, left, false))
          else None
        sides.map { case (points, intervals, pointsOnLeft) =>
          val pb = Alias(bucketOf(p, w), "__graft_pb")()
          val ib = AttributeReference("__graft_b", LongType, nullable = false)()
          val ptProj = Project(points.output :+ pb, points)
          // Sequence is TimeZoneAware: without an explicit zone it stays
          // unresolved and the optimizer's plan validator rejects the rule
          val ivGen = Generate(
            Explode(Sequence(bucketOf(s, w), bucketOf(e, w), None,
              Some(conf.sessionLocalTimeZone))),
            unrequiredChildIndex = Nil, outer = false, qualifier = None,
            generatorOutput = Seq(ib), child = intervals)
          // original condition survives as the exact recheck, with the
          // annotation unwrapped; any extra conjuncts ride along
          val recheck = cs.map {
            case x if x eq upperExpr =>
              x.transform { case BucketedEnd(c, _) => c }
            case x => x
          }
          val newCond = (EqualTo(pb.toAttribute, ib) +: recheck).reduce(And)
          val (nl, nr) =
            if (pointsOnLeft) (ptProj: LogicalPlan, ivGen: LogicalPlan)
            else (ivGen: LogicalPlan, ptProj: LogicalPlan)
          Project(j.output, Join(nl, nr, Inner, Some(newCond), j.hint))
        }
      }
    }
  }
}
