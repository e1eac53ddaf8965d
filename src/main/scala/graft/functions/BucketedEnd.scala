package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}

/** Identity passthrough that annotates an interval-end expression with the
  * range-join bucket width — the carrier for
  * [[graft.plans.RangeJoinRewrite]]'s hint (the OSS analog of a RANGE_JOIN
  * hint). Semantically transparent: on a session WITHOUT the rule the
  * predicate `p <= bucketed_end(e, w)` evaluates exactly as `p <= e`, so
  * plans degrade to Spark's nested-loop join rather than to wrong results;
  * with the rule installed the enclosing join is rewritten to the
  * coarse-bucket equi-join. Never foldable — UnaryExpression's default
  * would make the node foldable over a literal end bound, and constant
  * folding would then erase the annotation before the rule runs. */
case class BucketedEnd(child: Expression, width: Long) extends UnaryExpression {
  require(width > 0, "bucket width must be positive")
  override def foldable: Boolean = false
  override def dataType = child.dataType
  override def nullable: Boolean = child.nullable
  override protected def nullSafeEval(input: Any): Any = input
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => c)
  override protected def withNewChildInternal(newChild: Expression): BucketedEnd =
    copy(child = newChild)
  override def prettyName: String = "bucketed_end"
}
