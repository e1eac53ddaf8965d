package graft

import org.apache.spark.sql.SparkSessionExtensions

import graft.functions.DoubleDot

/** SparkSessionExtensions entry point: registers graft's custom Catalyst
  * expressions as SQL functions, so `spark.sql("SELECT double_dot(a, b)")`
  * works for SQL-only users and the expressions participate in codegen
  * exactly like built-ins.
  *
  * Wire up with
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("double_dot"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[DoubleDot].getName, "double_dot"),
        (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          DoubleDot(children(0), children(1))))
  }
}

object GraftExtensions {
  /** Register the same functions into an ALREADY-RUNNING session
    * (withExtensions only applies at session construction). */
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "double_dot",
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DoubleDot(children(0), children(1)),
      "built-in")
}
