package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Expression bridge for custom Catalyst expressions.
  *
  * Spark 4 unified `Column` around ColumnNode and made the converters
  * `private[sql]`; extension libraries conventionally reach them from a
  * compilation unit inside the `org.apache.spark.sql` package namespace.
  * This is the only file in the repo that does so.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
