package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Expression bridge. Spark 4 wraps Columns around ColumnNode
  * and scopes the converters `private[sql]`; custom Catalyst expressions
  * still need them, so this object re-exports the two functions — the
  * conventional extension-library shim, no internals re-implemented.
  */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
