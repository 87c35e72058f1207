package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column <-> Expression conversions
  * (org.apache.spark.sql.classic.ExpressionUtils) so the library can wrap
  * its custom Catalyst expressions in user-facing Columns — the standard
  * extension-library pattern for Spark 4's sealed Column API. */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
