package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` Column ↔ Expression converters — the
  * standard technique Spark extension libraries use to build Columns from
  * custom Catalyst expressions whose parameters (e.g. k-means codebooks)
  * cannot ride through the SQL function registry as literals.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
