package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal accessor for sql-private Column<->Expression conversion (the
  * classic.ExpressionUtils helpers are private[sql]); lives in the
  * org.apache.spark.sql package solely to cross that boundary for graft's
  * custom Catalyst expressions. */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
