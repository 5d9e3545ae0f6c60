package org.apache.spark.sql.rmbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column ⇄ Expression converters, so
  * native Catalyst expressions (graft.functions.*) can surface as Columns —
  * the standard pattern for Spark extension libraries that ship their own
  * expressions without going through a FunctionRegistry. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
