package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into Spark's `private[sql]` Column ⇄ Expression
  * converters (org.apache.spark.sql.classic.ExpressionUtils). Spark 4
  * hides direct `new Column(expr)` behind the Connect column-node
  * refactor; extension libraries conventionally expose it via a shim in
  * the sql package. This is the only file outside the `graft` namespace.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
