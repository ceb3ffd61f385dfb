package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into `private[sql]` surface that third-party native
  * expressions need in Spark 4 (the Column ↔ Expression converters moved
  * behind the classic/connect split). Kept to exactly two forwarders; all
  * graft code goes through these.
  */
object GraftBridge {
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
