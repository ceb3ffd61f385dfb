package org.apache.spark.sql

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Minimal bridge into `private[sql]` surface that third-party native
  * expressions need in Spark 4 (the Column ↔ Expression converters and the
  * session FunctionRegistry moved behind the classic/connect split). Kept
  * to three forwarders; all graft code goes through these.
  */
object GraftBridge {
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Register a native function on a LIVE session (the extensions path only
    * covers sessions built with spark.sql.extensions). */
  def registerFunction(spark: SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .registerFunction(FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name), builder)
}
