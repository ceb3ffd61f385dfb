package graft

import org.apache.spark.sql.{GraftBridge, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CosineSimilarity, DotProduct}

/** Session extension registering graft's native expressions as SQL
  * functions, so `spark.sql("SELECT cosine_sim(a, b) …")` codegens the
  * same tight loop as the Column API.
  *
  * Two installation paths:
  *  - cluster conf: `spark.sql.extensions=graft.GraftExtensions`
  *    (picked up at session build — the standard deployment)
  *  - `GraftExtensions.install(spark)` on an already-running session
  *    (e.g. the driver-owned session of the query contract)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name), builder))
    }
}

object GraftExtensions {
  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "cosine_sim" -> (args => CosineSimilarity(args(0), args(1))),
    "dot_product" -> (args => DotProduct(args(0), args(1)))
  )

  def install(spark: SparkSession): Unit =
    functions.foreach { case (name, builder) =>
      GraftBridge.registerFunction(spark, name, builder)
    }
}
