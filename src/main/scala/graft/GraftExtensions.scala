package graft

import org.apache.spark.sql.{GraftBridge, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Add, Divide, Expression,
  ExpressionInfo, Greatest, Least, LessThan, Literal, Md5, Multiply,
  Substring, Subtract, Cast}
import org.apache.spark.sql.types.{BinaryType, StringType}

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

  /** openEO scalar processes as SQL functions, composed from builtin
    * Catalyst expressions (type coercion happens in analysis, codegen is
    * the builtins' own). */
  private def clipExpr(x: Expression, lo: Expression, hi: Expression) =
    Least(Seq(Greatest(Seq(x, lo)), hi))

  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "cosine_sim" -> (args => CosineSimilarity(args(0), args(1))),
    "dot_product" -> (args => DotProduct(args(0), args(1))),
    // openEO normalized_difference (the ndvi kernel): (a − b) / (a + b)
    "normalized_difference" -> (args =>
      Divide(Subtract(args(0), args(1)), Add(args(0), args(1)))),
    // openEO clip(x, min, max)
    "clip_value" -> (args => clipExpr(args(0), args(1), args(2))),
    // openEO linear_scale_range(x, inMin, inMax, outMin, outMax)
    "linear_scale_range" -> (args => Add(
      Multiply(
        Divide(Subtract(clipExpr(args(0), args(1), args(2)), args(1)),
          Subtract(args(2), args(1))),
        Subtract(args(4), args(3))),
      args(3))),
    // deterministic md5-threshold sampling predicate (TextFunctions
    // .hashSampleKeep): rate must be a literal so the hex threshold is a
    // plan-time constant
    "hash_sample" -> (args => {
      require(args(1).foldable, "hash_sample: rate must be a literal")
      val rate = args(1).eval().toString.toDouble
      require(rate >= 0.0 && rate <= 1.0, s"hash_sample rate: $rate")
      if (rate >= 1.0) Literal(true)
      else {
        val thr = "%08x".format(math.floor(rate * math.pow(16.0, 8)).toLong)
        LessThan(
          Substring(Md5(Cast(Cast(args(0), StringType), BinaryType)),
            Literal(1), Literal(8)),
          Literal(thr))
      }
    })
  )

  def install(spark: SparkSession): Unit =
    functions.foreach { case (name, builder) =>
      GraftBridge.registerFunction(spark, name, builder)
    }
}
