package graft

import org.apache.spark.sql.{GraftBridge, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Add, And, BitwiseAnd,
  Cast, Concat, Conv, Divide, ElementAt, EqualTo, Expression,
  ExpressionInfo, Greatest, Least, LessThan, Literal, Md5, Multiply,
  Remainder, ShiftRight, Substring, Subtract}
import org.apache.spark.sql.types.{BinaryType, IntegerType, LongType,
  StringType}

import graft.functions.{BloomSketch, BottomKSketch, CosineSimilarity,
  CountMinSketch, DotProduct}

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

  /** A plan-time integer parameter (sketch sizes, hash counts). */
  private def intLit(e: Expression): Int = {
    require(e.foldable, "sketch size parameters must be literals")
    e.eval().toString.toInt
  }

  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "cosine_sim" -> (args => CosineSimilarity(args(0), args(1))),
    "dot_product" -> (args => DotProduct(args(0), args(1))),
    // |A∩B| without materializing the intersection (the shingle-verifier
    // hot path) — bit-identical to size(array_intersect(a, b))
    "intersect_count" -> (args =>
      graft.functions.IntersectCount(args(0), args(1))),
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
    // the mergeable sketch aggregates (SURVEY §2 D34/D38/D45) — the
    // analyzer wraps the returned AggregateFunction, so
    // `SELECT graft_bloom(v, 4096, 3)` runs the same typed aggregate as
    // the Column API; size parameters must be literals (plan-time state
    // shape). Names are graft_-prefixed to stay clear of Spark's builtin
    // count_min_sketch/bloom_filter_agg.
    "graft_bottom_k" -> (args => BottomKSketch(args(0), intLit(args(1)))),
    "graft_count_min" -> (args =>
      CountMinSketch(args(0), intLit(args(1)), intLit(args(2)))),
    "graft_bloom" -> (args =>
      BloomSketch(args(0), intLit(args(1)), intLit(args(2)))),
    // exact element-wise array<double> sum (the PCA moment primitive):
    // numerically ≡ per-element CAST(sum(CAST(x AS DECIMAL(38,10))) AS
    // DOUBLE), one aggregate for all dims
    "graft_vec_esum" -> (args =>
      graft.functions.VecESum(args(0), intLit(args(1)))),
    // membership probe over a graft_bloom array — the same md5 bit math
    // as the Column helper, composed from builtin Catalyst expressions
    // (the analyzer inserts the numeric coercions, codegen is theirs)
    "graft_bloom_contains" -> (args => {
      val bits = intLit(args(2)); val hashes = intLit(args(3))
      val checks: Seq[Expression] = (0 until hashes).map { i =>
        val p = Remainder(
          Cast(Conv(Substring(
            Md5(Cast(Concat(Seq(Literal(s"$i:"), args(1))), BinaryType)),
            Literal(1), Literal(8)), Literal(16), Literal(10)), LongType),
          Literal(bits.toLong))
        val word = ElementAt(args(0),
          Cast(Add(ShiftRight(p, Literal(6)), Literal(1)), IntegerType))
        val bit = Cast(BitwiseAnd(p, Literal(63L)), IntegerType)
        EqualTo(BitwiseAnd(ShiftRight(word, bit), Literal(1L)), Literal(1L))
      }
      checks.reduce(And(_, _))
    }),
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
