package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expressions for embedding math (SURVEY.md §2D5–D7).
  *
  * A Scala UDF would box every float of every vector per row; these
  * expressions read the `ArrayData` primitives directly and generate a tight
  * primitive loop via `doGenCode`, so similarity scans stay inside
  * whole-stage codegen — the difference between scanning 100 TB of
  * embeddings at memory bandwidth vs at serializer speed.
  *
  * Accumulation is a strict left-to-right double sum: deterministic for a
  * given row, bit-identical to any engine that folds the list sequentially
  * (the DuckDB oracle's list_sum does).
  */
abstract class VectorFold extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _                       => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two array<float> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
}

/** cosine(a, b) = Σaᵢbᵢ / (√Σaᵢ² · √Σbᵢ²), 0-padded to the shorter length. */
case class CosineSimilarity(left: Expression, right: Expression) extends VectorFold {

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi"); val yi = ctx.freshName("yi")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = (double) $a.getFloat($i);
         |  double $yi = (double) $b.getFloat($i);
         |  $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |}
         |${ev.value} = $dot / (Math.sqrt($na) * Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** dot(a, b) = Σaᵢbᵢ (strict sequential double accumulation). */
case class DotProduct(left: Expression, right: Expression) extends VectorFold {

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) { dot += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** dot(a: array<float>, c: array<double>) = Σ double(aᵢ)·cᵢ — the
  * mixed-width fold the IVF quantizer scores with: data stays float32, the
  * centroids are exact training doubles (narrowing them to float would
  * change the very bits the cross-engine oracle reproduces). */
case class DotProductFD(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (array<float>, array<double>), got " +
          s"${l.simpleString} and ${r.simpleString}")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) { dot += x.getFloat(i).toDouble * y.getDouble(i); i += 1 }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += (double) $a.getFloat($i) * $b.getDouble($i);
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** dot(a: array<double>, b: array<double>) = Σ aᵢ·bᵢ — the all-double
  * fold reconstructed (de-quantized) vectors score with: reconstruction
  * is exact double arithmetic from integer codes, and narrowing it to
  * float would change the bits the cross-engine oracle reproduces. */
case class DotProductDD(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (array<double>, array<double>), got " +
          s"${l.simpleString} and ${r.simpleString}")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) { dot += x.getDouble(i) * y.getDouble(i); i += 1 }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** argmin over a centroid MATRIX: the cell id of the nearest centroid
  * under L2, scored as |c|² − 2·x·c (monotone in distance — ‖x‖² is
  * shared and dropped). This is the codegen-splittable form of
  * `array_min(array(struct(d_0,0), …, struct(d_{nlist−1},nlist−1)))`:
  * the literal-unrolled array form generates O(nlist·dims) source in ONE
  * janino method and blows the 64 KB limit at nlist=128 (Spark then
  * falls back to interpreted evaluation — SURVEY.md's round-9 known
  * issue), while this expression holds the matrix as a reference object
  * and generates one fixed-size doubly-nested loop — O(1) code for any
  * nlist, which is what a lake-scale quantizer (nlist in the thousands)
  * needs.
  *
  * Bit-exactness with the array_min form (the cross-engine oracle
  * contract): per centroid, |c|² folds dimension-ascending at
  * CONSTRUCTION time (same fold the plan-literal performed) and the
  * mixed-width dot replays DotProductFD's sequential
  * double(float)·double accumulation; the argmin replays the struct
  * ordering — Spark's double compare (NaN greatest, −0.0 = 0.0, via
  * the `x == y` short-circuit then `Double.compare`) with ties falling
  * to the smaller cell id.
  */
case class NearestCentroid(child: Expression, cents: Array[Array[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float>, got ${t.simpleString}")
  }

  // |c|² per centroid, dimension-ascending sequential fold (identical to
  // the fold the plan-literal c2 performed driver-side)
  private lazy val c2: Array[Double] = cents.map { c =>
    var s = 0.0; var j = 0
    while (j < c.length) { s += c(j) * c(j); j += 1 }
    s
  }

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var best = 0
    var bestD = 0.0
    var ci = 0
    while (ci < cents.length) {
      val c = cents(ci)
      val n = math.min(x.numElements(), c.length)
      var dot = 0.0
      var j = 0
      while (j < n) { dot += x.getFloat(j).toDouble * c(j); j += 1 }
      val d = c2(ci) - 2.0 * dot
      // Spark double ordering: x == y short-circuit makes −0.0 tie 0.0,
      // Double.compare puts NaN above every real; ties keep the first
      // (smallest) cell id — array_min's lexicographic struct order
      if (ci == 0 ||
          (if (d == bestD) 0 else java.lang.Double.compare(d, bestD)) < 0) {
        bestD = d; best = ci
      }
      ci += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cRef = ctx.addReferenceObj("cents", cents, "double[][]")
      val c2Ref = ctx.addReferenceObj("c2", c2, "double[]")
      val ci = ctx.freshName("ci"); val j = ctx.freshName("j")
      val n = ctx.freshName("n"); val dot = ctx.freshName("dot")
      val d = ctx.freshName("d"); val c = ctx.freshName("c")
      val best = ctx.freshName("best"); val bestD = ctx.freshName("bestD")
      val cmp = ctx.freshName("cmp")
      s"""
         |int $best = 0;
         |double $bestD = 0.0;
         |for (int $ci = 0; $ci < $cRef.length; $ci++) {
         |  double[] $c = $cRef[$ci];
         |  int $n = Math.min($a.numElements(), $c.length);
         |  double $dot = 0.0;
         |  for (int $j = 0; $j < $n; $j++) {
         |    $dot += (double) $a.getFloat($j) * $c[$j];
         |  }
         |  double $d = $c2Ref[$ci] - 2.0 * $dot;
         |  int $cmp = ($d == $bestD) ? 0 : java.lang.Double.compare($d, $bestD);
         |  if ($ci == 0 || $cmp < 0) { $bestD = $d; $best = $ci; }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorFunctions {
  import GraftBridge.{toColumn, toExpression}
  private def f(c: Column): Column = c.cast("array<float>")
  /** Column wrappers over the native expressions. */
  def cosine(a: Column, b: Column): Column =
    toColumn(CosineSimilarity(toExpression(f(a)), toExpression(f(b))))
  def dot(a: Column, b: Column): Column =
    toColumn(DotProduct(toExpression(f(a)), toExpression(f(b))))
  def dotFD(a: Column, c: Column): Column =
    toColumn(DotProductFD(toExpression(f(a)),
      toExpression(c.cast("array<double>"))))
  def dotDD(a: Column, b: Column): Column =
    toColumn(DotProductDD(toExpression(a.cast("array<double>")),
      toExpression(b.cast("array<double>"))))
  def nearestCentroid(emb: Column, cents: Array[Array[Double]]): Column =
    toColumn(NearestCentroid(toExpression(f(emb)), cents))
}
