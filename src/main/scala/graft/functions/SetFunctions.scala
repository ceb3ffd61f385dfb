package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared eval for [[IntersectCount]] — a static call site both the
  * interpreted path and the generated code use, so the expression stays
  * inside whole-stage codegen with ONE helper invocation per row. */
object IntersectCountHelper {
  /** Exactly `size(array_intersect(a, b))` for string arrays: the number
    * of DISTINCT elements of `a` present in `b` (null counted once when
    * present in both — Spark's array_intersect contract). */
  def count(a: ArrayData, b: ArrayData): Int = {
    val bn = b.numElements()
    val bs = new java.util.HashSet[UTF8String](Math.max(8, bn * 2))
    var bHasNull = false
    var i = 0
    while (i < bn) {
      if (b.isNullAt(i)) bHasNull = true
      else bs.add(b.getUTF8String(i))
      i += 1
    }
    val an = a.numElements()
    val seen = new java.util.HashSet[UTF8String](Math.max(8, an * 2))
    var aNullCounted = false
    var cnt = 0
    i = 0
    while (i < an) {
      if (a.isNullAt(i)) {
        if (bHasNull && !aNullCounted) { cnt += 1; aNullCounted = true }
      } else {
        val el = a.getUTF8String(i)
        if (bs.contains(el) && seen.add(el)) cnt += 1
      }
      i += 1
    }
    cnt
  }
}

/** |A ∩ B| for two string arrays WITHOUT materializing the intersection:
  * bit-identical to `size(array_intersect(a, b))` (parity spec-pinned,
  * incl. duplicates and nulls) but skips allocating and copying the
  * result array that `array_intersect` builds per row — the hot path of
  * every shingle-overlap verifier (Jaccard, containment, the LSH planning
  * scorer), where millions of candidate pairs each intersect two
  * hundreds-of-shingles arrays and the intersection itself is never
  * needed, only its cardinality. */
case class IntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "intersect_count"
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(StringType, _) => true
      case _                        => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two array<string> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    IntersectCountHelper.count(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.IntersectCountHelper.count($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** [[IntersectCountSorted]]'s eval — static call site for codegen. */
object IntersectCountSortedHelper {
  /** |A ∩ B| by merge scan over two SORTED, DISTINCT string arrays —
    * zero hashing and zero allocation per call (vs the per-pair HashSet
    * the unsorted form builds). Equal to `size(array_intersect(a, b))`
    * whenever both inputs are sorted ascending (nulls last, at most one
    * each — Spark's array_sort order) and duplicate-free; the shingle
    * verifiers guarantee that by sorting once per DOCUMENT, so millions
    * of candidate pairs pay only binary comparisons. */
  def countSorted(a: ArrayData, b: ArrayData): Int = {
    val an = a.numElements(); val bn = b.numElements()
    var i = 0; var k = 0; var cnt = 0
    while (i < an && k < bn) {
      if (a.isNullAt(i)) {
        // Nulls sort last and are distinct (at most one per side), so once
        // a side reaches its null the only remaining possible match is the
        // OTHER side's trailing null — test b's LAST slot, not its cursor,
        // or a=["x",null] ∩ b=[null] would miss the shared null.
        if (b.isNullAt(bn - 1)) cnt += 1
        i = an; k = bn
      } else if (b.isNullAt(k)) {
        if (a.isNullAt(an - 1)) cnt += 1
        i = an; k = bn
      } else {
        val c = a.getUTF8String(i).compareTo(b.getUTF8String(k))
        if (c == 0) { cnt += 1; i += 1; k += 1 }
        else if (c < 0) i += 1
        else k += 1
      }
    }
    cnt
  }
}

/** Merge-scan |A ∩ B| over SORTED distinct string arrays — the pair-hot
  * form of [[IntersectCount]]: the corpus pays one `array_sort` per
  * document, every candidate pair then intersects by pure binary
  * comparison (no per-pair HashSet build, no per-pair string hashing).
  * Callers own the sortedness contract; parity vs
  * `size(array_intersect)` on sorted inputs is spec-pinned. */
case class IntersectCountSorted(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "intersect_count_sorted"
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(StringType, _) => true
      case _                        => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two array<string> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    IntersectCountSortedHelper.countSorted(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.IntersectCountSortedHelper.countSorted($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object SetFunctions {
  import GraftBridge.{toColumn, toExpression}
  def intersectCount(a: Column, b: Column): Column =
    toColumn(IntersectCount(toExpression(a), toExpression(b)))
  def intersectCountSorted(a: Column, b: Column): Column =
    toColumn(IntersectCountSorted(toExpression(a), toExpression(b)))
}
