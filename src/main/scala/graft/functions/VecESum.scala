package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Exact element-wise sum of an `array<double>` column, one aggregate for
  * all `dims` coordinates — the vector-moment primitive the PCA fits use.
  *
  * Numerically this is EXACTLY `dims` parallel [[graft.core.Exact.esum]]
  * columns: each element is converted by the same path Spark's
  * double→DECIMAL(38,10) cast takes (`BigDecimal(Double.toString(x))`
  * rescaled HALF_UP to 10 — [[update]] calls the identical Java API), the
  * sums are exact decimal additions (order-free, partition-invariant),
  * and [[eval]] widens back to double like the decimal→double cast. The
  * DuckDB oracle mirror is therefore unchanged:
  * `CAST(sum(CAST(x AS DECIMAL(38,10))) AS DOUBLE)` per element.
  *
  * Why it exists: a 64-column decimal-sum aggregate makes Catalyst
  * analyze and janino-compile a fresh 64-aggregate stage per POWER
  * ITERATION (every pass has new literals, so nothing caches) — ~0.5 s of
  * planning per pass against ~0 s of actual work at bench scale. One
  * imperative aggregate keeps the plan a single expression; the fits
  * dropped from ~6 s to ~2 s at sf0.1 while producing bit-identical
  * results (the oracle gate re-proved all three PCA queries after the
  * switch).
  */
case class VecESum(child: Expression, dims: Int,
                   mutableAggBufferOffset: Int = 0,
                   inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[JBigDecimal]] {

  require(dims > 0, s"vec_esum: dims must be positive, got $dims")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"vec_esum expects array<double>, got ${t.simpleString}")
  }

  override def createAggregationBuffer(): Array[JBigDecimal] =
    Array.fill(dims)(JBigDecimal.ZERO)

  override def update(buf: Array[JBigDecimal],
                      input: InternalRow): Array[JBigDecimal] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = math.min(dims, arr.numElements())
      var i = 0
      while (i < n) {
        // the exact double->DECIMAL(38,10) cast path: shortest-repr
        // BigDecimal, HALF_UP rescale; non-finite values cast to NULL
        // there and the sum skips them — mirror that instead of letting
        // BigDecimal(Double.toString(NaN)) throw
        val x = arr.getDouble(i)
        if (java.lang.Double.isFinite(x)) {
          val d = new JBigDecimal(java.lang.Double.toString(x))
            .setScale(10, RoundingMode.HALF_UP)
          buf(i) = buf(i).add(d)
        }
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[JBigDecimal],
                     other: Array[JBigDecimal]): Array[JBigDecimal] = {
    var i = 0
    while (i < dims) { buf(i) = buf(i).add(other(i)); i += 1 }
    buf
  }

  override def eval(buf: Array[JBigDecimal]): Any = {
    val out = new Array[Any](dims)
    var i = 0
    while (i < dims) { out(i) = buf(i).doubleValue(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[JBigDecimal]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(dims)
    buf.foreach { d =>
      val s = d.toPlainString
      out.writeUTF(s)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[JBigDecimal] = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    Array.fill(n)(new JBigDecimal(in.readUTF()))
  }

  override def withNewMutableAggBufferOffset(o: Int): VecESum =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VecESum =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(child = c.head)
  override def prettyName: String = "vec_esum"
}
