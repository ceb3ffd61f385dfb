package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The 64 SimHash sign sums in ONE aggregate: for each input row's 64-hex
  * digest string, adds +1 to sum i when hex digit i ≥ '8' and −1
  * otherwise — numerically EXACTLY the 64 separate
  * `sum(when(substring(_h, i, 1) >= "8", 1).otherwise(-1))` columns it
  * replaces (long adds, order-free, partition-invariant), so the D79
  * signature bits and the DuckDB oracle are unchanged.
  *
  * Why it exists (the VecESum lesson applied to the SimHash signature):
  * the 64-aggregate HashAggregate made Catalyst analyze and janino-compile
  * a ~64-expression stage per QUERY — measured ~4 s of planning against
  * ~1 s of execution at sf0.1 in every banded-SimHash consumer
  * (dedup_simhash_band / _online / the ensemble twins / the E18 streams).
  * One imperative aggregate keeps the plan a single expression, and the
  * per-row update is one pass over the digest's 64 bytes instead of 64
  * codegen'd substring+compare chains. Rows whose digest is NULL or
  * shorter than 64 chars contribute only their present digits (the
  * substring form yielded NULL ≥ '8' = false → −1 there; unreachable from
  * the md5‖md5 producer, whose digests are always exactly 64 hex chars —
  * DedupSpec pins producer-shaped parity).
  */
case class SimHashSums(child: Expression,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash_sums expects string, got ${t.simpleString}")
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val bytes = v.asInstanceOf[UTF8String].getBytes
      val n = math.min(64, bytes.length)
      var i = 0
      while (i < n) {
        buf(i) += (if (bytes(i) >= '8') 1L else -1L)
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < 64) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(buf.map(java.lang.Long.valueOf): Array[Any])

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(64 * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(64)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(o: Int): SimHashSums =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SimHashSums =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(child = c.head)
  override def prettyName: String = "simhash_sums"
}
