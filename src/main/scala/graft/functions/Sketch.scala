package graft.functions

import java.util.{TreeSet => JTreeSet}

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bottom-k distinct-string aggregate — the KMV (k-minimum-values)
  * distinct-count sketch (Bar-Yossef et al. 2002; the bottom-k variant of
  * Beyer et al. 2007) as a native Catalyst aggregate.
  *
  * State is a bounded sorted set of the k lexicographically smallest
  * DISTINCT input strings — O(k) per group regardless of cardinality,
  * partial-aggregated map-side and MERGEABLE by construction (union two
  * sketches, keep the k smallest): the property that lets a 100 TB lake
  * keep per-partition/per-day sketches and answer "distinct across any
  * combination" without rescanning. Fed md5(value) hex strings, the
  * k-th smallest hash estimates cardinality as (k−1)/unit(h_k) — and
  * because md5 is the shared cross-engine primitive, the ENTIRE sketch
  * (not just the estimate) is deterministic and DuckDB-replayable,
  * unlike HLL-style register sketches whose hash is engine-internal.
  */
case class BottomKSketch(child: Expression, k: Int,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[JTreeSet[String]] {

  require(k > 0, s"bottomK: k must be positive, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bottomK expects a string column, got ${t.simpleString}")
  }

  override def createAggregationBuffer(): JTreeSet[String] =
    new JTreeSet[String]()

  private def add(buf: JTreeSet[String], s: String): Unit = {
    if (buf.size < k) { buf.add(s); () }
    else if (s.compareTo(buf.last) < 0 && buf.add(s)) { buf.pollLast(); () }
  }

  override def update(buf: JTreeSet[String],
                      input: org.apache.spark.sql.catalyst.InternalRow)
      : JTreeSet[String] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(buf: JTreeSet[String],
                     other: JTreeSet[String]): JTreeSet[String] = {
    val it = other.iterator()
    while (it.hasNext) add(buf, it.next())
    buf
  }

  override def eval(buf: JTreeSet[String]): Any = {
    val out = new Array[Any](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = UTF8String.fromString(it.next()); i += 1 }
    new GenericArrayData(out) // ascending — TreeSet iteration order
  }

  override def serialize(buf: JTreeSet[String]): Array[Byte] = {
    val sb = new StringBuilder
    val it = buf.iterator()
    while (it.hasNext) { sb.append(it.next()); sb.append('\n') }
    sb.toString.getBytes("UTF-8")
  }

  override def deserialize(bytes: Array[Byte]): JTreeSet[String] = {
    val buf = new JTreeSet[String]()
    new String(bytes, "UTF-8").split("\n").foreach { s =>
      if (s.nonEmpty) buf.add(s)
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): BottomKSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BottomKSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(child = c.head)
  override def prettyName: String = "bottom_k"
}

/** Count-min sketch aggregate (Cormode & Muthukrishnan 2005) — approximate
  * per-key frequencies in O(depth·width) state no matter how many distinct
  * keys stream through: `depth` hash rows of `width` counters; each input
  * increments one counter per row; a key's estimate is the MIN of its
  * `depth` counters — never an under-count, over by collision mass only.
  *
  * Map-side partials and elementwise-sum merge make it the lake-scale
  * frequency primitive: per-partition/per-day sketches combine by addition
  * and answer "how often does key x appear across any slice" without
  * rescanning or holding the key universe. Row hashes are
  * `md5("r:" + value)` first-8-hex mod width — md5 is the shared
  * cross-engine primitive, so the whole sketch (not just the estimate)
  * replays in the DuckDB oracle. Counters are Longs; estimates are
  * integer-exact, no float drift anywhere.
  */
case class CountMinSketch(child: Expression, depth: Int, width: Int,
                          mutableAggBufferOffset: Int = 0,
                          inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(depth > 0 && width > 0,
    s"countMin: depth/width must be positive, got $depth×$width")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"countMin expects a string column, got ${t.simpleString}")
  }

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long],
                      input: org.apache.spark.sql.catalyst.InternalRow)
      : Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString
      var r = 0
      while (r < depth) {
        buf(r * width + Sketch.cmsBucket(r, s, width)) += 1L
        r += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = {
    val out = new Array[Any](buf.length)
    var i = 0
    while (i < buf.length) { out(i) = buf(i); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(o: Int): CountMinSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CountMinSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(child = c.head)
  override def prettyName: String = "count_min"
}

/** Bloom filter aggregate (Bloom 1970) — approximate set MEMBERSHIP in
  * O(bits) state no matter how many keys stream through: `hashes` bit
  * positions per input (the same md5 bucket family as [[CountMinSketch]],
  * so the filter replays cross-engine), membership = all positions set.
  * Never a false negative; false positives carry collision mass only.
  *
  * State is `bits/64` Long words; merge is bitwise OR — map-side partials
  * and order-free union make it the lake-scale membership primitive:
  * yesterday's crawl compresses to a broadcastable bit array and today's
  * crawl probes it map-side, where the exact answer would co-shuffle two
  * corpora. Positions are md5-derived ([[Sketch.cmsBucket]]), so the
  * ENTIRE filter — every set bit — is deterministic and DuckDB-replayable.
  */
case class BloomSketch(child: Expression, bits: Int, hashes: Int,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(bits > 0 && bits % 64 == 0,
    s"bloom: bits must be a positive multiple of 64, got $bits")
  require(hashes > 0, s"bloom: hashes must be positive, got $hashes")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bloom expects a string column, got ${t.simpleString}")
  }

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](bits / 64)

  override def update(buf: Array[Long],
                      input: org.apache.spark.sql.catalyst.InternalRow)
      : Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString
      var i = 0
      while (i < hashes) {
        val p = Sketch.cmsBucket(i, s, bits)
        buf(p >>> 6) |= (1L << (p & 63))
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) |= other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = {
    val out = new Array[Any](buf.length)
    var i = 0
    while (i < buf.length) { out(i) = buf(i); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(o: Int): BloomSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(child = c.head)
  override def prettyName: String = "bloom"
}

/** HyperLogLog registers (Flajolet et al. 2007) — approximate distinct
  * count in O(2^p) bytes no matter the cardinality: register j holds the
  * max leading-zero rank seen among inputs hashing to j. Merge is
  * elementwise max — order-free, idempotent, the mergeability that lets a
  * lake keep per-partition/per-day register arrays and answer "distinct
  * across any slice" by max-union, at 256 BYTES per sketch where KMV
  * holds k strings.
  *
  * Fed md5(value) HEX strings (the cross-engine primitive): register
  * index = the first p/4 hex chars, rank = leading zeros of the next
  * 48-bit field + 1. Every register is therefore integer-exact and
  * DuckDB-replayable — the "engine-internal hash" caveat that usually
  * makes HLL unverifiable does not apply. The estimate stays libm-free:
  * the harmonic sum folds 2^-M terms (each an exact double) in register
  * order and skips the ln()-based small-range correction, which keeps the
  * whole artifact bit-reproducible (the D51 log-free lesson applied to
  * cardinality).
  */
case class HllSketch(child: Expression, p: Int,
                     mutableAggBufferOffset: Int = 0,
                     inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  require(p >= 4 && p <= 16 && p % 4 == 0,
    s"hll: p must be a multiple of 4 in [4,16], got $p")
  private val m = 1 << p
  private val idxHex = p / 4

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hll expects an md5-hex string column, got ${t.simpleString}")
  }

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte],
                      input: org.apache.spark.sql.catalyst.InternalRow)
      : Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val hex = v.asInstanceOf[UTF8String].toString
      val idx = Integer.parseInt(hex.substring(0, idxHex), 16)
      // 48-bit field after the index chars; rank = its leading zeros + 1
      val w = java.lang.Long.parseLong(hex.substring(idxHex, idxHex + 12), 16)
      val rank =
        if (w == 0L) 49
        else java.lang.Long.numberOfLeadingZeros(w) - 16 + 1
      if (rank > buf(idx)) buf(idx) = rank.toByte
    }
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (other(i) > buf(i)) buf(i) = other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Byte]): Any = {
    val out = new Array[Any](m)
    var i = 0
    while (i < m) { out(i) = buf(i).toInt; i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf.clone()
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes.clone()

  override def withNewMutableAggBufferOffset(o: Int): HllSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(child = c.head)
  override def prettyName: String = "hll"
}

object Sketch {
  import GraftBridge.{toColumn, toExpression}

  /** Row-r bucket of a value: first 8 hex chars of md5("r:" + value) as a
    * 32-bit integer, mod width — the same computation the SQL estimate
    * side and the DuckDB oracle run from md5 strings. */
  private[functions] def cmsBucket(r: Int, s: String, width: Int): Int = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$r:$s".getBytes("UTF-8")).take(4)
      .map("%02x".format(_)).mkString
    (java.lang.Long.parseLong(hex, 16) % width).toInt
  }

  /** The k lexicographically smallest distinct values of a string column,
    * ascending — O(k) state, map-side partials, mergeable. */
  def bottomK(c: Column, k: Int): Column =
    toColumn(BottomKSketch(toExpression(c), k).toAggregateExpression())

  /** KMV cardinality estimate from a [[bottomK]] sketch of md5-hex
    * values: fewer than k hashes means the sketch IS the distinct set
    * (exact count); otherwise (k−1) / unit(h_k) with unit = the first 8
    * hex chars of the k-th smallest hash over 16⁸ — integer-exact
    * numerators and ONE double division, so the estimate is
    * bit-reproducible cross-engine. */
  def kmvEstimate(sketch: Column, k: Int): Column =
    when(size(sketch) < k, size(sketch).cast("double"))
      .otherwise(lit((k - 1).toDouble * 4294967296.0) /
        conv(substring(element_at(sketch, k), 1, 8), 16, 10).cast("double"))

  /** Count-min sketch of a string column: flat array<long> of depth·width
    * counters — map-side partials, merge = elementwise add. */
  def countMin(c: Column, depth: Int, width: Int): Column =
    toColumn(CountMinSketch(toExpression(c), depth, width)
      .toAggregateExpression())

  /** Bloom filter of a string column: array<long> of bits/64 words —
    * map-side partials, merge = bitwise OR. */
  def bloom(c: Column, bits: Int, hashes: Int): Column =
    toColumn(BloomSketch(toExpression(c), bits, hashes)
      .toAggregateExpression())

  /** HLL register array of an md5-hex string column: array<int> of 2^p
    * registers — map-side partials, merge = elementwise max. */
  def hll(c: Column, p: Int): Column =
    toColumn(HllSketch(toExpression(c), p).toAggregateExpression())

  /** Cardinality estimate from [[hll]] registers: the raw harmonic-mean
    * estimator alpha_m·m² / Σ_j 2^(−M_j), folded in register order with
    * each 2^−M term an EXACT double (1 / (1<<M) — no pow, no ln, no
    * small-range correction), so the estimate replays bit-for-bit
    * cross-engine. Bias at low fill shows up against the true count in
    * the artifact rather than being patched by libm. */
  def hllEstimate(registers: Column, p: Int): Column = {
    val m = 1 << p
    val alphaM2 = (0.7213 / (1.0 + 1.079 / m)) * (m.toDouble * m)
    val s = aggregate(registers, lit(0.0),
      (acc, r) => acc + lit(1.0) /
        call_function("shiftleft", lit(1L), r).cast("double"))
    lit(alphaM2) / s
  }

  /** Membership probe of `key` against a [[bloom]] filter: every one of
    * the `hashes` md5 positions set — column-only bit math (the position
    * is the same md5 fold the aggregate's update runs), integer-exact.
    * No false negatives by construction. */
  def bloomContains(filter: Column, key: Column, bits: Int,
                    hashes: Int): Column = {
    val checks = (0 until hashes).map { i =>
      val p = conv(substring(md5(concat(lit(s"$i:"), key)), 1, 8),
        16, 10).cast("long") % bits
      val word = element_at(filter,
        (shiftright(p, 6) + 1).cast("int"))
      call_function("shiftright", word, p.bitwiseAND(63L).cast("int"))
        .bitwiseAND(1L) === 1L
    }
    checks.reduce(_ && _)
  }

  /** Frequency estimate of `key` from a [[countMin]] sketch: min over the
    * depth rows of the key's counter — column-only math (the bucket is the
    * same md5 fold the aggregate's update runs), integer-exact. */
  def cmsEstimate(sketch: Column, key: Column, depth: Int,
                  width: Int): Column = {
    val cells = (0 until depth).map { r =>
      val bucket = conv(substring(md5(concat(lit(s"$r:"), key)), 1, 8),
        16, 10).cast("long") % width
      element_at(sketch, (lit(r * width) + bucket + 1).cast("int"))
    }
    least(cells: _*)
  }
}
