package graft

import org.apache.spark.sql.functions._

import graft.functions.Sketch

/** KMV bottom-k sketch invariants the oracle gate can't see: boundedness,
  * distinctness, merge behavior across partitions, and estimate accuracy.
  */
class SketchSpec extends SparkSpec {

  private def sketchOf(values: Seq[String], k: Int, parts: Int = 8): Seq[String] = {
    import spark.implicits._
    values.toDF("v").repartition(parts)
      .agg(Sketch.bottomK(col("v"), k).as("sk"))
      .as[Seq[String]].head()
  }

  test("bottomK: the k lexicographically smallest distinct values, ascending") {
    val vs = Seq("d", "b", "e", "a", "c", "f")
    assert(sketchOf(vs, 3) == Seq("a", "b", "c"))
  }

  test("bottomK: duplicates never inflate the sketch") {
    val vs = Seq.fill(100)("a") ++ Seq.fill(100)("b") ++ Seq("c", "d")
    assert(sketchOf(vs, 3) == Seq("a", "b", "c"))
  }

  test("bottomK: fewer than k distinct values IS the distinct set") {
    assert(sketchOf(Seq("b", "a", "b", "a"), 10) == Seq("a", "b"))
  }

  test("bottomK: partition-split merge equals single-partition result") {
    val vs = (1 to 500).map(i => f"v$i%04d")
    assert(sketchOf(vs, 32, parts = 16) == sketchOf(vs, 32, parts = 1))
  }

  test("kmvEstimate: exact when the sketch holds every distinct value") {
    import spark.implicits._
    val est = (1 to 40).map(_.toString).toDF("v")
      .agg(Sketch.bottomK(md5(col("v")), 64).as("sk"))
      .select(Sketch.kmvEstimate(col("sk"), 64)).as[Double].head()
    assert(est == 40.0)
  }

  test("kmvEstimate: within 30% of true cardinality at k=64 over 10k hashes") {
    import spark.implicits._
    val n = 10000
    val est = (1 to n).map(_.toString).toDF("v").repartition(8)
      .agg(Sketch.bottomK(md5(col("v")), 64).as("sk"))
      .select(Sketch.kmvEstimate(col("sk"), 64)).as[Double].head()
    // KMV stderr ~ 1/sqrt(k-2) ≈ 12.7% at k=64; 30% is a 2.4-sigma bound.
    assert(math.abs(est - n) / n < 0.30, s"estimate $est vs true $n")
  }

  // ---- count-min ----

  private def cms(values: Seq[String], depth: Int, width: Int,
                  parts: Int = 8): Seq[Long] = {
    import spark.implicits._
    values.toDF("v").repartition(parts)
      .agg(Sketch.countMin(col("v"), depth, width).as("sk"))
      .as[Seq[Long]].head()
  }

  test("countMin: total mass per row equals the input count") {
    val vs = (1 to 300).map(i => s"k${i % 37}")
    val sk = cms(vs, depth = 4, width = 64)
    assert(sk.length == 4 * 64)
    (0 until 4).foreach { r =>
      assert(sk.slice(r * 64, (r + 1) * 64).sum == 300L,
        s"row $r mass must equal the stream length")
    }
  }

  test("countMin: partition-split merge equals single-partition sketch") {
    val vs = (1 to 500).map(i => s"v${i % 91}")
    assert(cms(vs, 4, 128, parts = 16) == cms(vs, 4, 128, parts = 1))
  }

  test("cmsEstimate: never under-counts, exact when collision-free") {
    import spark.implicits._
    val vs = Seq.fill(40)("hot") ++ (1 to 60).map(i => s"cold$i")
    val df = vs.toDF("v")
    val sk = df.agg(Sketch.countMin(col("v"), 4, 1024).as("sk"))
    val ests = df.distinct()
      .crossJoin(broadcast(sk))
      .select(col("v"),
        Sketch.cmsEstimate(col("sk"), col("v"), 4, 1024).as("est"))
      .as[(String, Long)].collect().toMap
    val truth = vs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    truth.foreach { case (k, t) =>
      assert(ests(k) >= t, s"$k: est ${ests(k)} under true $t")
    }
    // 61 keys in 4 rows of 1024 buckets: collisions are overwhelmingly
    // unlikely to hit the SAME key in all 4 rows, so min = exact
    assert(ests("hot") == 40L)
  }

  test("cmsEstimate: error bounded by collision mass (eps·N at 2/width)") {
    import spark.implicits._
    val n = 5000
    val vs = (1 to n).map(i => s"t${i % 700}")
    val df = vs.toDF("v")
    val sk = df.agg(Sketch.countMin(col("v"), 4, 256).as("sk"))
    val worst = df.groupBy("v").agg(count(lit(1)).as("t"))
      .crossJoin(broadcast(sk))
      .select((Sketch.cmsEstimate(col("sk"), col("v"), 4, 256) - col("t"))
        .as("err"))
      .agg(max("err")).as[Long].head()
    // CM guarantee: err ≤ e·N/width w.p. 1−e^-depth; 2·N/width is looser
    // than the Markov bound and deterministic data keeps it comfortably
    assert(worst >= 0 && worst <= 2L * n / 256,
      s"max over-count $worst exceeds 2N/w = ${2L * n / 256}")
  }

  // ---- bloom ----

  private def bloomOf(values: Seq[String], bits: Int, hashes: Int,
                      parts: Int = 8): Seq[Long] = {
    import spark.implicits._
    values.toDF("v").repartition(parts)
      .agg(Sketch.bloom(col("v"), bits, hashes).as("bf"))
      .as[Seq[Long]].head()
  }

  private def probeAll(filter: Seq[Long], keys: Seq[String], bits: Int,
                       hashes: Int): Map[String, Boolean] = {
    import spark.implicits._
    keys.toDF("k")
      .select(col("k"), Sketch.bloomContains(typedlit(filter), col("k"),
        bits, hashes).as("hit"))
      .as[(String, Boolean)].collect().toMap
  }

  test("bloom: no false negatives — every inserted key probes true") {
    val vs = (1 to 500).map(i => s"key$i")
    val bf = bloomOf(vs, bits = 65536, hashes = 3)
    val hits = probeAll(bf, vs, 65536, 3)
    assert(hits.values.forall(identity), "an inserted key probed false")
  }

  test("bloom: partition-split merge (bitwise OR) equals single partition") {
    val vs = (1 to 800).map(i => s"v$i")
    assert(bloomOf(vs, 4096, 3, parts = 16) == bloomOf(vs, 4096, 3, parts = 1))
  }

  test("bloom: set bits are exactly the md5 positions a driver recompute derives") {
    val vs = (1 to 100).map(i => s"x$i")
    val bf = bloomOf(vs, 4096, 3)
    val words = new Array[Long](4096 / 64)
    for (v <- vs; i <- 0 until 3) {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$i:$v".getBytes("UTF-8")).take(4)
        .map("%02x".format(_)).mkString
      val p = (java.lang.Long.parseLong(hex, 16) % 4096).toInt
      words(p >>> 6) |= (1L << (p & 63))
    }
    assert(bf == words.toSeq)
  }

  test("bloom: false-positive rate tracks the (1-e^{-kn/m})^k model") {
    val inserted = (1 to 2000).map(i => s"in$i")
    val absent = (1 to 2000).map(i => s"out$i")
    val (bits, hashes) = (16384, 3)
    val bf = bloomOf(inserted, bits, hashes)
    val fp = probeAll(bf, absent, bits, hashes).values.count(identity)
    // load kn/m = 0.366 → p = (1-e^-0.366)^3 ≈ 0.029; 3x headroom
    assert(fp > 0 && fp < 2000 * 0.09, s"fp=$fp outside (0, 180)")
  }

  test("bottomK md5(id):value keys = a COORDINATED sample: membership " +
    "depends on the id hash only") {
    import spark.implicits._
    val df = (1 to 1000).map(i => (i.toLong, i * 3L, s"s${i % 7}"))
      .toDF("id", "metric", "tag")
    def sampleIds(valueCol: String): Set[String] =
      df.agg(Sketch.bottomK(concat_ws(":",
          md5(col("id").cast("string")), col(valueCol).cast("string")), 50)
          .as("sk"))
        .as[Seq[String]].head()
        .map(_.split(":")(0)).toSet
    // two different payload columns, same 50 sampled rows
    assert(sampleIds("metric") == sampleIds("tag"))
  }

  private def hllRegs(df: org.apache.spark.sql.DataFrame): Seq[Int] = {
    import spark.implicits._
    df.agg(Sketch.hll(md5(col("v")), 8).as("rs")).as[Seq[Int]].head()
  }

  test("hll: partition-split merge equals single-partition registers") {
    import spark.implicits._
    val vs = (1 to 5000).map(i => s"v$i")
    val one = hllRegs(vs.toDF("v").repartition(1))
    val many = hllRegs(vs.toDF("v").repartition(16))
    assert(one == many)
  }

  test("hll: per-slice max-union equals the whole-stream sketch") {
    import spark.implicits._
    val a = (1 to 3000).map(i => s"v$i")   // overlapping slices —
    val b = (2000 to 5000).map(i => s"v$i") // idempotent max-union
    val regA = hllRegs(a.toDF("v"))
    val regB = hllRegs(b.toDF("v"))
    val whole = hllRegs((a ++ b).toDF("v"))
    assert(regA.zip(regB).map { case (x, y) => math.max(x, y) } == whole)
  }

  test("hll: duplicates never move a register") {
    import spark.implicits._
    val once = hllRegs((1 to 500).map(i => s"v$i").toDF("v"))
    val dup = hllRegs(((1 to 500) ++ (1 to 500)).map(i => s"v$i").toDF("v"))
    assert(once == dup)
  }

  test("hllEstimate: within 10% of true cardinality at p=8 over 10k values") {
    import spark.implicits._
    val n = 10000
    val est = (1 to n).map(i => s"v$i").toDF("v")
      .agg(Sketch.hllEstimate(Sketch.hll(md5(col("v")), 8), 8).as("e"))
      .head().getDouble(0)
    // std error ≈ 1.04/sqrt(256) = 6.5%
    assert(math.abs(est - n) < n * 0.10, s"est=$est vs true=$n")
  }
}
