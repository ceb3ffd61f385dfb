package graft

import org.apache.spark.sql.functions._

import graft.ml.RidgeProbe

/** Closed-form ridge trainer: recovery on exactly-linear data, bitwise
  * order-independence (the decimal-moment property the hash oracle rests
  * on), and the fit+score contract. */
class RidgeProbeSpec extends SparkSpec {
  import spark.implicits._

  private def linearFixture = {
    // y = 2 + 3·x1 − 1·x2 exactly; x grids chosen so every value (and
    // every product) is a short binary fraction — no representation noise
    val rows = for (i <- 0 until 64; j <- 0 until 8) yield {
      val x1 = i / 16.0; val x2 = j / 4.0
      (s"d$i-$j", x1, x2, 2.0 + 3.0 * x1 - 1.0 * x2)
    }
    rows.toDF("id", "x1", "x2", "y")
  }

  test("fit recovers exact linear weights (lambda -> 0 limit)") {
    val w = RidgeProbe.fit(linearFixture, Seq("x1", "x2"), "y", 1e-9)
      .head()
    assert(math.abs(w.getDouble(0) - 2.0) < 1e-6, s"w0=${w.getDouble(0)}")
    assert(math.abs(w.getDouble(1) - 3.0) < 1e-6, s"w1=${w.getDouble(1)}")
    assert(math.abs(w.getDouble(2) + 1.0) < 1e-6, s"w2=${w.getDouble(2)}")
  }

  test("weights are bit-identical under repartitioning (decimal moments)") {
    val f = linearFixture
    val a = RidgeProbe.fit(f.repartition(13), Seq("x1", "x2"), "y", 0.01).head()
    val b = RidgeProbe.fit(f.coalesce(1), Seq("x1", "x2"), "y", 0.01).head()
    (0 to 2).foreach { i =>
      assert(java.lang.Double.doubleToLongBits(a.getDouble(i)) ==
        java.lang.Double.doubleToLongBits(b.getDouble(i)),
        s"w$i differs across partitionings: ${a.getDouble(i)} vs ${b.getDouble(i)}")
    }
  }

  test("ridge shrinks toward zero as lambda grows") {
    val f = linearFixture
    def norm(lambda: Double): Double = {
      val w = RidgeProbe.fit(f, Seq("x1", "x2"), "y", lambda).head()
      (0 to 2).map(i => w.getDouble(i) * w.getDouble(i)).sum
    }
    assert(norm(1000.0) < norm(1.0) && norm(1.0) < norm(1e-6),
      "weight norm must decrease monotonically in lambda")
  }

  test("fitScore: threshold verdict on the rnd4 grid, weights ride along") {
    val f = linearFixture.withColumn("y",
      when(col("y") >= 3.0, 1.0).otherwise(0.0))
    val out = RidgeProbe.fitScore(f, Seq("x1", "x2"), "y", 0.001, 0.5)
    assert(out.columns.toSeq ==
      Seq("id", "x1", "x2", "y", "w0", "w1", "w2", "score", "kept"))
    val rows = out.collect()
    assert(rows.length == 64 * 8)
    // the probe must actually separate most of a linearly-generated label
    val acc = rows.count(r =>
      (r.getAs[Boolean]("kept") && r.getAs[Double]("y") == 1.0) ||
      (!r.getAs[Boolean]("kept") && r.getAs[Double]("y") == 0.0)
    ).toDouble / rows.length
    assert(acc >= 0.9, s"probe accuracy $acc on a separable label")
  }

  test("feature-count guard: >3 features is rejected") {
    val f = linearFixture.withColumn("x3", col("x1"))
      .withColumn("x4", col("x2"))
    intercept[IllegalArgumentException] {
      RidgeProbe.fit(f, Seq("x1", "x2", "x3", "x4"), "y", 0.1)
    }
  }
}
