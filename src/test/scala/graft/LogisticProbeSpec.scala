package graft

import org.apache.spark.sql.functions._

import graft.ml.LogisticProbe

/** Fixed-iteration GD logistic probe: separation on linear data, bitwise
  * partition-invariance (the hash-oracle property), sigmoid bounds, and
  * training progress. */
class LogisticProbeSpec extends SparkSpec {
  import spark.implicits._

  // label = 1 iff x1 + x2 >= 1 — linearly separable on the bin grid
  private def separable = {
    val rows = for (i <- 0 until 32; j <- 0 until 32) yield {
      val x1 = i / 32.0; val x2 = j / 32.0
      (i * 32 + j, x1, x2, if (x1 + x2 >= 1.0) 1.0 else 0.0)
    }
    rows.toDF("id", "x1", "x2", "y")
  }

  test("sigmoid is algebraic, bounded and monotone") {
    val z = Seq(-100.0, -1.0, 0.0, 1.0, 100.0).toDF("z")
      .select(LogisticProbe.sigmoid(col("z")).as("s")).collect().map(_.getDouble(0))
    assert(z.forall(s => s > 0.0 && s < 1.0), z.mkString(","))
    assert(z.sameElements(z.sorted), "sigmoid must be monotone")
    assert(z(2) == 0.5, "σ(0) must be exactly 0.5")
  }

  test("GD separates a linear label well above the majority baseline") {
    val out = LogisticProbe.fitScore(separable, Seq("x1", "x2"), "y",
      lr = 4.0, iters = 12, threshold = 0.5)
    val n = out.count().toDouble
    val acc = out.filter((col("score") >= 0.5) === (col("y") === 1.0))
      .count() / n
    assert(acc > 0.8, f"expected >80%% accuracy on separable data, got $acc%.3f")
  }

  test("fitted weights are bit-identical under repartitioning") {
    val f = separable
    val a = LogisticProbe.fit(f.repartition(13), Seq("x1", "x2"), "y", 4.0, 12)
    val b = LogisticProbe.fit(f.coalesce(1), Seq("x1", "x2"), "y", 4.0, 12)
    a.indices.foreach { i =>
      assert(java.lang.Double.doubleToLongBits(a(i)) ==
        java.lang.Double.doubleToLongBits(b(i)),
        s"w$i differs across partitionings: ${a(i)} vs ${b(i)}")
    }
  }

  test("more iterations reduce logistic error on the training set") {
    val f = separable
    def sqErr(iters: Int): Double = {
      val w = LogisticProbe.fit(f, Seq("x1", "x2"), "y", 4.0, iters)
      val z = lit(w(0)) + lit(w(1)) * col("x1") + lit(w(2)) * col("x2")
      f.select(avg(pow(LogisticProbe.sigmoid(z) - col("y"), 2.0)))
        .head().getDouble(0)
    }
    assert(sqErr(8) < sqErr(1), "training must make progress from w=0")
  }

  test("train curve: ln2 at the zero init, loss falls, snapshots pinned") {
    import spark.implicits._
    val rng = new scala.util.Random(3)
    val feats = (0 until 400).map { i =>
      val x1 = rng.nextDouble(); val x2 = rng.nextDouble()
      (i.toLong, x1, x2, if (x1 - x2 > 0) 1.0 else 0.0)
    }.toDF("id", "x1", "x2", "y")
    val c = graft.ml.LogisticProbe.trainCurve(feats, Seq("x1", "x2"), "y",
        lr = 4.0, iters = 8)
      .collect().map(r => r.getAs[Int]("iter") -> r).toMap
    assert(c.size == 9, "one row per snapshot incl. the zero init")
    // w = 0 → σ ≡ 0.5 → log-loss is exactly ln 2 on the rnd4 grid
    val it0 = c(0)
    assert(it0.getAs[Double]("w0") == 0.0 && it0.getAs[Double]("w1") == 0.0)
    assert(it0.getAs[Double]("loss") ==
      math.floor(math.log(2.0) * 10000 + 0.5) / 10000)
    // training makes progress: final loss below init, accuracy above
    assert(c(8).getAs[Double]("loss") < it0.getAs[Double]("loss"))
    assert(c(8).getAs[Double]("acc") > 0.7)
    // snapshots equal the stepwise fit at every iteration
    var w: Seq[Double] = Vector.fill(3)(0.0)
    for (t <- 1 to 8) {
      w = graft.ml.LogisticProbe.step(feats, Seq("x1", "x2"), "y", 4.0, w)
      val row = c(t)
      w.indices.foreach { i =>
        assert(row.getAs[Double](s"w$i") ==
          math.floor(w(i) * 10000 + 0.5) / 10000, s"iter $t w$i")
      }
    }
  }
}
