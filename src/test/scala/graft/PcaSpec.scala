package graft

import org.apache.spark.sql.functions._

import graft.ml.Pca

/** Power-iteration PCA: analytic recovery on an axis-dominant cloud,
  * bitwise partition-invariance, and the Pythagorean proj/resid
  * decomposition. */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  // a cloud with dominant variance along e1 (+ a constant shift so the
  // mean is non-trivial): x = (10t + 3, t', t'/2, 1) with small t', so
  // the top component must be ±e1 (up to tiny mixing)
  private def fixture = {
    val rows = (0 until 200).map { i =>
      val t = (i % 21 - 10) / 10.0          // [-1, 1]
      val s = ((i * 7) % 11 - 5) / 50.0     // small noise axis
      (i.toLong, Array((10 * t + 3).toFloat, s.toFloat, (s / 2).toFloat, 1f))
    }
    rows.toDF("vec_id", "embedding")
  }

  test("fit recovers the dominant axis and a centered mean") {
    val (n, m, v) = Pca.fit(fixture, dims = 4, iters = 10)
    assert(n == 200.0)
    // 9 full t-cycles are mean-zero; the 11-sample tail sums to -5.5, so
    // mean0 = 3 + 10 * (-5.5 / 200) = 2.725 exactly
    assert(math.abs(m(0) - 2.725) < 1e-9, s"mean0=${m(0)}")
    assert(math.abs(m(3) - 1.0) < 1e-9, s"mean3=${m(3)}")
    assert(math.abs(math.abs(v(0)) - 1.0) < 1e-3,
      s"component must align with e1: ${v.toSeq}")
    assert(math.abs(v(3)) < 1e-6, s"constant dim carries no variance: ${v(3)}")
  }

  test("fit is bitwise invariant to partitioning") {
    val a = Pca.fit(fixture.repartition(13), 4, 10)
    val b = Pca.fit(fixture.coalesce(1), 4, 10)
    (0 until 4).foreach { j =>
      assert(java.lang.Double.doubleToLongBits(a._3(j)) ==
        java.lang.Double.doubleToLongBits(b._3(j)),
        s"component[$j] differs: ${a._3(j)} vs ${b._3(j)}")
      assert(java.lang.Double.doubleToLongBits(a._2(j)) ==
        java.lang.Double.doubleToLongBits(b._2(j)),
        s"mean[$j] differs across partitionings")
    }
  }

  test("projection + residual decompose the centered norm (Pythagoras)") {
    val f = fixture
    val (_, m, v) = Pca.fit(f, 4, 10)
    // recompute unrounded proj/resid locally against the centered norms
    val rows = f.collect().map { r =>
      val e = r.getSeq[Float](1).toArray.map(_.toDouble)
      val c = e.indices.map(j => e(j) - m(j)).toArray
      val proj = c.indices.map(j => c(j) * v(j)).sum
      val resid2 = c.indices.map { j =>
        val rj = c(j) - proj * v(j); rj * rj
      }.sum
      val norm2 = c.map(x => x * x).sum
      (proj, resid2, norm2)
    }
    rows.foreach { case (proj, resid2, norm2) =>
      assert(math.abs(proj * proj + resid2 - norm2) < 1e-9,
        s"proj^2 + resid^2 must equal the centered norm^2")
    }
    // and the removal really strips the dominant variance: residuals are
    // bounded by the noise scale while projections span the t-range
    assert(rows.map(_._1).max > 5, "projections must span the main axis")
    assert(rows.map(r => math.sqrt(r._2)).max < 0.5,
      "residual norms must be noise-sized after removing the top component")
  }

  test("deflation: second component is orthogonal and captures axis 2") {
    val (_, _, u1, lam1, u2) = graft.ml.Pca.fit2(fixture, 4, 10)
    val dot = (0 until 4).map(j => u1(j) * u2(j)).sum
    assert(math.abs(dot) < 1e-6, s"u1.u2 = $dot must vanish")
    assert(lam1 > 30, s"lambda1 must carry the 10t axis variance: $lam1")
    // the fixture's second variance direction is the (s, s/2) noise plane
    // -> u2 concentrates on dims 1..2, not the main or constant axes
    assert(math.abs(u2(0)) < 1e-2 && math.abs(u2(3)) < 1e-6,
      s"u2 must avoid the main/constant axes: ${u2.toSeq}")
    assert(math.abs(u2(1)) > 0.8, s"u2 must align with the noise axis: ${u2.toSeq}")
    // projecting both out leaves almost nothing in this rank-2 cloud
    val out = graft.ml.Pca.fitProject2(fixture, 4, 10).collect()
    assert(out.forall(_.getAs[Double]("resid_norm") < 0.05),
      "rank-2 data must have near-zero residual after two components")
  }
}
