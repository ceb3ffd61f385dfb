package graft

import org.apache.spark.sql.functions._

import graft.ml.BoostProbe
import graft.ml.TreeProbe.bin

/** Boosted regression trees: fixture recovery, bitwise
  * partition-invariance, and monotone training progress. */
class BoostProbeSpec extends SparkSpec {
  import spark.implicits._

  // y is a 2-level step in x1 with a smaller step in x2 — one depth-2
  // tree can't capture it exactly, three boosted rounds get close
  private def fixture = {
    val rows = for (i <- 0 until 16; j <- 0 until 16) yield {
      val x1 = i / 16.0; val x2 = j / 16.0
      val y = (if (x1 >= 0.5) 1.0 else 0.0) + (if (x2 >= 0.75) 0.5 else 0.0)
      (i * 16 + j, x1, x2, y)
    }
    rows.toDF("id", "x1", "x2", "y")
  }

  private def withBins(df: org.apache.spark.sql.DataFrame, k: Int) =
    (1 to k).foldLeft(df)((d, i) => d.withColumn(s"_b$i", bin(col(s"x$i"))))

  private def mse(df: org.apache.spark.sql.DataFrame, rounds: Int): Double = {
    val base = withBins(fixture, 2)
    val (f0, trees) = BoostProbe.fit(base, 2, "y", depth = 2,
      rounds = rounds, nu = 0.5)
    var pred: org.apache.spark.sql.Column = lit(f0)
    trees.foreach { t =>
      pred = pred + lit(0.5) * BoostProbe.valueCol(t, BoostProbe.leafFromBins(t, 2))
    }
    base.select(avg(pow(col("y") - pred, 2.0))).head().getDouble(0)
  }

  test("r14 derived leaf values equal the direct final-node aggregate") {
    val feats = graft.ml.RidgeProbe.qualityFeatures(
      graft.core.Tables.documents(spark, sfDir))
    val base = (1 to 3).foldLeft(feats)((d, i) =>
      d.withColumn(s"_b$i", bin(col(s"x$i")))).persist()
    val (f0, trees) = BoostProbe.fit(base, 3, "y", depth = 2,
      rounds = 3, nu = 0.5)
    var r: org.apache.spark.sql.Column = col("y") - lit(f0)
    trees.foreach { t =>
      // the pre-r14 separate pass: aggregate (count, decimal Σr) by the
      // FINAL leaf and divide — must equal the histogram-derived values
      val leaf = BoostProbe.leafFromBins(t, 2)
      val direct = base.withColumn("_node", leaf)
        .groupBy("_node")
        .agg(count(lit(1)).as("n"),
          sum(r.cast("decimal(38,10)")).as("s"))
        .collect()
        .map(x => x.getInt(0) ->
          x.getAs[java.math.BigDecimal]("s").doubleValue / x.getLong(1).toDouble)
        .toMap
      assert(t.leafVal == direct, s"derived leafVal diverges: ${t.leafVal} vs $direct")
      r = r - lit(0.5) * BoostProbe.valueCol(t, leaf)
    }
    base.unpersist(false)
  }

  test("boosting reduces training MSE monotonically over rounds") {
    val e = (1 to 4).map(m => mse(fixture, m))
    assert(e.zip(e.tail).forall { case (a, b) => b <= a + 1e-12 },
      s"MSE must not increase: $e")
    assert(e.last < 0.03, s"4 rounds should nearly fit the step mix: ${e.last}")
  }

  test("ensemble is bit-identical under repartitioning (decimal residual histograms)") {
    val base13 = withBins(fixture.repartition(13), 2)
    val base1 = withBins(fixture.coalesce(1), 2)
    val (f0a, ta) = BoostProbe.fit(base13, 2, "y", 2, 3, 0.5)
    val (f0b, tb) = BoostProbe.fit(base1, 2, "y", 2, 3, 0.5)
    assert(java.lang.Double.doubleToLongBits(f0a) ==
      java.lang.Double.doubleToLongBits(f0b))
    assert(ta.map(_.splits) == tb.map(_.splits))
    ta.zip(tb).foreach { case (x, y) =>
      assert(x.leafVal.keySet == y.leafVal.keySet)
      x.leafVal.foreach { case (n, v) =>
        assert(java.lang.Double.doubleToLongBits(v) ==
          java.lang.Double.doubleToLongBits(y.leafVal(n)),
          s"leaf $n value differs: $v vs ${y.leafVal(n)}")
      }
    }
  }

  test("round-1 tree splits on the dominant step and its leaf means are residual means") {
    val base = withBins(fixture, 2)
    val (f0, trees) = BoostProbe.fit(base, 2, "y", depth = 1, rounds = 1, nu = 1.0)
    val t = trees.head
    val root = t.splits.find(_.node == 1).get
    assert(root.f == 1 && root.t == 3, s"dominant step is x1 at bin 3: $root")
    // left leaf: y ∈ {0, 0.5} (mean 0.125), right: y ∈ {1, 1.5} (mean 1.125)
    assert(math.abs(t.leafVal(2) - (0.125 - f0)) < 1e-9)
    assert(math.abs(t.leafVal(3) - (1.125 - f0)) < 1e-9)
  }
}
