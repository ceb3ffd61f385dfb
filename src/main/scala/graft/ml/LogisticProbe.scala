package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.Exact

/** Logistic-regression probe trained by fixed-iteration batch gradient
  * descent — the hash-verifiable twin of the classic hashed/featurized
  * LR quality classifier (the GPT-3/CCNet-style curation filter), built
  * on the same playbook as [[RidgeProbe]] (closed form) and the seeded
  * k-means: every data-dependent step is arithmetic both engines
  * reproduce bit-for-bit, and the oracle generator REPLAYS the whole
  * training as unrolled SQL.
  *
  * Determinism pins:
  *  - the sigmoid is ALGEBRAIC — σ(z) = 0.5 + z/(2·(1+|z|)) — so scoring
  *    uses only +,·,/,abs: no libm `exp`, whose last-bit behavior differs
  *    between the JVM and DuckDB (the HLL estimate made the same move);
  *  - per-iteration gradients are decimal-exact sums ([[Exact.esum]]), so
  *    they are independent of row order and partitioning;
  *  - the update `w − lr·(g/n)` is one IEEE expression, mirrored
  *    operation-for-operation.
  *
  * Scale shape: each of the `iters` iterations is ONE scan with a
  * map-side partial aggregation collapsing to a k+2-double row (gradient
  * + count) — no data-row shuffle, no broadcast join; weights travel as
  * plan literals. Scoring is a zero-shuffle literal map that applies to a
  * batch scan or an ingest stream unchanged. At 100 TB you would fit on a
  * sample or feature sketch; the per-iteration cost here is the same
  * one-pass moment shape as the standardizer.
  */
object LogisticProbe {

  /** σ(z) = 0.5 + z/(2·(1+|z|)) — smooth, (0,1), libm-free.
    * DuckDB mirror: 0.5 + z / (2.0 * (1.0 + abs(z))). */
  def sigmoid(z: Column): Column =
    lit(0.5) + z / (lit(2.0) * (lit(1.0) + abs(z)))

  private def zCol(xs: Seq[String], w: Seq[Double]): Column =
    xs.zipWithIndex.foldLeft(lit(w(0)): Column) {
      case (acc, (c, i)) => acc + lit(w(i + 1)) * col(c)
    }

  /** Fit by `iters` full-batch GD steps from w = 0. Each step is one
    * decimal-exact gradient aggregation; weights come back as plain
    * doubles (plan literals for the next pass). */
  def fit(feats: DataFrame, xs: Seq[String], yCol: String,
          lr: Double, iters: Int): Seq[Double] = {
    var w: Seq[Double] = Vector.fill(xs.size + 1)(0.0)
    for (_ <- 0 until iters) w = step(feats, xs, yCol, lr, w)
    w
  }

  /** One mini-batch GD step from weights `w` over `batch` — the unit the
    * batch loop ([[fit]]) and a foreachBatch STREAM trainer (E16) share:
    * same gradient aggregation, same update arithmetic, so an ordered
    * micro-batched pass lands on the identical weights as a driver loop
    * over the same chunks. Returns `w` unchanged on an empty batch. */
  def step(batch: DataFrame, xs: Seq[String], yCol: String,
           lr: Double, w: Seq[Double]): Seq[Double] = {
    val k = xs.size
    // The iteration's weights ride in as a broadcast ONE-ROW table, not
    // as plan literals: literal doubles are baked into the generated
    // source text, so every GD iteration used to force a fresh janino
    // compile of the gradient stage (a fixed ~0.2 s per step that
    // dominates the 12-iteration fits at bench scale). As row values the
    // generated code is IDENTICAL across iterations — one compile per
    // query, cache hits thereafter. The per-row arithmetic is unchanged
    // (same doubles, same operation order: w0 + Σ wᵢ·xᵢ), so the fitted
    // weights are bit-identical; LogisticProbeSpec pins the trajectory.
    val spark = batch.sparkSession
    val wDf = spark.createDataFrame(
      java.util.Collections.singletonList(
        org.apache.spark.sql.Row(w: _*)),
      org.apache.spark.sql.types.StructType((0 to k).map(i =>
        org.apache.spark.sql.types.StructField(s"_gw$i",
          org.apache.spark.sql.types.DoubleType, nullable = false))))
    val zc = xs.zipWithIndex.foldLeft(col("_gw0"): Column) {
      case (acc, (c, i)) => acc + col(s"_gw${i + 1}") * col(c)
    }
    val sg = sigmoid(zc)
    val err = sg - col(yCol)
    val aggs = (lit(1.0) +: xs.map(col)).zipWithIndex.map {
      case (x, i) => Exact.esum(err * x).as(s"g$i")
    } :+ count(lit(1)).as("n")
    val row = batch.crossJoin(broadcast(wDf))
      .agg(aggs.head, aggs.tail: _*).head()
    val n = row.getLong(k + 1)
    if (n == 0) w
    else w.indices.map(i => w(i) - lr * (row.getDouble(i) / n))
  }

  /** Fit + score in one plan: per-row rnd4(σ(z)) under the FITTED literal
    * weights, keep-verdict at `threshold`, rnd4'd weights riding along so
    * the hash gate pins the TRAINING. */
  def fitScore(feats: DataFrame, xs: Seq[String], yCol: String,
               lr: Double, iters: Int, threshold: Double): DataFrame = {
    feats.persist()
    val out = scoreWithWeights(feats, xs, yCol,
      fit(feats, xs, yCol, lr, iters), threshold)
    feats.unpersist(false)
    out
  }

  /** Score with FITTED weights as plan literals — the scoring half of
    * [[fitScore]], shared with the E16 stream trainer so the verdicts
    * under stream-trained weights ride the identical DAG. */
  def scoreWithWeights(feats: DataFrame, xs: Seq[String], yCol: String,
                       w: Seq[Double], threshold: Double): DataFrame = {
    val scored = feats
      .withColumn("score", Exact.rnd4(sigmoid(zCol(xs, w))))
      .withColumn("kept", col("score") >= threshold)
    w.indices.foldLeft(scored) { (df, i) =>
      df.withColumn(s"w$i", Exact.rnd4(lit(w(i))))
    }.select((Seq(col(feats.columns.head)) ++ xs.map(col) ++
      Seq(col(yCol)) ++ w.indices.map(i => col(s"w$i")) ++
      Seq(col("score"), col("kept"))): _*)
  }

  /** A27: the TRAINING CURVE as a first-class result — per GD iteration
    * (0 = the zero init through `iters`), the rnd4 weight snapshot plus
    * corpus log-loss and threshold accuracy under those weights. The
    * diagnostic every training pipeline wants next to the fitted model:
    * monotonicity, plateaus and the iteration budget become gate-hashed
    * DATA, and because every snapshot is pinned the oracle replays the
    * whole trajectory, not just the final weights.
    *
    * The algebraic sigmoid is strictly inside (0, 1), so ln is always
    * defined; loss sums are decimal-exact; each iteration's metric pass
    * is one aggregate over the persisted feature scan with plan-literal
    * weights (iters+1 scans — the curve's intrinsic cost; at lake scale
    * curves are computed on a fixed eval slice, not the corpus). */
  def trainCurve(feats: DataFrame, xs: Seq[String], yCol: String,
                 lr: Double, iters: Int): DataFrame = {
    feats.persist()
    var w: Seq[Double] = Vector.fill(xs.size + 1)(0.0)
    val snaps = Vector.newBuilder[(Int, Seq[Double])]
    snaps += ((0, w))
    for (t <- 1 to iters) {
      w = step(feats, xs, yCol, lr, w)
      snaps += ((t, w))
    }
    // Per-snapshot metrics are computed EAGERLY while the feature scan is
    // still persisted — a lazy unioned plan consumed after unpersist would
    // re-scan the features uncached iters+1 times. r14: every snapshot's
    // weights are plan literals once the GD loop is done, and each
    // snapshot's (loss, acc) is an independent aggregate over the SAME
    // cached scan — so all iters+1 metric pairs ride ONE aggregation job
    // (2·(iters+1) expressions) instead of one blocking .head() per
    // snapshot (the 12-iteration curve measured 54 sequential jobs; the
    // per-expression decimal sums are unchanged, so the values are
    // bit-identical). The collected values are metadata-sized and
    // re-emitted as literal rows.
    val allSnaps = snaps.result()
    val metricCols = allSnaps.flatMap { case (t, wt) =>
      val sg = sigmoid(zCol(xs, wt))
      val logloss = -(col(yCol) * log(sg) +
        (lit(1.0) - col(yCol)) * log(lit(1.0) - sg))
      val correct = when((sg >= lit(0.5)) === (col(yCol) > lit(0.5)), 1)
        .otherwise(0)
      Seq(Exact.rnd4(Exact.eavg(logloss)).as(s"loss$t"),
        Exact.rnd4(sum(correct).cast("double") / count(lit(1))).as(s"acc$t"))
    }
    val m = feats.agg(metricCols.head, metricCols.tail: _*).head()
    val rows = allSnaps.map { case (t, wt) =>
      feats.sparkSession.range(1)
        .select((lit(t).as("iter") +:
          wt.indices.map(i => Exact.rnd4(lit(wt(i))).as(s"w$i"))) ++
          Seq(lit(m.getAs[Double](s"loss$t")).as("loss"),
            lit(m.getAs[Double](s"acc$t")).as("acc")): _*)
    }
    val out = rows.reduce(_ unionByName _)
    feats.unpersist(false)
    out
  }

  /** DuckDB mirror of [[trainCurve]]: the shared lw-iteration chain, one
    * metric block per snapshot (identical sigmoid/log-loss/accuracy DAG
    * under that iteration's weight CTE), UNION ALL'd. Terminal CTE:
    * `curve_out`. */
  def curveOracleSql(featsCte: String, k: Int, lr: Double,
                     iters: Int): String = {
    def z(wRef: String) =
      (1 to k).foldLeft(s"$wRef.w0")((acc, i) => s"($acc + $wRef.w$i * x$i)")
    val blocks = (0 to iters).map { t =>
      val wOut = (0 to k).map(i =>
        s"floor((w.w$i) * 10000 + 0.5) / 10000.0 AS w$i").mkString(", ")
      s"""SELECT CAST($t AS INT) AS iter, $wOut, m.loss, m.acc
         |FROM lw$t w CROSS JOIN (
         |  SELECT
         |    floor((CAST(sum(CAST(-(y * ln(sg) + (1.0 - y) * ln(1.0 - sg))
         |        AS DECIMAL(38,10))) AS DOUBLE) / count(*)) * 10000 + 0.5)
         |      / 10000.0 AS loss,
         |    floor((CAST(sum(CASE WHEN (sg >= 0.5) = (y > 0.5)
         |        THEN 1 ELSE 0 END) AS DOUBLE) / count(*)) * 10000 + 0.5)
         |      / 10000.0 AS acc
         |  FROM (SELECT y, 0.5 + z / (2.0 * (1.0 + abs(z))) AS sg
         |        FROM (SELECT f.*, ${z("w")} AS z
         |              FROM $featsCte f CROSS JOIN lw$t w) zf) s) m"""
        .stripMargin
    }.mkString("\nUNION ALL\n")
    s"""curve_out AS (
       |$blocks
       |)""".stripMargin
  }

  /** The D65 composed op over the shared D58 feature/label map. */
  def qualityLogistic(docs: DataFrame): DataFrame =
    fitScore(RidgeProbe.qualityFeatures(docs), Seq("x1", "x2", "x3"), "y",
      lr = 4.0, iters = 12, threshold = 0.5)

  /** Unrolled SQL replay of [[fit]]+[[fitScore]]: iteration t's gradient
    * CTE aggregates under iteration t−1's weight CTE, every double op
    * structurally identical to the Column DAG. `featsCte` must expose
    * idCol, x1..xk and 0/1 y. */
  def oracleSql(featsCte: String, idCol: String, k: Int,
                lr: Double, iters: Int, threshold: Double,
                iterWhere: Int => String = _ => ""): String = {
    def z(wRef: String) =
      (1 to k).foldLeft(s"$wRef.w0")((acc, i) => s"($acc + $wRef.w$i * x$i)")
    val w0 = (0 to k).map(i => s"CAST(0.0 AS DOUBLE) AS w$i").mkString(", ")
    val iterCtes = (1 to iters).map { t =>
      val gs = (0 to k).map { i =>
        val x = if (i == 0) "1.0" else s"x$i"
        s"CAST(sum(CAST((sg - y) * $x AS DECIMAL(38,10))) AS DOUBLE) AS g$i"
      }.mkString(",\n    ")
      // mirror step()'s empty-batch guard: n = 0 leaves the weights
      // unchanged (an unguarded w - lr*(g/n) would turn one empty chunk
      // into NULL weights that poison every later iteration)
      val ws = (0 to k).map(i =>
        s"CASE WHEN g.n = 0 THEN w.w$i ELSE w.w$i - $lr * (g.g$i / g.n) END AS w$i")
        .mkString(", ")
      s"""lg$t AS MATERIALIZED (
         |  SELECT $gs, count(*) AS n
         |  FROM (
         |    SELECT y, ${(1 to k).map(i => s"x$i").mkString(", ")},
         |      0.5 + z / (2.0 * (1.0 + abs(z))) AS sg
         |    FROM (SELECT f.*, ${z("w")} AS z
         |          FROM $featsCte f CROSS JOIN lw${t - 1} w
         |          ${iterWhere(t)}) zf)),
         |lw$t AS MATERIALIZED (
         |  SELECT $ws FROM lw${t - 1} w CROSS JOIN lg$t g)""".stripMargin
    }.mkString(",\n")
    val wOut = (0 to k).map(i =>
      s"floor((w.w$i) * 10000 + 0.5) / 10000.0 AS w$i").mkString(",\n    ")
    s"""lw0 AS MATERIALIZED (SELECT $w0),
       |$iterCtes,
       |lscored AS (
       |  SELECT f.$idCol, ${(1 to k).map(i => s"f.x$i").mkString(", ")}, f.y,
       |    $wOut,
       |    floor((0.5 + z / (2.0 * (1.0 + abs(z)))) * 10000 + 0.5) / 10000.0
       |      AS score
       |  FROM (SELECT f.*, ${z("w")} AS z
       |        FROM $featsCte f CROSS JOIN lw$iters w) f
       |  CROSS JOIN lw$iters w)""".stripMargin
  }
}
