package graft

import graft.ml.Eval

/** Exact ROC-AUC + threshold metrics (A19): hand-computed fixtures
  * including ties, the degenerate one-class case, and partition
  * invariance of the rank statistic. */
class EvalSpec extends SparkSpec {
  import spark.implicits._

  private def report(rows: Seq[(Double, Double)], th: Double = 0.5) =
    Eval.aucReport(rows.toDF("score", "y"), "score", "y", th).head()

  test("aucReport's global window input is grid-bounded: gate scores sit " +
    "on the rnd4 grid") {
    // aucReport's one single-partition window runs over groupBy(score) —
    // safe ONLY because scores live on the 1e-4 grid, so the distinct-score
    // table is ≤ ~10⁴·range rows at ANY corpus size. Pin the contract on
    // the real gate input (the ridge probe): every score must be exactly
    // representable as k/10⁴, or the window input grows with the corpus.
    import org.apache.spark.sql.functions._
    val scored = graft.ml.RidgeProbe.qualityProbe(
      graft.core.Tables.documents(spark, sfDir))
    val offGrid = scored.filter(
      abs(col("score") * 10000 - round(col("score") * 10000, 0)) > 1e-9)
      .count()
    assert(offGrid == 0L,
      s"$offGrid scores off the rnd4 grid — the AUC window is unbounded")
  }

  test("perfect separation gives AUC 1, random flip gives 0") {
    val perfect = report(Seq((0.9, 1.0), (0.8, 1.0), (0.2, 0.0), (0.1, 0.0)))
    assert(perfect.getAs[Double]("auc") == 1.0)
    assert(perfect.getAs[Double]("prec") == 1.0 &&
      perfect.getAs[Double]("rec") == 1.0 && perfect.getAs[Double]("f1") == 1.0)
    val inverted = report(Seq((0.9, 0.0), (0.8, 0.0), (0.2, 1.0), (0.1, 1.0)))
    assert(inverted.getAs[Double]("auc") == 0.0)
  }

  test("ties use average ranks: hand-computed AUC") {
    // scores: 0.3(y0), 0.5(y0), 0.5(y1), 0.7(y1)
    // ranks: 0.3→1, the two 0.5s→2.5 avg, 0.7→4
    // U = (2.5 + 4) − 2·3/2 = 3.5 ; AUC = 3.5/(2·2) = 0.875
    val r = report(Seq((0.3, 0.0), (0.5, 0.0), (0.5, 1.0), (0.7, 1.0)))
    assert(r.getAs[Double]("auc") == 0.875, s"auc=${r.getAs[Double]("auc")}")
    // at threshold 0.5: tp=2, fp=1, fn=0, tn=1
    assert(r.getAs[Long]("tp") == 2 && r.getAs[Long]("fp") == 1 &&
      r.getAs[Long]("fn") == 0 && r.getAs[Long]("tn") == 1)
    assert(r.getAs[Double]("prec") == 0.6667) // rnd4(2/3)
    assert(r.getAs[Double]("rec") == 1.0)
    assert(r.getAs[Double]("acc") == 0.75)
  }

  test("one-class input degrades to AUC 0.5, metrics defined") {
    val r = report(Seq((0.9, 1.0), (0.2, 1.0)))
    assert(r.getAs[Double]("auc") == 0.5)
    assert(r.getAs[Double]("rec") == 0.5) // one of two positives ≥ 0.5
    val n = report(Seq((0.9, 0.0), (0.2, 0.0)))
    assert(n.getAs[Double]("auc") == 0.5 && n.getAs[Double]("rec") == 0.0)
  }

  test("pr report: hand-computed average precision and best-F1 point") {
    // scores desc: 0.9(y1) P=1 dR=1/2 -> term .5; 0.8(y0) term 0;
    // 0.7(y1) P=2/3 dR=1/2 -> term 1/3; 0.6(y0) term 0 => AP = .8333
    // F1 at thresholds: .6667, .5, .8, .6667 => best .8 @ 0.7
    val out = Eval.prReport(
      Seq((0.9, 1.0), (0.8, 0.0), (0.7, 1.0), (0.6, 0.0)).toDF("score", "y"))
      .head()
    assert(out.getAs[Long]("n") == 4 && out.getAs[Long]("n_pos") == 2)
    assert(out.getAs[Double]("ap") == 0.8333)
    assert(out.getAs[Double]("best_f1") == 0.8)
    assert(out.getAs[Double]("best_threshold") == 0.7)
    // one-class degenerate: no positives -> AP 0, threshold = max score
    val zero = Eval.prReport(
      Seq((0.9, 0.0), (0.1, 0.0)).toDF("score", "y")).head()
    assert(zero.getAs[Double]("ap") == 0.0 &&
      zero.getAs[Double]("best_f1") == 0.0 &&
      zero.getAs[Double]("best_threshold") == 0.9)
    // perfect separation: AP 1, best F1 1
    val perfect = Eval.prReport(
      Seq((0.9, 1.0), (0.8, 1.0), (0.2, 0.0)).toDF("score", "y")).head()
    assert(perfect.getAs[Double]("ap") == 1.0 &&
      perfect.getAs[Double]("best_f1") == 1.0)
  }

  test("pr report is partition-invariant (decimal AP sum)") {
    val rows = (0 until 400).map(i =>
      (math.floor((i % 37) / 37.0 * 10000 + 0.5) / 10000,
        if (i % 3 == 0) 1.0 else 0.0))
    val a = Eval.prReport(rows.toDF("score", "y").repartition(13)).head()
    val b = Eval.prReport(rows.toDF("score", "y").coalesce(1)).head()
    Seq("ap", "best_f1", "best_threshold").foreach { c =>
      assert(java.lang.Double.doubleToLongBits(a.getAs[Double](c)) ==
        java.lang.Double.doubleToLongBits(b.getAs[Double](c)), c)
    }
  }

  test("calibration: perfectly calibrated bins show zero gap") {
    // bin 2 (0.25): 4 rows, 1 positive -> pos_rate 0.25 = mean_pred
    // bin 7 (0.75): 4 rows, 3 positive -> pos_rate 0.75 = mean_pred
    val rows = Seq.fill(3)((0.25, 0.0)) ++ Seq((0.25, 1.0)) ++
      Seq.fill(3)((0.75, 1.0)) ++ Seq((0.75, 0.0))
    val out = Eval.calibration(rows.toDF("score", "y")).collect()
      .map(r => r.getAs[Int]("bin") -> r).toMap
    assert(out(2).getAs[Long]("n") == 4 &&
      out(2).getAs[Double]("mean_pred") == 0.25 &&
      out(2).getAs[Double]("pos_rate") == 0.25 &&
      out(2).getAs[Double]("gap") == 0.0)
    assert(out(7).getAs[Double]("gap") == 0.0)
    // over-confident scores produce a positive gap
    val over = Eval.calibration(
      Seq((0.95, 0.0), (0.95, 1.0)).toDF("score", "y")).head()
    assert(over.getAs[Int]("bin") == 9 && over.getAs[Double]("gap") > 0)
  }

  test("kappa: hand-computed confusion, perfect and chance agreement") {
    // pred/actual over 2 classes: a,a  a,a  a,b  b,b -> po=3/4
    // marginals: pred a=3,b=1; actual a=2,b=2
    // pe = (2*3 + 2*1)/16 = 0.5 ; kappa = (0.75-0.5)/0.5 = 0.5
    val df = Seq(("a", "a"), ("a", "a"), ("a", "b"), ("b", "b"))
      .toDF("cls", "actual")
    val r = Eval.kappaReport(df, "cls", "actual").head()
    assert(r.getAs[Long]("agree") == 3)
    assert(r.getAs[Double]("po") == 0.75 && r.getAs[Double]("pe") == 0.5)
    assert(r.getAs[Double]("kappa") == 0.5)
    val perfect = Eval.kappaReport(
      Seq(("a", "a"), ("b", "b")).toDF("cls", "actual"), "cls", "actual")
      .head()
    assert(perfect.getAs[Double]("kappa") == 1.0)
    // constant predictions AND labels: pe = 1 -> defined as 0
    val const = Eval.kappaReport(
      Seq(("a", "a"), ("a", "a")).toDF("cls", "actual"), "cls", "actual")
      .head()
    assert(const.getAs[Double]("kappa") == 0.0)
  }

  test("rank statistic is partition-invariant (exact sums)") {
    val rows = (0 until 256).map { i =>
      (math.floor(i % 37 / 37.0 * 10000 + 0.5) / 10000.0,
        if ((i * 7) % 3 == 0) 1.0 else 0.0)
    }
    val df = rows.toDF("score", "y")
    val a = Eval.aucReport(df.repartition(17), "score", "y", 0.5).head()
    val b = Eval.aucReport(df.coalesce(1), "score", "y", 0.5).head()
    assert(java.lang.Double.doubleToLongBits(a.getAs[Double]("auc")) ==
      java.lang.Double.doubleToLongBits(b.getAs[Double]("auc")))
    assert(a.getAs[Long]("tp") == b.getAs[Long]("tp"))
  }

  test("regression report: hand-computed MSE/MAE/R2, degenerates, invariance") {
    // y: 0,1,1,2 ; score: 0,1,0,2  → errors 0,0,1,0
    // MSE = 1/4, RMSE = 0.5, MAE = 1/4
    // ȳ = 1, SST = 1+0+0+1 = 2, R² = 1 − 0.25·4/2 = 0.5
    val r = Eval.regressionReport(
      Seq((0.0, 0.0), (1.0, 1.0), (0.0, 1.0), (2.0, 2.0))
        .toDF("score", "y")).head()
    assert(r.getAs[Long]("n") == 4)
    assert(r.getAs[Double]("mse") == 0.25 && r.getAs[Double]("rmse") == 0.5)
    assert(r.getAs[Double]("mae") == 0.25 && r.getAs[Double]("r2") == 0.5)
    // perfect fit: zero errors, R² = 1
    val p = Eval.regressionReport(
      Seq((0.3, 0.3), (0.7, 0.7), (0.9, 0.9)).toDF("score", "y")).head()
    assert(p.getAs[Double]("mse") == 0.0 && p.getAs[Double]("r2") == 1.0)
    // constant label: SST = 0 → R² pinned at the defined 0
    val c = Eval.regressionReport(
      Seq((0.4, 1.0), (0.6, 1.0)).toDF("score", "y")).head()
    assert(c.getAs[Double]("r2") == 0.0 && c.getAs[Double]("mse") == 0.26)
    // partition invariance of the decimal-exact sums
    val big = (0 until 500).map(i => (i / 500.0, (i % 3).toDouble))
    val df = big.toDF("score", "y")
    val x = Eval.regressionReport(df.repartition(17)).head()
    val z = Eval.regressionReport(df.coalesce(1)).head()
    Seq("mse", "rmse", "mae", "r2").foreach { m =>
      assert(java.lang.Double.doubleToLongBits(x.getAs[Double](m)) ==
        java.lang.Double.doubleToLongBits(z.getAs[Double](m)), m)
    }
  }

  test("ndcg: hand-computed discounts, perfect/worst orderings, zero-rel") {
    import spark.implicits._
    def rnd4(x: Double) = math.floor(x * 10000 + 0.5) / 10000
    def d(i: Int) = math.log(i + 1.0) / math.log(2.0)
    // relevant at ranks 1 and 3 of 4
    val r = Eval.ndcgReport(Seq(
      (7L, 1, 1), (7L, 2, 0), (7L, 3, 1), (7L, 4, 0)
    ).toDF("q_id", "rank", "rel"), k = 4).head()
    val dcg = 1.0 / d(1) + 1.0 / d(3)
    val idcg = 1.0 / d(1) + 1.0 / d(2)
    assert(r.getAs[Long]("n_rel") == 2)
    assert(r.getAs[Double]("dcg") == rnd4(dcg))
    assert(r.getAs[Double]("ndcg") == rnd4(dcg / idcg))
    // relevants first → NDCG exactly 1; relevants last → NDCG < 1
    val perfect = Eval.ndcgReport(Seq(
      (1L, 1, 1), (1L, 2, 1), (1L, 3, 0)).toDF("q_id", "rank", "rel")).head()
    assert(perfect.getAs[Double]("ndcg") == 1.0)
    val worst = Eval.ndcgReport(Seq(
      (2L, 1, 0), (2L, 2, 1), (2L, 3, 1)).toDF("q_id", "rank", "rel")).head()
    assert(worst.getAs[Double]("ndcg") < 1.0)
    // no relevant hits: ndcg pinned to the defined 0
    val none = Eval.ndcgReport(Seq(
      (3L, 1, 0), (3L, 2, 0)).toDF("q_id", "rank", "rel")).head()
    assert(none.getAs[Double]("ndcg") == 0.0 && none.getAs[Long]("n_rel") == 0)
  }

  test("class report: hand-computed per-class metrics, absent-axis degenerates") {
    import spark.implicits._
    def rnd4(x: Double) = math.floor(x * 10000 + 0.5) / 10000
    // confusion: a→a ×2, a→b ×1, b→b ×1, c→a ×1 (c never predicted)
    val preds = Seq(("a", "a"), ("a", "a"), ("b", "a"), ("b", "b"),
      ("a", "c")).toDF("cls", "actual")
    val r = Eval.classReport(preds, "cls", "actual").collect()
      .map(x => x.getString(0) -> x).toMap
    val a = r("a")
    assert(a.getAs[Long]("support") == 3 && a.getAs[Long]("pred_pos") == 3
      && a.getAs[Long]("tp") == 2)
    assert(a.getAs[Double]("prec") == rnd4(2.0 / 3)
      && a.getAs[Double]("rec") == rnd4(2.0 / 3))
    assert(a.getAs[Double]("f1") == rnd4(2.0 / 3))
    val b = r("b")
    assert(b.getAs[Long]("support") == 1 && b.getAs[Long]("pred_pos") == 2
      && b.getAs[Long]("tp") == 1)
    assert(b.getAs[Double]("prec") == 0.5 && b.getAs[Double]("rec") == 1.0)
    assert(b.getAs[Double]("f1") == rnd4(2.0 * 0.5 * 1.0 / 1.5))
    // class c: present in actuals, never predicted → precision/f1 pinned 0
    val c = r("c")
    assert(c.getAs[Long]("support") == 1 && c.getAs[Long]("pred_pos") == 0
      && c.getAs[Long]("tp") == 0)
    assert(c.getAs[Double]("prec") == 0.0 && c.getAs[Double]("rec") == 0.0
      && c.getAs[Double]("f1") == 0.0)
  }

  test("map/mrr: hand-computed average precision and reciprocal rank") {
    import spark.implicits._
    def rnd4(x: Double) = math.floor(x * 10000 + 0.5) / 10000
    // relevant at ranks 2 and 4: AP = (1/2 + 2/4) / 2 = 0.5, RR = 1/2
    val r = Eval.mapReport(Seq(
      (7L, 1, 0), (7L, 2, 1), (7L, 3, 0), (7L, 4, 1)
    ).toDF("q_id", "rank", "rel")).head()
    assert(r.getAs[Long]("n_rel") == 2)
    assert(r.getAs[Double]("ap") == 0.5 && r.getAs[Double]("rr") == 0.5)
    // all relevant → AP = 1, RR = 1
    val p = Eval.mapReport(Seq(
      (1L, 1, 1), (1L, 2, 1)).toDF("q_id", "rank", "rel")).head()
    assert(p.getAs[Double]("ap") == 1.0 && p.getAs[Double]("rr") == 1.0)
    // single relevant at rank 3: AP = (1/3)/1, RR = 1/3
    val s3 = Eval.mapReport(Seq(
      (2L, 1, 0), (2L, 2, 0), (2L, 3, 1)).toDF("q_id", "rank", "rel")).head()
    assert(s3.getAs[Double]("ap") == rnd4(1.0 / 3))
    assert(s3.getAs[Double]("rr") == rnd4(1.0 / 3))
    // nothing relevant: both metrics pinned to 0
    val none = Eval.mapReport(Seq(
      (3L, 1, 0)).toDF("q_id", "rank", "rel")).head()
    assert(none.getAs[Double]("ap") == 0.0 && none.getAs[Double]("rr") == 0.0)
  }
}
