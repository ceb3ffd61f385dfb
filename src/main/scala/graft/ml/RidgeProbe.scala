package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.{Cramer, Exact}

/** Closed-form ridge-regression training, fully inside the Spark plan.
  *
  * The openEO ML surface (reference: openeo_processes_dask/process_implementations/
  * ml/random_forest.py:60 `fit_class_random_forest`) trains models whose
  * fitted state is data-dependent and iterative, so the driver gate can
  * only rows-check them (SURVEY §6). This trainer closes that gap for the
  * linear family: ridge solves to a CLOSED FORM, w = (XᵀX + λI)⁻¹ Xᵀy, so
  * training is one global aggregation (the k(k+3)/2 + 1 moment sums) plus
  * a k×k Cramer solve — and with order-independent decimal moment sums
  * ([[Exact.esum]]) and the shared [[Cramer]] expansion instantiated once
  * as Column math and once as oracle SQL, the TRAINED WEIGHTS and every
  * downstream prediction are bit-identical across engines. A model fit is
  * hash-gated end-to-end, not rows-only.
  *
  * Scale shape (the 100 TB contract): pass 1 is scan → map-side partial
  * aggregation → one k²-double row on the driver side of the plan (no
  * shuffle of data rows, only of per-partition partials); pass 2 re-scans
  * and scores against the broadcast 1-row weight table. No collect, no
  * iteration, no skew exposure — the same two-pass statistics+apply shape
  * as a vectorized standardizer. The k ≤ 4 bound is the Laplace-expansion
  * limit shared with the curve fitters, plenty for probe-sized feature
  * vectors (distilling a rule cascade into a cheap linear scorer; the
  * fastText-style hashed scorer in TextFunctions is the fixed-weight twin).
  */
object RidgeProbe {

  /** Fit ridge weights over feature columns `xs` (intercept prepended
    * implicitly) against label `yCol`: returns a single-row DataFrame with
    * columns w0 (intercept), w1..wk in `xs` order. All moments are decimal
    * sums, so the result is independent of row order and partitioning; the
    * diagonal gets `+ lambda` (intercept included — documented, mirrored
    * in the oracle generator). */
  def fit(feats: DataFrame, xs: Seq[String], yCol: String,
          lambda: Double): DataFrame = {
    require(xs.nonEmpty && xs.size <= 3,
      s"ridge probe supports 1..3 features (4x4 Cramer bound), got ${xs.size}")
    val n = xs.size + 1
    def x(i: Int): Column = if (i == 0) lit(1.0) else col(xs(i - 1))
    val moments =
      (for (i <- 0 until n; j <- i until n)
        yield Exact.esum(x(i) * x(j)).as(s"_m${i}${j}")) ++
      (0 until n).map(i => Exact.esum(x(i) * col(yCol)).as(s"_r$i"))
    val g = feats.agg(moments.head, moments.tail: _*)
    val mat = Vector.tabulate(n, n) { (i, j) =>
      val m = col(s"_m${math.min(i, j)}${math.max(i, j)}")
      if (i == j) m + lit(lambda) else m
    }
    val rhs = Vector.tabulate(n)(i => col(s"_r$i"))
    val ws = Cramer.solve(mat, rhs, Cramer.columns)
    g.select(ws.zipWithIndex.map { case (w, i) => w.as(s"w$i") }: _*)
  }

  /** Linear score w0 + Σ wᵢ·xᵢ, left-associated so the double DAG matches
    * the SQL mirror term for term. */
  def score(xs: Seq[String]): Column =
    xs.zipWithIndex.foldLeft(col("w0")) { case (acc, (c, i)) =>
      acc + col(s"w${i + 1}") * col(c)
    }

  /** Fit + apply in one plan: broadcast the 1-row weight table back over
    * the features and emit per-row `score` (rnd4) and `kept` (score ≥
    * threshold on the rounded value, so the verdict sits on the pinned
    * 1e-4 grid in both engines). Weight columns ride along rnd4'd — the
    * hash gate then pins the TRAINING, not just the scoring. */
  def fitScore(feats: DataFrame, xs: Seq[String], yCol: String,
               lambda: Double, threshold: Double): DataFrame =
    applyWeights(feats, fit(feats, xs, yCol, lambda), xs, yCol, threshold)

  /** Apply an already-fitted 1-row weight table: the scoring half of
    * [[fitScore]], factored out so the E13 ingest stream scores each
    * micro-batch with the SAME broadcast-join DAG the batch fit used —
    * train offline once, score every arriving batch, bit-equal verdicts.
    * Stateless per batch; the weight table is metadata-sized. */
  def applyWeights(feats: DataFrame, w: DataFrame, xs: Seq[String],
                   yCol: String, threshold: Double): DataFrame = {
    val s = Exact.rnd4(score(xs))
    feats.crossJoin(broadcast(w))
      .withColumn("score", s)
      .withColumn("kept", col("score") >= threshold)
      .select((Seq(col(feats.columns.head)) ++ xs.map(col) ++
        Seq(col(yCol)) ++
        (0 to xs.size).map(i => Exact.rnd4(col(s"w$i")).as(s"w$i")) ++
        Seq(col("score"), col("kept"))): _*)
  }

  /** The D58 feature/label map: three scan-time quality features on the
    * rnd4 grid plus the curation keep-verdict label — ONE definition for
    * batch fit, batch scoring and stream scoring (it is a pure
    * projection, so it applies to a streaming DataFrame unchanged). */
  def qualityFeatures(docs: DataFrame): DataFrame = {
    import graft.functions.TextFunctions.{tokens, stopHits}
    val t = tokens(col("text"))
    val nWords = size(t)
    val stopRatio = stopHits(t, Seq("the", "a", "of", "and", "to", "in",
      "is")).cast("double") / nWords
    val avgWlen = length(regexp_replace(col("text"), " ", ""))
      .cast("double") / nWords
    // No scan-parallelism floor HERE: this definition is shared by batch
    // fits, the RETURNED map-only scoring plans (PlanSpec pins them
    // Exchange-free) and stream scoring. Trainers that want the floor for
    // their materialized feature pass apply Tables.fanOut to `docs` at
    // the call site (TreeProbe/BoostProbe fit inputs).
    docs.select(
      col("doc_id"),
      Exact.rnd4(stopRatio).as("x1"),
      Exact.rnd4(least(avgWlen / 8.0, lit(1.0))).as("x2"),
      Exact.rnd4(least(nWords, lit(1000)).cast("double") / 1000.0).as("x3"),
      when(nWords.between(50, 100000) && stopRatio >= 0.06, 1.0)
        .otherwise(0.0).as("y"))
  }

  /** Score with FITTED weights as plan literals: the same left-associated
    * double DAG as [[score]], so the verdicts are bit-equal to the
    * fit-time broadcast scoring. Stateless and map-only — the form that
    * scores an ingest STREAM (E13) or ships to another cluster. */
  def scoreWithWeights(feats: DataFrame, xs: Seq[String], w: Seq[Double],
                       threshold: Double): DataFrame = {
    val s = xs.zipWithIndex.foldLeft(lit(w(0)): Column) {
      case (acc, (c, i)) => acc + lit(w(i + 1)) * col(c)
    }
    feats.withColumn("score", Exact.rnd4(s))
      .withColumn("kept", col("score") >= threshold)
  }

  /** The D58 composed op: [[qualityFeatures]] → closed-form ridge fit →
    * broadcast scoring. One definition shared by the `text_quality_fit`
    * query and the process-graph `fit_quality_probe` node, so both hash
    * against the same oracle. */
  def qualityProbe(docs: DataFrame): DataFrame =
    fitScore(qualityFeatures(docs), Seq("x1", "x2", "x3"), "y",
      lambda = 0.001, threshold = 0.5)

  /** DuckDB CTE chain (t, sig, f) producing the D58 feature/label table
    * `f` over `documents` — the SQL mirror of [[qualityFeatures]], shared
    * by the ridge (text_quality_fit) and tree/forest (ml_tree_fit,
    * ml_forest_fit) oracles so the feature definition cannot drift. */
  val qualityFeatsSqlCtes: String =
    """t AS (
      |  SELECT doc_id, text, string_split(text, ' ') AS toks
      |  FROM documents),
      |sig AS (
      |  SELECT doc_id,
      |    len(toks) AS n_words,
      |    CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(toks)
      |      AS mean_wlen,
      |    CAST(len(list_filter(toks, w -> w IN ('the', 'a', 'of', 'and', 'to', 'in', 'is'))) AS DOUBLE)
      |      / len(toks) AS stop_ratio
      |  FROM t),
      |f AS (
      |  SELECT doc_id,
      |    floor((stop_ratio) * 10000 + 0.5) / 10000.0 AS x1,
      |    floor((least(mean_wlen / 8.0, 1.0)) * 10000 + 0.5) / 10000.0
      |      AS x2,
      |    floor((CAST(least(n_words, 1000) AS DOUBLE) / 1000.0)
      |      * 10000 + 0.5) / 10000.0 AS x3,
      |    CAST(CASE WHEN n_words BETWEEN 50 AND 100000
      |      AND stop_ratio >= 0.06 THEN 1.0 ELSE 0.0 END AS DOUBLE) AS y
      |  FROM sig)""".stripMargin

  /** md5-keyed fold id in [0, folds): the deterministic split every
    * engine reproduces (salt "cv:" decorrelates from the forest's
    * bootstrap hashing). */
  def foldCol(id: Column, folds: Int): Column =
    (conv(substring(md5(concat(lit("cv:"), id.cast("string"))), 1, 2),
      16, 10).cast("int") % folds)

  /** SQL mirror of [[foldCol]]. */
  def foldSql(idSql: String, folds: Int): String = {
    val h = s"md5('cv:' || CAST($idSql AS VARCHAR))"
    s"(((strpos('0123456789abcdef', substr($h, 1, 1)) - 1) * 16 + " +
      s"(strpos('0123456789abcdef', substr($h, 2, 1)) - 1)) % $folds)"
  }

  /** A17: k-fold cross-validated ridge with OUT-OF-FOLD scoring — the
    * model-selection primitive, gate-verifiable: each fold's weights are
    * a closed-form fit on the complement (one moment aggregation per
    * fold), every doc is scored by the fold that did NOT see it, and the
    * per-fold weight literals pin all `folds` trainings in the hash.
    * Scale: `folds` moment passes + one zero-shuffle scoring map. */
  def cvRidge(docs: DataFrame, folds: Int, lambda: Double,
              threshold: Double): DataFrame = {
    val xs = Seq("x1", "x2", "x3")
    val feats = qualityFeatures(docs).withColumn("fold",
      foldCol(col("doc_id"), folds)).persist()
    val ws = (0 until folds).map { f =>
      val r = fit(feats.filter(col("fold") =!= f), xs, "y", lambda).head()
      (0 to xs.size).map(r.getDouble)
    }
    val score = (0 until folds).foldLeft(lit(Double.NaN): Column) { (acc, f) =>
      val z = xs.zipWithIndex.foldLeft(lit(ws(f)(0)): Column) {
        case (a, (c, i)) => a + lit(ws(f)(i + 1)) * col(c)
      }
      when(col("fold") === f, Exact.rnd4(z)).otherwise(acc)
    }
    val out = feats.withColumn("score", score)
      .withColumn("kept", col("score") >= threshold)
      .withColumn("correct", col("kept") === (col("y") === 1.0))
      .select("doc_id", "x1", "x2", "x3", "y", "fold", "score",
        "kept", "correct")
    feats.unpersist(false)
    out
  }

  /** Oracle mirror of [[cvRidge]]: fold CTE + one [[oracleSql]] chain per
    * fold (suffixes _cv0.._cvN over complement CTEs), then the same
    * fold-CASE scoring from the per-fold weight CTEs. Terminal CTE
    * `cvsc` has (idCol, x1..x3, y, fold, score). */
  def cvRidgeOracleSql(featsCte: String, idCol: String, folds: Int,
                       lambda: Double): String = {
    val k = 3
    val foldCtes = (0 until folds).map { f =>
      s"""fv$f AS (SELECT * FROM fv WHERE fold <> $f),
         |${oracleSql(s"fv$f", idCol, k, lambda, 0.5, s"_cv$f")}""".stripMargin
    }.mkString(",\n")
    val wJoins = (0 until folds).map(f => s"CROSS JOIN wts_cv$f w$f")
      .mkString("\n  ")
    val scoreCase = (0 until folds).map { f =>
      val z = (1 to k).foldLeft(s"w$f.w0")((a, i) => s"($a + w$f.w$i * x$i)")
      s"WHEN $f THEN floor(($z) * 10000 + 0.5) / 10000.0"
    }.mkString("\n      ")
    s"""fv AS MATERIALIZED (
       |  SELECT f.*, ${foldSql(idCol, folds)} AS fold FROM $featsCte f),
       |$foldCtes,
       |cvsc AS (
       |  SELECT $idCol, x1, x2, x3, y, fold,
       |    CASE fold
       |      $scoreCase
       |    END AS score
       |  FROM fv
       |  $wJoins)""".stripMargin
  }

  /** Oracle-side mirror of [[fit]]+[[score]]: given SQL text for each
    * feature atom (`xsSql`, same order) and the label, emits the moment
    * CTE + Cramer solve + scoring SELECT, every double op structurally
    * identical to the Column plan. `featsCte` must be a CTE name exposing
    * one row per input with columns `idCol`, the features (named x1..xk),
    * and `y`. */
  def oracleSql(featsCte: String, idCol: String, k: Int,
                lambda: Double, threshold: Double,
                suffix: String = ""): String = {
    require(k >= 1 && k <= 3)
    val n = k + 1
    val (g, wts, scored) = (s"g$suffix", s"wts$suffix", s"scored$suffix")
    def x(i: Int): String = if (i == 0) "1.0" else s"x$i"
    val moments =
      (for (i <- 0 until n; j <- i until n) yield
        s"CAST(sum(CAST(${x(i)} * ${x(j)} AS DECIMAL(38,10))) AS DOUBLE) AS m${i}${j}") ++
      (0 until n).map(i =>
        s"CAST(sum(CAST(${x(i)} * y AS DECIMAL(38,10))) AS DOUBLE) AS r$i")
    val mat = Vector.tabulate(n, n) { (i, j) =>
      val m = s"m${math.min(i, j)}${math.max(i, j)}"
      if (i == j) s"($m + $lambda)" else m
    }
    val rhs = Vector.tabulate(n)(i => s"r$i")
    val ws = Cramer.solve(mat, rhs, Cramer.sql)
    val wDefs = ws.zipWithIndex.map { case (w, i) => s"$w AS w$i" }
    val scoreSql = (1 to k).foldLeft("w0") { (acc, i) =>
      s"($acc + (w$i * x$i))"
    }
    val wOut = (0 to k).map(i =>
      s"floor((w$i) * 10000 + 0.5) / 10000.0 AS w$i")
    s"""$g AS (
      |  SELECT ${moments.mkString(",\n    ")}
      |  FROM $featsCte),
      |$wts AS (
      |  SELECT ${wDefs.mkString(",\n    ")}
      |  FROM $g),
      |$scored AS (
      |  SELECT $idCol, ${(1 to k).map(i => s"x$i").mkString(", ")}, y,
      |    ${wOut.mkString(",\n    ")},
      |    floor(($scoreSql) * 10000 + 0.5) / 10000.0 AS score
      |  FROM $featsCte CROSS JOIN $wts)""".stripMargin
  }
}
