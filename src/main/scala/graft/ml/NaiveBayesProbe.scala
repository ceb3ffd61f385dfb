package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Exact

/** A20: multinomial Naive Bayes over token counts — the classic
  * count-based text classifier (language/domain/topic routing in a
  * curation pipeline), gate-verifiable end-to-end because the entire
  * "training" is two exact count aggregations and scoring is a pinned
  * arithmetic DAG over those counts.
  *
  * score(d, c) = ln(n_c/N) + Σ_t k_t · ln((cnt(c,t) + α) / (tot_c + α·V))
  *
  * with add-α (Laplace) smoothing over the corpus vocabulary V. The only
  * libm call is `ln`, which the D30 unigram-LM op established replays
  * bit-identically in DuckDB on this value range; the per-class sums are
  * decimal-exact ([[Exact.esum]]) so they are partition-invariant, and
  * the predicted class is an argmax on the rnd4 grid with a class-name
  * tie-break — fully deterministic cross-engine.
  *
  * The class list is a MODEL parameter (pinned, sorted), not collected
  * from data — the oracle is static SQL, and at 100 TB a router's label
  * set is config anyway.
  *
  * Scale shape: one token explode feeds four partial aggregations (class
  * token totals O(C), doc counts O(C), term counts O(V·C), per-doc term
  * counts O(doc-terms)); the smoothed probability grid is O(V·C) and
  * joins the per-doc counts term-keyed (broadcast here; bucketed by term
  * at lake scale); the final argmax is one per-doc window. The corpus
  * itself never joins row-to-row.
  */
object NaiveBayesProbe {

  val defaultClasses: Seq[String] = Seq("de", "en", "es", "fr", "zh")

  /** Fitted model tables: the smoothed (cls, term, cnt, tot, v) grid, the
    * (cls, nd) priors with the corpus total, and the pinned class list —
    * static DataFrames a scoring pass (batch or per-micro-batch, E17)
    * joins against. */
  case class NbModel(grid: DataFrame, docC: DataFrame, nTot: DataFrame,
                     cls: DataFrame)

  /** Train on a (doc_id, lang, text) corpus: two exact count
    * aggregations over one token explode. */
  def fit(docs: DataFrame, classes: Seq[String] = defaultClasses): NbModel = {
    val s = docs.sparkSession
    val toks = docs.select(col("doc_id"), col("lang"),
      explode(graft.functions.TextFunctions.tokens(col("text"))).as("term"))
    val tokC = toks.groupBy(col("lang").as("cls"))
      .agg(count(lit(1)).as("tot"))
    val docC = docs.groupBy(col("lang").as("cls"))
      .agg(count(lit(1)).as("nd"))
    val nTot = docs.agg(count(lit(1)).as("n"))
    val voc = toks.select("term").distinct()
    val vCnt = voc.agg(count(lit(1)).as("v"))
    val clsDf = s.createDataFrame(classes.map(Tuple1(_))).toDF("cls")
    val tc = toks.groupBy(col("lang").as("cls"), col("term"))
      .agg(count(lit(1)).as("cnt"))
    val grid = voc.crossJoin(broadcast(clsDf))
      .join(tc, Seq("cls", "term"), "left")
      .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
      .join(broadcast(tokC), "cls")
      .crossJoin(broadcast(vCnt))
    NbModel(grid, docC, nTot, clsDf)
  }

  /** Score any (doc_id, lang, text) table against a fitted model — a
    * per-batch join + aggregate with no state, so it applies unchanged
    * inside a foreachBatch ingest stream (E17: train offline, score on
    * the stream — the NB twin of E13/E15). Output: one row per
    * (doc, class) with the rnd4 log-posterior, `is_pred` on the argmax
    * row, and the true label `actual`. */
  def score(docs: DataFrame, m: NbModel, alpha: Double = 1.0): DataFrame = {
    val dt = docs.select(col("doc_id"),
        explode(graft.functions.TextFunctions.tokens(col("text"))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("k"))
    val contrib = dt.join(broadcast(m.grid), "term")
      .select(col("doc_id"), col("cls"),
        (col("k").cast("double") *
          log((col("cnt").cast("double") + lit(alpha)) /
            (col("tot").cast("double") +
              lit(alpha) * col("v").cast("double")))).as("c"))
    val ll = contrib.groupBy("doc_id", "cls")
      .agg(Exact.esum(col("c")).as("ll"))
    // Scaffold every (doc, pinned∩observed class) pair from the corpus
    // itself, so a doc whose tokens are ALL outside the training
    // vocabulary still gets routing rows — with the PRIOR-ONLY score
    // ln(nd/n) (its Σ contributions coalesce to 0) instead of silently
    // vanishing from the output (the E17 stream path sees genuinely new
    // docs). Cost-neutral: this replaces the actual-label doc join the
    // output needed anyway; the class table is O(C) and broadcast.
    val scaffold = docs.select(col("doc_id"), col("lang").as("actual"))
      .crossJoin(broadcast(m.docC.join(m.cls, "cls")))
    val sc = scaffold.join(ll, Seq("doc_id", "cls"), "left")
      .crossJoin(broadcast(m.nTot))
      .withColumn("score", Exact.rnd4(coalesce(col("ll"), lit(0.0)) +
        log(col("nd").cast("double") / col("n").cast("double"))))
    sc.withColumn("is_pred", row_number().over(
        Window.partitionBy("doc_id")
          .orderBy(col("score").desc, col("cls").asc)) === 1)
      .select("doc_id", "cls", "score", "is_pred", "actual")
  }

  /** Fit + score in one plan over a (doc_id, lang, text) corpus. */
  def fitScore(docs: DataFrame, classes: Seq[String] = defaultClasses,
               alpha: Double = 1.0): DataFrame =
    // No scan-parallelism floor here: r14 wired Tables.fanOut through this
    // path and ml_nb_fit regressed at BOTH bench core counts (0.51→0.92 s
    // @32c, 1.59 s @8c) — the count passes are too cheap to repay the
    // exchange. Reverted to the plain scan in r15.
    score(docs, fit(docs, classes), alpha)

  /** DuckDB mirror: the identical count CTEs and score DAG. */
  def oracleSql(classes: Seq[String] = defaultClasses,
                alpha: Double = 1.0): String =
    s"""WITH ${oracleCtes(classes, alpha)}
       |SELECT doc_id, cls, score, is_pred, actual FROM nbout""".stripMargin

  /** CTE chain ending in `nbout` (doc_id, cls, score, is_pred, actual) —
    * shared by the fit oracle and metric consumers (kappa). */
  def oracleCtes(classes: Seq[String] = defaultClasses,
                 alpha: Double = 1.0): String = {
    val clsList = classes.map(c => s"'$c'").mkString("[", ", ", "]")
    val a = alpha.toString
    s"""toks AS (
       |  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS term
       |  FROM documents),
       |tok_c AS (SELECT lang AS cls, count(*) AS tot FROM toks GROUP BY 1),
       |doc_c AS (SELECT lang AS cls, count(*) AS nd FROM documents GROUP BY 1),
       |n AS (SELECT count(*) AS n FROM documents),
       |voc AS (SELECT DISTINCT term FROM toks),
       |v AS (SELECT count(*) AS v FROM voc),
       |cl AS (SELECT unnest($clsList) AS cls),
       |tc AS (SELECT lang AS cls, term, count(*) AS cnt
       |       FROM toks GROUP BY 1, 2),
       |grid AS (
       |  SELECT g.cls, g.term, coalesce(tc.cnt, 0) AS cnt, t.tot, v.v
       |  FROM (SELECT cls, term FROM voc CROSS JOIN cl) g
       |  LEFT JOIN tc ON tc.cls = g.cls AND tc.term = g.term
       |  JOIN tok_c t ON t.cls = g.cls
       |  CROSS JOIN v),
       |dt AS (SELECT doc_id, term, count(*) AS k FROM toks GROUP BY 1, 2),
       |contrib AS (
       |  SELECT dt.doc_id, grid.cls,
       |    CAST(dt.k AS DOUBLE) * ln((CAST(grid.cnt AS DOUBLE) + $a)
       |      / (CAST(grid.tot AS DOUBLE) + $a * CAST(grid.v AS DOUBLE))) AS c
       |  FROM dt JOIN grid ON grid.term = dt.term),
       |scaf AS (
       |  -- every (doc, pinned∩observed class) pair: an all-OOV doc keeps
       |  -- its routing rows with the prior-only score (Spark mirror)
       |  SELECT doc.doc_id, doc.lang AS actual, d.cls, d.nd
       |  FROM documents doc CROSS JOIN
       |    (SELECT d0.cls, d0.nd FROM doc_c d0 JOIN cl ON cl.cls = d0.cls) d),
       |sc AS (
       |  SELECT s.doc_id, s.cls, s.actual,
       |    floor((coalesce(CAST(sum(CAST(c.c AS DECIMAL(38,10))) AS DOUBLE),
       |        0.0)
       |      + ln(CAST(s.nd AS DOUBLE) / CAST(n.n AS DOUBLE)))
       |      * 10000 + 0.5) / 10000.0 AS score
       |  FROM scaf s LEFT JOIN contrib c
       |    ON c.doc_id = s.doc_id AND c.cls = s.cls
       |  CROSS JOIN n
       |  GROUP BY s.doc_id, s.cls, s.actual, s.nd, n.n),
       |nbout AS (
       |  SELECT doc_id, cls, score,
       |    row_number() OVER (PARTITION BY doc_id
       |      ORDER BY score DESC, cls ASC) = 1 AS is_pred,
       |    actual
       |  FROM sc)""".stripMargin
  }
}
