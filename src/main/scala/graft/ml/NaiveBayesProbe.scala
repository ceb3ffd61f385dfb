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

  /** Fitted model tables: the smoothed (cls, term, cnt, tot, v) grid and
    * the (cls, nd) priors with the corpus total — static DataFrames a
    * scoring pass (batch or per-micro-batch, E17) joins against. */
  case class NbModel(grid: DataFrame, docC: DataFrame, nTot: DataFrame)

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
    NbModel(grid, docC, nTot)
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
    val sc = contrib.groupBy("doc_id", "cls")
      .agg(Exact.esum(col("c")).as("ll"))
      .join(broadcast(m.docC), "cls")
      .crossJoin(broadcast(m.nTot))
      .withColumn("score", Exact.rnd4(col("ll") +
        log(col("nd").cast("double") / col("n").cast("double"))))
    sc.withColumn("is_pred", row_number().over(
        Window.partitionBy("doc_id")
          .orderBy(col("score").desc, col("cls").asc)) === 1)
      .join(docs.select(col("doc_id"), col("lang").as("actual")), "doc_id")
      .select("doc_id", "cls", "score", "is_pred", "actual")
  }

  /** Fit + score in one plan over a (doc_id, lang, text) corpus. */
  def fitScore(docs: DataFrame, classes: Seq[String] = defaultClasses,
               alpha: Double = 1.0): DataFrame =
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
       |sc AS (
       |  SELECT c.doc_id, c.cls,
       |    floor((CAST(sum(CAST(c.c AS DECIMAL(38,10))) AS DOUBLE)
       |      + ln(CAST(d.nd AS DOUBLE) / CAST(n.n AS DOUBLE)))
       |      * 10000 + 0.5) / 10000.0 AS score
       |  FROM contrib c JOIN doc_c d ON d.cls = c.cls CROSS JOIN n
       |  GROUP BY c.doc_id, c.cls, d.nd, n.n),
       |nbout AS (
       |  SELECT sc.doc_id, sc.cls, sc.score,
       |    row_number() OVER (PARTITION BY sc.doc_id
       |      ORDER BY sc.score DESC, sc.cls ASC) = 1 AS is_pred,
       |    doc.lang AS actual
       |  FROM sc JOIN documents doc ON doc.doc_id = sc.doc_id)""".stripMargin
  }
}
