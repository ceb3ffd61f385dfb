package graft

import org.apache.spark.sql.functions._

import graft.ml.NaiveBayesProbe

/** A20 multinomial NB: learns a separable vocabulary, smoothing handles
  * unseen terms, and scores are partition-invariant. */
class NaiveBayesSpec extends SparkSpec {
  import spark.implicits._

  // Two classes with disjoint core vocab plus shared filler.
  private def fixture = ((0 until 30).map { i =>
    (i.toLong, "en", s"hello world common filler w${i % 3}")
  } ++ (30 until 60).map { i =>
    (i.toLong, "de", s"hallo welt common filler w${i % 3}")
  }).toDF("doc_id", "lang", "text")

  test("separable vocabulary is classified correctly") {
    val out = NaiveBayesProbe.fitScore(fixture, Seq("de", "en"))
      .filter(col("is_pred")).collect()
    assert(out.length == 60)
    assert(out.forall(r => r.getAs[String]("cls") == r.getAs[String]("actual")),
      "every doc must route to its own class vocabulary")
  }

  test("prediction rows are exactly one per doc, scores rnd4-gridded") {
    val all = NaiveBayesProbe.fitScore(fixture, Seq("de", "en")).collect()
    assert(all.length == 120) // 60 docs x 2 classes
    val preds = all.filter(_.getAs[Boolean]("is_pred"))
    assert(preds.map(_.getAs[Long]("doc_id")).distinct.length == 60)
    all.foreach { r =>
      val s = r.getAs[Double]("score")
      assert(s == math.floor(s * 10000 + 0.5) / 10000)
    }
  }

  test("all-OOV docs get prior-only routing rows, never silence") {
    // A doc with zero in-vocabulary tokens (the E17 stream path sees
    // genuinely new docs) must still emit one row per class with the
    // prior-only score ln(nd/n) — not vanish from the output.
    val model = NaiveBayesProbe.fit(fixture, Seq("de", "en"))
    val newDocs = Seq((100L, "en", "zzz qqq xyzzy")).toDF(
      "doc_id", "lang", "text")
    val out = NaiveBayesProbe.score(newDocs, model).collect()
    assert(out.length == 2, s"expected 2 prior-only rows, got ${out.length}")
    val prior = math.floor(math.log(30.0 / 60.0) * 10000 + 0.5) / 10000
    out.foreach { r =>
      assert(r.getAs[Double]("score") == prior,
        s"OOV doc must carry the prior-only score $prior")
    }
    assert(out.count(_.getAs[Boolean]("is_pred")) == 1,
      "exactly one argmax row (class-name tie-break)")
  }

  test("scores are bit-identical under repartitioning (decimal sums)") {
    val a = NaiveBayesProbe.fitScore(fixture.repartition(11), Seq("de", "en"))
      .orderBy("doc_id", "cls").collect()
    val b = NaiveBayesProbe.fitScore(fixture.coalesce(1), Seq("de", "en"))
      .orderBy("doc_id", "cls").collect()
    a.zip(b).foreach { case (x, y) =>
      assert(java.lang.Double.doubleToLongBits(x.getAs[Double]("score")) ==
        java.lang.Double.doubleToLongBits(y.getAs[Double]("score")))
      assert(x.getAs[Boolean]("is_pred") == y.getAs[Boolean]("is_pred"))
    }
  }
}
