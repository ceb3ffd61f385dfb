package graft

import org.apache.spark.sql.functions._

import graft.functions.Bpe

/** BPE vocabulary training: hand-computed merges on the classic
  * low/lower/newest/widest fixture, determinism under repartitioning,
  * and the documented double-replace merge semantics. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  // Sennrich-style fixture: newest×6, widest×3, low×5, lower×2 — the
  // "e s" / "s t" pair counts tie at 9 and the (count desc, pair asc)
  // total order must pick "e s" first, then "es t" merges at 9.
  private def fixture = Seq(
    (0L, ("newest " * 6).trim),
    (1L, ("widest " * 3).trim),
    (2L, ("low " * 5).trim),
    (3L, ("lower " * 2).trim)
  ).toDF("doc_id", "text")

  test("train: hand-computed first merges with the total-order tiebreak") {
    val ms = Bpe.train(fixture, 3)
    assert(ms(0) == ((1, "e s", "es", 9L)), s"first merge: ${ms(0)}")
    assert(ms(1) == ((2, "es t", "est", 9L)), s"second merge: ${ms(1)}")
    // next tier: "l o" and "o w" tie at 7 (low 5 + lower 2) and the
    // pair-asc order picks "l o"
    assert(ms(2) == ((3, "l o", "lo", 7L)), s"third merge: ${ms(2)}")
  }

  test("train is invariant to partitioning and repeatable") {
    val a = Bpe.train(fixture.repartition(7), 4)
    val b = Bpe.train(fixture.coalesce(1), 4)
    assert(a == b, s"merge lists diverge:\n$a\n$b")
  }

  test("subwordCounts: zero merges = character count; merges only shrink") {
    val none = Bpe.subwordCounts(fixture, Seq.empty).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("n_subwords")).toMap
    // "newest"×6 = 36 chars
    assert(none(0L) == 36, s"char-level subwords: ${none(0L)}")
    val trained = Bpe.subwordCounts(fixture, Bpe.train(fixture, 3)).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("n_subwords")).toMap
    // after e s → es, es t → est, l o → lo:  newest = n e w est,
    // 6 words × 4 symbols
    assert(trained(0L) == 24, s"merged subwords: ${trained(0L)}")
    none.keys.foreach(k => assert(trained(k) <= none(k),
      s"merges must never grow the subword count (doc $k)"))
  }

  test("double-replace semantics: interleaved occurrences both merge") {
    val docs = Seq((0L, "abab")).toDF("doc_id", "text")
    val out = Bpe.subwordCounts(docs, Seq((1, "a b", "ab", 0L))).collect()(0)
    // " a b a b " → first pass merges the leading pair, second pass the
    // one the consumed separator hid → " ab ab " = 2 symbols
    assert(out.getAs[Int]("n_subwords") == 2,
      s"expected 2 subwords, got ${out.getAs[Int]("n_subwords")}")
  }

  test("vocabulary drops empty words and counts exactly") {
    val v = Bpe.vocabulary(Seq((0L, "a a b")).toDF("doc_id", "text"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(v == Map("a" -> 2L, "b" -> 1L))
  }
}
