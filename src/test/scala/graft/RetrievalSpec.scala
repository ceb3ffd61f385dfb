package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.sim.{Ann, Retrieval}

/** Semantics of hybrid retrieval (SURVEY.md §2D52): the RRF combiner's
  * order axioms on hand-built rank legs, and the BM25 leg's agreement
  * with the gate query's scoring.
  */
class RetrievalSpec extends SparkSpec {

  import spark.implicits._

  test("rrfFuse: both-legs doc outranks single-leg doc at the same ranks") {
    // doc 1 is rank 1 in BOTH legs; docs 2 and 3 are rank 2 in one leg only
    val legA = Seq((1L, 1), (2L, 2)).toDF("id", "rank")
    val legB = Seq((1L, 1), (3L, 2)).toDF("id", "rank")
    val fused = Retrieval.rrfFuse(Seq("a" -> legA, "b" -> legB), k = 10)
      .collect()
    assert(fused.head.getAs[Long]("doc_id") == 1L)
    // 2 vs 3: identical rrf (one leg, rank 2) → tie-break on id ascending
    assert(fused.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L, 2L, 3L))
    // absent leg reported as rank 0
    val d2 = fused.find(_.getAs[Long]("doc_id") == 2L).get
    assert(d2.getAs[Int]("a") == 2 && d2.getAs[Int]("b") == 0)
  }

  test("rrfFuse: score is sum of 1/(k0+rank) over present legs") {
    val legA = Seq((7L, 3)).toDF("id", "rank")
    val legB = Seq((7L, 5)).toDF("id", "rank")
    val r = Retrieval.rrfFuse(Seq("a" -> legA, "b" -> legB), k = 1, k0 = 60)
      .collect().head
    val expect = math.floor((1.0 / 63 + 1.0 / 65) * 10000 + 0.5) / 10000.0
    assert(r.getAs[Double]("rrf") == expect)
  }

  test("bm25Rank: contiguous ranks, only term-matching docs, topN cap") {
    val docs = Tables.documents(spark, sfDir)
    val ranked = Retrieval.bm25Rank(docs, Seq("hash", "merge"), topN = 15)
      .collect()
    assert(ranked.nonEmpty && ranked.length <= 15)
    assert(ranked.map(_.getAs[Int]("rank")).sorted.toSeq ==
      (1 to ranked.length).toSeq)
    // every ranked doc actually contains at least one query term
    val ids = ranked.map(_.getAs[Long]("id")).toSeq
    val withTerm = docs.filter(col("doc_id").isin(ids: _*))
      .filter(col("text").contains("hash") || col("text").contains("merge"))
      .count()
    assert(withTerm == ids.length)
  }

  test("hybrid fusion never ranks a doc absent from every leg") {
    val emb = Tables.embeddings(spark, sfDir)
    val lex = Retrieval.bm25Rank(Tables.documents(spark, sfDir),
      Seq("hash", "merge", "window"), topN = 20)
    val vec = Ann.bruteForceTopK(emb.filter(col("vec_id") === 0), emb, k = 20)
      .select(col("c_id").as("id"), col("rank"))
    val fused = Retrieval.rrfFuse(Seq("lex_rank" -> lex, "vec_rank" -> vec),
      k = 10).collect()
    assert(fused.nonEmpty)
    fused.foreach { r =>
      assert(r.getAs[Int]("lex_rank") > 0 || r.getAs[Int]("vec_rank") > 0)
    }
    // rrf non-increasing down the output
    val scores = fused.map(_.getAs[Double]("rrf")).toSeq
    assert(scores == scores.sortBy(-_))
  }
}
