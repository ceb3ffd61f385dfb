package graft

import org.apache.spark.sql.functions._

import graft.dedup.GraphRank

/** D74 PageRank: mass conservation, hub dominance, dangling handling,
  * and bitwise partition invariance. */
class GraphRankSpec extends SparkSpec {
  import spark.implicits._

  // star: 0 is the hub of 1..6; 7-8 a detached pair; 9-11 isolated
  private def nodes = (0L to 11L).toDF("doc_id")
  private def pairs = ((1L to 6L).map(i => (0L, i)) :+ (7L, 8L))
    .toDF("doc_a", "doc_b")

  test("hub outranks leaves; leaves outrank isolated nodes") {
    val r = GraphRank.pageRank(nodes, pairs).collect()
      .map(x => x.getAs[Long]("doc_id") -> x.getAs[Double]("rank_score"))
      .toMap
    assert(r(0L) > r(1L), s"hub ${r(0L)} must outrank leaf ${r(1L)}")
    assert(r(1L) > r(9L), s"leaf ${r(1L)} must outrank isolated ${r(9L)}")
    assert((1L to 6L).map(r).distinct.size == 1, "leaves are symmetric")
    assert((9L to 11L).map(r).distinct.size == 1, "isolated are symmetric")
  }

  test("rank mass is conserved (sum r = 1)") {
    val total = GraphRank.pageRank(nodes, pairs)
      .agg(sum(col("rank_score"))).head().getDouble(0)
    // rank_score = r*N, so sum = N within rounding
    assert(math.abs(total - 12.0) < 12 * 1e-3, s"total $total")
  }

  test("degree column counts undirected edges") {
    val d = GraphRank.pageRank(nodes, pairs).collect()
      .map(x => x.getAs[Long]("doc_id") -> x.getAs[Long]("deg")).toMap
    assert(d(0L) == 6 && d(1L) == 1 && d(7L) == 1 && d(9L) == 0)
  }

  test("iterates are partition-invariant bitwise") {
    val a = GraphRank.pageRank(nodes.repartition(7), pairs.repartition(5))
      .orderBy("doc_id").collect()
    val b = GraphRank.pageRank(nodes.coalesce(1), pairs.coalesce(1))
      .orderBy("doc_id").collect()
    a.zip(b).foreach { case (x, y) =>
      assert(java.lang.Double.doubleToLongBits(
        x.getAs[Double]("rank_score")) ==
        java.lang.Double.doubleToLongBits(y.getAs[Double]("rank_score")))
    }
  }
}
