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

  test("esumOfConst replays the executed esum10 aggregate bit-for-bit") {
    // representative iterate magnitudes, including values whose decimal
    // expansion terminates exactly at digit 11 with a '5' (the cast
    // boundary class that split the engines at sf0.1) and n = 0
    val cases = Seq(
      (1.0 / 12.0, 3L), (1.0 / 20000.0, 9L), (7.36493375e-5, 9L),
      (1.50765e-5, 9L), (0.000147298675 / 2.0, 4L), (0.9999999999, 7L),
      (1.2345678901234e-5, 843L))
    cases.foreach { case (r, n) =>
      val agg = spark.range(n).select(lit(r).as("r"))
        .agg(coalesce(GraphRank.esum10(col("r")), lit(0.0)))
        .head().getDouble(0)
      val drv = GraphRank.esumOfConst(r, n)
      assert(java.lang.Double.doubleToLongBits(agg) ==
        java.lang.Double.doubleToLongBits(drv),
        s"r=$r n=$n agg=$agg drv=$drv")
    }
    assert(GraphRank.esumOfConst(0.123, 0L) == 0.0)
  }

  test("triangles: clique reads 1.0, star hub 0.0, random graph vs brute force") {
    import spark.implicits._
    // K4 clique ∪ 5-leaf star (no triangles) sharing no nodes
    val k4 = for (a <- 0 to 3; b <- 0 to 3 if a < b) yield (a.toLong, b.toLong)
    val star = (11 to 15).map(l => (10L, l.toLong))
    val r = GraphRank.triangleStats((k4 ++ star).toDF("doc_a", "doc_b"))
      .collect().map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getDouble(3))).toMap
    (0 to 3).foreach(v => assert(r(v.toLong) == ((3L, 3L, 1.0)), s"k4 $v"))
    assert(r(10L) == ((5L, 0L, 0.0)), "hub must have zero clustering")
    assert(r(12L) == ((1L, 0L, 0.0)), "leaf: degree < 2 pinned to 0")
    // random graph: exact equality with a brute-force triple scan
    val rng = new scala.util.Random(11)
    val edges = (0 until 300)
      .map(_ => (rng.nextInt(40).toLong, rng.nextInt(40).toLong))
      .filter(p => p._1 != p._2)
      .map(p => (math.min(p._1, p._2), math.max(p._1, p._2))).distinct
    val got = GraphRank.triangleStats(edges.toDF("doc_a", "doc_b"))
      .collect().map(x => x.getLong(0) -> x.getLong(2)).toMap
    val es = edges.toSet
    val nodes = edges.flatMap(p => Seq(p._1, p._2)).distinct
    val brute = nodes.map { v =>
      val nb = nodes.filter(u => es((math.min(u, v), math.max(u, v))) && u != v)
      v -> (for (a <- nb; b <- nb if a < b && es((a, b))) yield 1).size.toLong
    }.toMap
    assert(got == brute, "per-node triangle counts diverge from brute force")
  }
}
