package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.sim.Ann

/** Invariants for the similarity-search operators that the rows-only driver
  * check can't see: LSH results must agree with brute force on every pair
  * they both return, ranks must be contiguous, and bucketing must recall a
  * nonzero share of true neighbors.
  */
class AnnSpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, sfDir)
  private lazy val qs = emb.filter(col("vec_id") < 20)
  private lazy val bf = Ann.bruteForceTopK(qs, emb, k = 5).cache()
  private lazy val lsh = Ann.lshTopK(qs, emb, k = 5, planes = 4, tables = 8)
    .cache()

  test("brute-force top-k: 5 contiguous ranks per query, sims non-increasing") {
    val perQ = bf.groupBy("q_id")
      .agg(count(lit(1)).as("n"), min("rank").as("lo"), max("rank").as("hi"))
      .collect()
    assert(perQ.length == 20)
    perQ.foreach { r =>
      assert(r.getAs[Long]("n") == 5 && r.getAs[Int]("lo") == 1 &&
        r.getAs[Int]("hi") == 5)
    }
    val bad = bf.as("a").join(bf.as("b"),
      col("a.q_id") === col("b.q_id") && col("a.rank") < col("b.rank") &&
        col("a.sim") < col("b.sim")).count()
    assert(bad == 0, "rank order must follow similarity order")
  }

  test("lsh agrees with brute force on shared pairs and recalls > 0") {
    val joined = lsh.select(col("q_id"), col("c_id"), col("sim").as("lsim"))
      .join(bf.select(col("q_id"), col("c_id"), col("sim").as("bsim")),
        Seq("q_id", "c_id"))
    val disagree = joined.filter(col("lsim") =!= col("bsim")).count()
    assert(disagree == 0, "same pair must score identically in both paths")
    val recall = joined.count().toDouble / bf.count()
    assert(recall > 0.25, s"multi-table lsh recall too low: $recall")
    info(f"lsh recall@5 = $recall%.2f")
  }

  test("ivf agrees with brute force on shared pairs; multi-probe recall") {
    val ivf = Ann.ivfTopK(qs, emb, k = 5, nlist = 16, nProbe = 4).cache()
    val joined = ivf.select(col("q_id"), col("c_id"), col("sim").as("isim"))
      .join(bf.select(col("q_id"), col("c_id"), col("sim").as("bsim")),
        Seq("q_id", "c_id"))
    val disagree = joined.filter(col("isim") =!= col("bsim")).count()
    assert(disagree == 0, "same pair must score identically in both paths")
    val recall = joined.count().toDouble / bf.count()
    // probing 4/16 cells reads ~25% of the corpus; near neighbors
    // concentrate in the query's own cells so recall must beat that share
    assert(recall > 0.4, s"ivf recall too low: $recall")
    info(f"ivf recall@5 = $recall%.2f")
  }
}
