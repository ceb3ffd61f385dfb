package graft

import org.apache.spark.sql.functions._

import graft.functions.Sketch

/** KMV bottom-k sketch invariants the oracle gate can't see: boundedness,
  * distinctness, merge behavior across partitions, and estimate accuracy.
  */
class SketchSpec extends SparkSpec {

  private def sketchOf(values: Seq[String], k: Int, parts: Int = 8): Seq[String] = {
    import spark.implicits._
    values.toDF("v").repartition(parts)
      .agg(Sketch.bottomK(col("v"), k).as("sk"))
      .as[Seq[String]].head()
  }

  test("bottomK: the k lexicographically smallest distinct values, ascending") {
    val vs = Seq("d", "b", "e", "a", "c", "f")
    assert(sketchOf(vs, 3) == Seq("a", "b", "c"))
  }

  test("bottomK: duplicates never inflate the sketch") {
    val vs = Seq.fill(100)("a") ++ Seq.fill(100)("b") ++ Seq("c", "d")
    assert(sketchOf(vs, 3) == Seq("a", "b", "c"))
  }

  test("bottomK: fewer than k distinct values IS the distinct set") {
    assert(sketchOf(Seq("b", "a", "b", "a"), 10) == Seq("a", "b"))
  }

  test("bottomK: partition-split merge equals single-partition result") {
    val vs = (1 to 500).map(i => f"v$i%04d")
    assert(sketchOf(vs, 32, parts = 16) == sketchOf(vs, 32, parts = 1))
  }

  test("kmvEstimate: exact when the sketch holds every distinct value") {
    import spark.implicits._
    val est = (1 to 40).map(_.toString).toDF("v")
      .agg(Sketch.bottomK(md5(col("v")), 64).as("sk"))
      .select(Sketch.kmvEstimate(col("sk"), 64)).as[Double].head()
    assert(est == 40.0)
  }

  test("kmvEstimate: within 30% of true cardinality at k=64 over 10k hashes") {
    import spark.implicits._
    val n = 10000
    val est = (1 to n).map(_.toString).toDF("v").repartition(8)
      .agg(Sketch.bottomK(md5(col("v")), 64).as("sk"))
      .select(Sketch.kmvEstimate(col("sk"), 64)).as[Double].head()
    // KMV stderr ~ 1/sqrt(k-2) ≈ 12.7% at k=64; 30% is a 2.4-sigma bound.
    assert(math.abs(est - n) / n < 0.30, s"estimate $est vs true $n")
  }
}
