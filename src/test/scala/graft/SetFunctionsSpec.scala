package graft

import org.apache.spark.sql.functions._

import graft.functions.SetFunctions

/** IntersectCount must be bit-identical to `size(array_intersect(a, b))`
  * on every input shape — including duplicates (a side deduped in the
  * count), nulls (counted once when present in both), empties, and the
  * real shingle distributions — because the jaccard/containment verifiers
  * ride it through the hash gate. */
class SetFunctionsSpec extends SparkSpec {

  test("intersect_count equals size(array_intersect) on random arrays " +
       "with duplicates and nulls") {
    import spark.implicits._
    val rng = new scala.util.Random(42)
    def arr(): Seq[String] = {
      val n = rng.nextInt(12)
      (0 until n).map { _ =>
        if (rng.nextInt(10) == 0) null
        else s"s${rng.nextInt(8)}" // small alphabet -> dups + overlaps
      }
    }
    val rows = (0 until 500).map(_ => (arr(), arr()))
    val df = rows.toDF("a", "b")
    val bad = df.select(
      SetFunctions.intersectCount(col("a"), col("b")).as("fast"),
      size(array_intersect(col("a"), col("b"))).as("ref"))
      .filter(col("fast") =!= col("ref")).count()
    assert(bad == 0, "intersect_count diverges from size(array_intersect)")
    // empties and null-array inputs behave identically too
    val edge = Seq(
      (Seq.empty[String], Seq("x")),
      (Seq("x"), Seq.empty[String]),
      (Seq.empty[String], Seq.empty[String])).toDF("a", "b")
    val badEdge = edge.select(
      SetFunctions.intersectCount(col("a"), col("b")).as("fast"),
      size(array_intersect(col("a"), col("b"))).as("ref"))
      .filter(col("fast") =!= col("ref")).count()
    assert(badEdge == 0)
  }

  test("intersect_count_sorted equals size(array_intersect) on sorted " +
       "distinct arrays (random + edge shapes)") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    // nullable elements too: array_sort puts the (deduped) null last,
    // exactly the "nulls last, at most one each" contract countSorted owns
    def arr(): Seq[String] =
      (0 until rng.nextInt(12)).map { _ =>
        if (rng.nextInt(6) == 0) null else s"s${rng.nextInt(9)}"
      }
    val rows = (0 until 500).map(_ => (arr(), arr()))
    val df = rows.toDF("a0", "b0").select(
      array_sort(array_distinct(col("a0"))).as("a"),
      array_sort(array_distinct(col("b0"))).as("b"))
    val bad = df.select(
      SetFunctions.intersectCountSorted(col("a"), col("b")).as("fast"),
      size(array_intersect(col("a"), col("b"))).as("ref"))
      .filter(col("fast") =!= col("ref")).count()
    assert(bad == 0,
      "intersect_count_sorted diverges from size(array_intersect)")
    val edge = Seq(
      (Seq.empty[String], Seq("x")),
      (Seq("x"), Seq.empty[String]),
      (Seq.empty[String], Seq.empty[String]),
      (Seq("a", "b", "c"), Seq("a", "b", "c")),
      // trailing-null merges: one side exhausts its non-nulls while the
      // other's cursor is still on a non-null — the shared null must count
      (Seq("x", null), Seq(null)),
      (Seq(null), Seq("x", null)),
      (Seq("b", null), Seq("a", "c", null)),
      (Seq("a", "c", null), Seq("b", null)),
      (Seq(null), Seq(null)),
      (Seq("a", null), Seq("a")),
      (Seq("a"), Seq("a", null))).toDF("a", "b")
    val badEdge = edge.select(
      SetFunctions.intersectCountSorted(col("a"), col("b")).as("fast"),
      size(array_intersect(col("a"), col("b"))).as("ref"))
      .filter(col("fast") =!= col("ref")).count()
    assert(badEdge == 0)
  }

  test("intersect_count on real shingle pairs matches the reference form") {
    val docs = graft.core.Tables.documents(spark, sfDir).limit(200)
    val sh = docs.select(col("doc_id"), array_distinct(
      graft.functions.TextFunctions.shingles(
        graft.functions.TextFunctions.tokens(col("text")), 4)).as("s"))
    val pairs = sh.as("x").crossJoin(broadcast(sh.limit(20).as("y")))
      .select(col("x.s").as("a"), col("y.s").as("b"))
    val bad = pairs.select(
      SetFunctions.intersectCount(col("a"), col("b")).as("fast"),
      size(array_intersect(col("a"), col("b"))).as("ref"))
      .filter(col("fast") =!= col("ref")).count()
    assert(bad == 0)
  }
}
