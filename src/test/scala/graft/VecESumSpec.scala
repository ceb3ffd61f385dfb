package graft

import org.apache.spark.sql.functions._

/** VecESum: bitwise parity with the per-column decimal sums it replaces,
  * partition invariance, and the SQL surface registration. */
class VecESumSpec extends SparkSpec {
  import spark.implicits._
  import graft.core.Exact

  // values with awkward binary expansions so the decimal rounding path
  // actually matters (0.1, thirds, tiny and large magnitudes mixed)
  private def fixture = (0 until 500).map { i =>
    (i.toLong, Array(0.1 * i, i / 3.0, 1e-7 * i * i, -7.25 * (i % 13)))
  }.toDF("id", "arr")

  private def viaVecEsum(df: org.apache.spark.sql.DataFrame): Seq[Double] = {
    import org.apache.spark.sql.GraftBridge.{toColumn, toExpression}
    df.agg(toColumn(graft.functions.VecESum(
        toExpression(col("arr").cast("array<double>")), 4)
      .toAggregateExpression()).as("s"))
      .head().getSeq[Double](0)
  }

  test("bitwise parity with four Exact.esum columns") {
    val cols = fixture.agg(
      Exact.esum(element_at(col("arr"), 1)).as("s0"),
      (1 until 4).map(j =>
        Exact.esum(element_at(col("arr"), j + 1)).as(s"s$j")): _*).head()
    val vec = viaVecEsum(fixture)
    (0 until 4).foreach { j =>
      assert(java.lang.Double.doubleToLongBits(cols.getDouble(j)) ==
        java.lang.Double.doubleToLongBits(vec(j)),
        s"element $j: esum=${cols.getDouble(j)} vec_esum=${vec(j)}")
    }
  }

  test("partition invariance (exact decimal adds commute)") {
    val a = viaVecEsum(fixture.repartition(17))
    val b = viaVecEsum(fixture.coalesce(1))
    assert(a.map(java.lang.Double.doubleToLongBits) ==
      b.map(java.lang.Double.doubleToLongBits))
  }

  test("non-finite elements are skipped (cast-to-null semantics), no throw") {
    // The legacy double->DECIMAL(38,10) cast nulls NaN/Inf and the sum
    // skips them; VecESum must contribute zero for them, not throw.
    val nf = Seq(
      (1L, Array(1.5, Double.NaN, Double.PositiveInfinity)),
      (2L, Array(2.5, 3.0, Double.NegativeInfinity)),
      (3L, Array(Double.NaN, 4.0, 5.0))).toDF("id", "arr")
    import org.apache.spark.sql.GraftBridge.{toColumn, toExpression}
    val vec = nf.agg(toColumn(graft.functions.VecESum(
        toExpression(col("arr").cast("array<double>")), 3)
      .toAggregateExpression()).as("s")).head().getSeq[Double](0)
    assert(vec == Seq(4.0, 7.0, 5.0), s"got $vec")
  }

  test("SQL surface: graft_vec_esum matches the Column API") {
    GraftExtensions.install(spark)
    fixture.createOrReplaceTempView("vec_fixture")
    val sql = spark.sql(
      "SELECT graft_vec_esum(CAST(arr AS ARRAY<DOUBLE>), 4) AS s " +
        "FROM vec_fixture").head().getSeq[Double](0)
    assert(sql.map(java.lang.Double.doubleToLongBits) ==
      viaVecEsum(fixture).map(java.lang.Double.doubleToLongBits))
  }
}
