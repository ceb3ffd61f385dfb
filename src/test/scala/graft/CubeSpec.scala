package graft

import org.apache.spark.sql.functions._

import graft.cube.{BandAliases, DataCube, DimAliases, DimensionMissing}

/** §2B model/data-model semantics: dim-alias resolution, band-alias groups,
  * presence checks — the behaviors of the reference's dim_utils.py that
  * aren't visible through the oracle-gated queries.
  */
class CubeSpec extends SparkSpec {

  test("B1: dimension aliases resolve case-insensitively per group") {
    assert(DimAliases.alternative(Seq("Time", "bands", "x"), "t") == Some("Time"))
    assert(DimAliases.alternative(Seq("date", "channel"), "time") == Some("date"))
    assert(DimAliases.alternative(Seq("date", "channel"), "band") == Some("channel"))
    assert(DimAliases.alternative(Seq("lon", "lat"), "x") == Some("lon"))
    assert(DimAliases.alternative(Seq("lon", "lat"), "y") == Some("lat"))
    assert(DimAliases.alternative(Seq("lon", "lat"), "time").isEmpty)
    // exact name always wins over alias lookup
    assert(DimAliases.alternative(Seq("t", "time"), "t") == Some("t"))
  }

  test("B2: band alias groups (Sentinel-2 style)") {
    assert(BandAliases.alternatives("red").contains("b04"))
    assert(BandAliases.alternatives("B08").contains("nir"))
    assert(BandAliases.resolveAll(Seq("B04_10m", "b08"), Seq("red", "nir")) ==
      Seq("B04_10m", "b08"))
    // unknown bands resolve to themselves only when literally present
    assert(BandAliases.resolveAll(Seq("vv", "vh"), Seq("vv", "red")) == Seq("vv"))
  }

  test("B3: missing dimensions raise DimensionMissing, present ones pass") {
    import spark.implicits._
    val noTime = DataCube(Seq((1L, "a", 1.0)).toDF("x", "band", "value"))
    intercept[DimensionMissing] { noTime.filterTemporal("2024-01-01", "2024-01-02") }
    intercept[DimensionMissing] { noTime.reduceDimension("time", "sum") }
    val noBand = DataCube(Seq((1L, 2.0)).toDF("x", "value"))
    intercept[DimensionMissing] { noBand.filterBands(Seq("red")) }
    intercept[DimensionMissing] { noBand.ndvi() }
    // spatial present under aliases
    val geo = DataCube(Seq((1.0, 2.0, 3.0)).toDF("lon", "lat", "value"))
    assert(geo.filterBbox(0, 10, 0, 10).df.count() == 1)
  }

  test("B7: filter_bands honors alias groups through the band dimension") {
    import spark.implicits._
    val cube = DataCube(Seq(("B04_10m", 1.0), ("b08", 2.0), ("scl", 3.0))
      .toDF("band", "value"))
    val got = cube.filterBands(Seq("red", "nir")).df
      .select("band").collect().map(_.getString(0)).sorted
    assert(got.toSeq == Seq("B04_10m", "b08"))
  }

  test("product reducer: zeros and negative parity (advice follow-up)") {
    import spark.implicits._
    val df = Seq(("a", 2.0), ("a", -3.0), ("b", 2.0), ("b", -3.0), ("b", -4.0),
      ("c", 5.0), ("c", 0.0)).toDF("k", "value")
    val got = df.groupBy("k").agg(graft.cube.Reducers("product")(col("value")).as("p"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(got("a") + 6.0) < 1e-9, s"got ${got("a")}")
    assert(math.abs(got("b") - 24.0) < 1e-9, s"got ${got("b")}")
    assert(got("c") == 0.0)
  }
}
