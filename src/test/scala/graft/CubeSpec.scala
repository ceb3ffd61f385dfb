package graft

import org.apache.spark.sql.functions._

import graft.cube.{BandAliases, DataCube, DimAliases, DimensionMissing}

/** §2B model/data-model semantics: dim-alias resolution, band-alias groups,
  * presence checks — the behaviors of the reference's dim_utils.py that
  * aren't visible through the oracle-gated queries.
  */
class CubeSpec extends SparkSpec {

  test("anomaly against precomputed normals equals the single-cube form") {
    import org.apache.spark.sql.functions._
    import graft.core.{Exact, Tables}
    import graft.cube.DataCube
    val c = DataCube(Tables.events(spark, sfDir).select(
      col("ts").as("time"), col("event_type").as("band"), col("value")))
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.select(col("time"), col("band"), Exact.rnd4(col("value")).as("v"))
    val single = norm(c.anomaly("month").df)
    val against = norm(
      c.anomalyAgainst(c.climatologicalNormal("month"), "month").df)
    assert(single.exceptAll(against).isEmpty &&
      against.exceptAll(single).isEmpty,
      "two-argument anomaly must equal the derived-normals form")
  }

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

  test("fit_curve recovers exact polynomial coefficients") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // v = 2 + 0.5 t - 0.25 t²  sampled on 20 days, two series
    val rows = for (u <- Seq(1L, 2L); day <- 0 until 20) yield {
      val t = day.toDouble
      val shift = if (u == 1) 0.0 else 1.0
      (u, java.sql.Timestamp.valueOf(f"2024-01-${day + 1}%02d 00:00:00"),
        2.0 + shift + 0.5 * t - 0.25 * t * t)
    }
    val cube = DataCube(rows.toDF("user_id", "time", "value"))
    val coefs = cube.fitCurveQuadratic(Seq("user_id"), epoch = "2024-01-01")
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val (c0, c1, c2) = coefs(1L)
    assert(math.abs(c0 - 2.0) < 1e-6 && math.abs(c1 - 0.5) < 1e-6 &&
      math.abs(c2 + 0.25) < 1e-6, s"got $c0 $c1 $c2")
    assert(math.abs(coefs(2L)._1 - 3.0) < 1e-6)
    // predict at the sample points reproduces the samples
    val back = cube.predictCurveQuadratic(
      cube.fitCurveQuadratic(Seq("user_id"), "2024-01-01"),
      Seq("user_id"), "2024-01-01")
    val maxErr = back.df.join(cube.df.withColumnRenamed("value", "orig"),
        Seq("user_id", "time"))
      .agg(max(abs(col("value") - col("orig")))).first().getDouble(0)
    assert(maxErr < 1e-6, s"max predict error $maxErr")
  }

  test("dimension ops: drop requires single label; add rejects dupes") {
    import spark.implicits._
    val cube = DataCube(Seq(("a", 1L, 1.0), ("b", 2L, 2.0))
      .toDF("band", "x", "value"))
    intercept[IllegalArgumentException] { cube.dropDimension("band") }
    intercept[IllegalArgumentException] { cube.addDimension("x", "1") }
    val single = DataCube(Seq(("a", 1L, 1.0), ("a", 2L, 2.0))
      .toDF("band", "x", "value"))
    assert(single.dropDimension("band").dims == Seq("x"))
    assert(cube.dimensionLabels("band").collect().map(_.getString(0)).toSeq ==
      Seq("a", "b"))
    val trimmed = DataCube(Seq(("a", 1.0), ("b", Double.NaN))
      .toDF("band", "value")
      .withColumn("value", when(col("band") === "b",
        lit(null).cast("double")).otherwise(col("value"))))
      .trimLabels("band")
    assert(trimmed.df.select("band").collect().map(_.getString(0)).toSeq ==
      Seq("a"))
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

  test("sort: values sorted onto unchanged labels, nulls dropped") {
    import spark.implicits._
    val c = DataCube(Seq(("s", 1, 5.0), ("s", 2, 1.0), ("s", 3, 3.0))
      .toDF("series", "t", "value")
      .union(Seq(("s", 4)).toDF("series", "t")
        .withColumn("value", lit(null).cast("double"))))
    val got = c.sortAlongDim("t").df.orderBy("t")
      .collect().map(r => (r.getInt(1), r.getDouble(2))).toSeq
    assert(got == Seq((1, 1.0), (2, 3.0), (3, 5.0)))
  }

  test("order: argsort along the dimension") {
    import spark.implicits._
    val c = DataCube(Seq(("s", 10, 5.0), ("s", 20, 1.0), ("s", 30, 3.0))
      .toDF("series", "t", "value"))
    val got = c.orderAlongDim("t", Seq("series")).df.orderBy("position")
      .collect().map(r => (r.getInt(1), r.getLong(2))).toSeq
    // smallest value (1.0) sits at original index 1, then 3.0 at 2, 5.0 at 0
    assert(got == Seq((0, 1L), (1, 2L), (2, 0L)))
  }

  test("rearrange: output label i takes the value at perm(i)") {
    import spark.implicits._
    val c = DataCube(Seq(("s", 0, 10.0), ("s", 1, 11.0), ("s", 2, 12.0))
      .toDF("series", "t", "value"))
    val got = c.rearrange("t", Seq(2, 0, 1)).df.orderBy("t")
      .collect().map(r => (r.getInt(1), r.getDouble(2))).toSeq
    assert(got == Seq((0, 12.0), (1, 10.0), (2, 11.0)))
  }

  test("fit_curve poly degree 3 recovers exact cubic; predict round-trips") {
    import spark.implicits._
    val epoch = "2024-01-01"
    def f(t: Double) = 2.0 + 0.5 * t - 0.3 * t * t + 0.01 * t * t * t
    val rows = (0 until 24).map { t =>
      ("b", java.sql.Timestamp.valueOf(s"2024-01-${t + 1} 00:00:00"), f(t))
    }
    val c = DataCube(rows.toDF("band", "time", "value"))
    val coefs = c.fitCurvePoly(Seq("band"), epoch, 3).collect().head
      .getSeq[Double](1)
    val expect = Seq(2.0, 0.5, -0.3, 0.01)
    coefs.zip(expect).foreach { case (got, e) =>
      assert(math.abs(got - e) < 1e-6, s"coef $got vs $e")
    }
    val pred = c.predictCurvePoly(
      c.fitCurvePoly(Seq("band"), epoch, 3), Seq("band"), epoch, 3)
    val maxErr = pred.df.select(col("time"), col("value"))
      .collect().map { r =>
        val t = (r.getTimestamp(0).getTime -
          java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime) / 86400000.0
        math.abs(r.getDouble(1) - f(t))
      }.max
    assert(maxErr < 1e-6, s"predict error $maxErr")
  }

  test("processing expression: whitelisted sql applies, unsafe rejected") {
    import spark.implicits._
    val c = DataCube(Seq(("a", 4.0)).toDF("band", "value"))
    val out = graft.ml.ProcessExpression.scaleCube(c, "sql", "sqrt(x) + 1")
      .df.collect().head.getDouble(1)
    assert(out == 3.0)
    intercept[IllegalArgumentException] {
      graft.ml.ProcessExpression.scaleCube(c, "sql", "md5(x)")
    }
    intercept[IllegalArgumentException] {
      graft.ml.ProcessExpression.scaleCube(c, "sql", "x + other_col")
    }
    intercept[UnsupportedOperationException] {
      graft.ml.ProcessExpression.scaleCube(c, "python", "x + 1")
    }
  }

  test("climatological_normal: mean per period replaces time") {
    import spark.implicits._
    val c = DataCube(Seq(
      ("2020-01-05", "b", 1.0), ("2021-01-09", "b", 3.0),
      ("2020-06-01", "b", 10.0))
      .toDF("time", "band", "value")
      .withColumn("time", col("time").cast("timestamp")))
    val got = c.climatologicalNormal("month").df
      .collect().map(r => (r.getInt(1), r.getDouble(2))).toMap
    assert(got == Map(1 -> 2.0, 6 -> 10.0))
  }

  test("anomaly against normals: extra normals dim is rejected, " +
    "existing period column survives") {
    import spark.implicits._
    import graft.cube.DataCube
    val c = DataCube(Seq(("2020-01-05", "b", 5.0))
      .toDF("time", "band", "value")
      .withColumn("time", col("time").cast("timestamp")))
    val extraDim = DataCube(Seq(("b", "s1", 1, 2.0))
      .toDF("band", "site", "period", "value"))
    val ex = intercept[IllegalArgumentException] {
      c.anomalyAgainst(extraDim, "month")
    }
    assert(ex.getMessage.contains("site"))
    // a data cube that already carries a 'period' dimension must keep it
    val withPeriod = DataCube(Seq(("2020-01-05", "b", 7, 5.0))
      .toDF("time", "band", "period", "value"))
    val normals = DataCube(Seq(("b", 1, 2.0))
      .toDF("band", "period", "value"))
    // normals' 'period' is the climatology key, the data cube's 'period'
    // is an unrelated dimension — the join must key on the derived month
    // via a temp column, not clobber the data cube's column
    val out = withPeriod.anomalyAgainst(normals, "month")
    assert(out.dims.contains("period"), "data cube 'period' dim clobbered")
    assert(out.df.select("period").first().getInt(0) == 7)
    assert(out.df.select("value").first().getDouble(0) == 3.0)
  }

  // ---- CRS analog (reference: utils/epsg_utils.py) ------------------------

  test("crs: merge/mask reject mismatched or one-sided projections") {
    import spark.implicits._
    import graft.cube.{Crs, DataCube}
    def cube() = DataCube(Seq((0L, 0L, "A", 1.0))
      .toDF("x", "y", "band", "value"))
    val utm33 = Crs(32633, a = 10.0, c = 500000.0, e = -10.0, f = 4500000.0)
    val utm34 = Crs(32634, a = 10.0, c = 500000.0, e = -10.0, f = 4500000.0)
    val resolver = (l: org.apache.spark.sql.Column,
                    r: org.apache.spark.sql.Column) => coalesce(l, r)
    val ex = intercept[IllegalArgumentException] {
      cube().withCrs(utm33).merge(cube().withCrs(utm34), resolver)
    }
    assert(ex.getMessage.contains("32633") && ex.getMessage.contains("32634"))
    intercept[IllegalArgumentException] {
      cube().withCrs(utm33).mask(cube()) // one-sided CRS is a mismatch too
    }
    intercept[IllegalArgumentException] {
      cube().merge(cube().withCrs(utm34), resolver)
    }
    // both projectionless (the pre-CRS behavior) and both-equal still work
    assert(cube().merge(cube(), resolver).df.count() == 1)
    assert(cube().withCrs(utm33).mask(cube().withCrs(utm33)).df.count() == 1)
  }

  test("crs: resampleProjection re-grids through the composed affine") {
    import spark.implicits._
    import graft.cube.{Crs, DataCube, DimensionMissing}
    val c = DataCube(Seq(
      (0L, 0L, "A", 2.0), (1L, 0L, "A", 4.0),   // centers 5m, 15m → 25m cell 0
      (3L, 0L, "A", 8.0))                        // center 35m → 25m cell 1
      .toDF("x", "y", "band", "value"))
    val src = Crs(32633, a = 10.0, c = 500000.0, e = -10.0, f = 4500000.0)
    val tgt = Crs(32633, a = 25.0, c = 500000.0, e = -25.0, f = 4500000.0)
    intercept[DimensionMissing] { c.resampleProjection(tgt) } // no CRS yet
    intercept[IllegalArgumentException] {
      c.withCrs(src).resampleProjection(Crs(32634, a = 25.0)) // cross-EPSG
    }
    val out = c.withCrs(src).resampleProjection(tgt, "mean")
    assert(out.crs.contains(tgt), "result must carry the target CRS")
    val got = out.df.collect()
      .map(r => (r.getLong(r.fieldIndex("x")), r.getDouble(r.fieldIndex("value"))))
      .toMap
    assert(got == Map(0L -> 3.0, 1L -> 8.0), s"got $got")
  }

  test("seriesAlong: label-ordered arrays, explodeSeries round-trips") {
    import spark.implicits._
    val cube = DataCube(Seq(
      ("b1", 2L, 20.0), ("b1", 1L, 10.0), ("b1", 3L, 30.0),
      ("b2", 1L, 5.0)
    ).toDF("band", "x", "value"))
    val ser = cube.seriesAlong("x").collect()
      .map(r => r.getString(0) ->
        (r.getSeq[Long](1), r.getSeq[Double](2))).toMap
    // arrays follow the LABEL order regardless of input row order
    assert(ser("b1") == (Seq(1L, 2L, 3L), Seq(10.0, 20.0, 30.0)))
    assert(ser("b2") == (Seq(1L), Seq(5.0)))
    // melt back: identical long-format rows
    val back = cube.explodeSeries(cube.seriesAlong("x"), "x").df
      .select("band", "x", "value")
    val orig = cube.df.select("band", "x", "value")
    assert(back.exceptAll(orig).isEmpty && orig.exceptAll(back).isEmpty,
      "explodeSeries must invert seriesAlong")
    // alias resolution + missing-dim rejection
    intercept[DimensionMissing] { cube.seriesAlong("nope") }
  }
}
