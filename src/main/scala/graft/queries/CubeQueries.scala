package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Exact, Tables}
import graft.cube.DataCube

/** openEO cube operators exercised on the testdata lake (SURVEY.md §2B/§2C).
  *
  * Cube constructions used below:
  *  - events cube: dims (time ← ts, band ← event_type, user_id [, event_id]),
  *    value ← value. A sparse irregular time-series cube.
  *  - grid cube: a 64×64 raster derived from lineitem
  *    (x ← l_partkey % 64, y ← l_suppkey % 64, band ← l_returnflag), cell
  *    value = sum of l_quantity. Pre-aggregated so cells are unique.
  *
  * Every float output goes through Exact.rnd4 (identical IEEE rounding on
  * both sides); every window has a deterministic tie-break.
  */
object CubeQueries {

  private def eventsCube(s: SparkSession, d: String): DataCube =
    DataCube(Tables.events(s, d).select(
      col("ts").as("time"), col("event_type").as("band"),
      col("user_id"), col("event_id"), col("value")))

  private def gridCube(s: SparkSession, d: String): DataCube =
    DataCube(Tables.lineitem(s, d)
      .select(pmod(col("l_partkey"), lit(64)).as("x"),
              pmod(col("l_suppkey"), lit(64)).as("y"),
              col("l_returnflag").as("band"), col("l_quantity"))
      .groupBy("x", "y", "band")
      .agg(Exact.rnd4(Exact.esum(col("l_quantity"))).as("value")))

  /** Integer-vertex diamond (rotated square) used by the polygon ops. */
  private[queries] val diamond: Seq[(Double, Double)] =
    Seq((32.0, 2.0), (62.0, 32.0), (32.0, 62.0), (2.0, 32.0))

  /** Named zones for polygon zonal stats (first-match burn order). */
  private val zonePolygons: Seq[(String, Seq[(Double, Double)])] = Seq(
    "diamond" -> diamond,
    "tri_nw"  -> Seq((0.0, 63.0), (0.0, 40.0), (20.0, 63.0)),
    "rect_se" -> Seq((50.0, 0.0), (63.0, 0.0), (63.0, 12.0), (50.0, 12.0)))

  /** SQL mirror of DataCube.insidePolygon: identical edge terms and operand
    * order, so both engines compute bit-identical doubles. */
  private[queries] def insideSql(poly: Seq[(Double, Double)],
                        px: String, py: String): String = {
    val edges = poly.zip(poly.tail :+ poly.head)
    val terms = edges.collect { case ((x1, y1), (x2, y2)) if y1 != y2 =>
      s"""(CASE WHEN ($y1 > $py) <> ($y2 > $py)
         | AND $px < ($x2 - $x1) * ($py - $y1) / ($y2 - $y1) + $x1
         | THEN 1 ELSE 0 END)""".stripMargin.replace("\n", "")
    }
    s"((${terms.mkString(" + ")}) % 2 = 1)"
  }

  private[queries] val gridCubeSql =
    """cube AS (
      |  SELECT l_partkey % 64 AS x, l_suppkey % 64 AS y,
      |         l_returnflag AS band,
      |         floor((CAST(sum(CAST(l_quantity AS DECIMAL(38,10))) AS DOUBLE)) * 10000 + 0.5) / 10000.0 AS value
      |  FROM lineitem GROUP BY 1, 2, 3)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "cube_apply_unary" -> { (s, d) =>
      eventsCube(s, d)
        .applyUnary(v => sqrt(abs(v)) + log(abs(v) + 1))
        .df.select(col("event_id"), Exact.rnd4(col("value")).as("value"))
    },

    "cube_apply_dimension" -> { (s, d) =>
      eventsCube(s, d)
        .cumulateOverDim("time", Seq("user_id"), tieBreak = Seq("event_id"))
        .df.select(col("event_id"), Exact.rnd4(col("value")).as("value"))
    },

    // C45: the openEO cumulative family — cummax/cummin along time
    // through the same apply_dimension window machinery as cumsum (C2);
    // running extrema are exact (no float-order sensitivity), so the two
    // legs join back on the unique cell key with no rounding concerns.
    "cube_cumulative" -> { (s, d) =>
      val c = eventsCube(s, d)
      val mx = c.cumulateOverDim("time", Seq("user_id"),
          tieBreak = Seq("event_id"), reducer = "max")
        .df.select(col("event_id"), col("value").as("cmax"))
      val mn = c.cumulateOverDim("time", Seq("user_id"),
          tieBreak = Seq("event_id"), reducer = "min")
        .df.select(col("event_id").as("_e2"), col("value").as("cmin"))
      mx.join(mn, col("event_id") === col("_e2"))
        .select(col("event_id"),
          Exact.rnd4(col("cmax")).as("cummax"),
          Exact.rnd4(col("cmin")).as("cummin"))
    },

    "cube_reduce_time" -> { (s, d) =>
      val c = DataCube(Tables.events(s, d).select(
        col("ts").as("time"), col("event_type").as("band"),
        col("user_id"), col("value")))
      c.reduceDimension("t", "mean") // alias 't' resolves to 'time'
        .df.select(col("band"), col("user_id"), Exact.rnd4(col("value")).as("value"))
    },

    "cube_agg_temporal" -> { (s, d) =>
      val c = DataCube(Tables.events(s, d).select(
        col("ts").as("time"), col("event_type").as("band"), col("value")))
      c.aggregateTemporalPeriod("day", "sum")
        .df.select(to_date(col("time")).as("day"), col("band"),
                   Exact.rnd4(col("value")).as("value"))
    },

    "cube_zonal_stats" -> { (s, d) =>
      val zones = s.range(64).select(
        col("id").as("zone_id"),
        (col("id") % 8 * 8).as("xmin"), (col("id") % 8 * 8 + 8).as("xmax"),
        (floor(col("id") / 8) * 8).cast("long").as("ymin"),
        (floor(col("id") / 8) * 8 + 8).cast("long").as("ymax"))
      gridCube(s, d)
        .aggregateSpatial(zones, "mean", extraKeys = Seq("band"))
        .select(col("zone_id"), col("band"),
                Exact.rnd4(col("value")).as("value"), col("n_cells"))
    },

    "cube_filter_temporal" -> { (s, d) =>
      eventsCube(s, d)
        .filterTemporal("2024-01-10", "2024-01-20")
        .df.select(col("event_id"), Exact.rnd4(col("value")).as("value"))
    },

    "cube_filter_bbox" -> { (s, d) =>
      gridCube(s, d).filterBbox(16, 48, 8, 40)
        .df.select(col("x"), col("y"), col("band"), col("value"))
    },

    "cube_filter_bands" -> { (s, d) =>
      eventsCube(s, d).filterBands(Seq("click", "view"))
        .df.groupBy(col("band")).agg(count(lit(1)).as("n"))
    },

    "cube_merge" -> { (s, d) =>
      val g = gridCube(s, d)
      val a = DataCube(g.df.filter(col("band") === "N").drop("band"))
      val b = DataCube(g.df.filter(col("band") === "R").drop("band"))
      a.merge(b, (l, r) => coalesce(l, lit(0.0)) + coalesce(r, lit(0.0)))
        .df.select(col("x"), col("y"), Exact.rnd4(col("value")).as("value"))
    },

    "cube_mask" -> { (s, d) =>
      val maskCube = DataCube(Tables.lineitem(s, d)
        .select(pmod(col("l_partkey"), lit(64)).as("x"),
                pmod(col("l_suppkey"), lit(64)).as("y"))
        .groupBy("x", "y")
        .agg(when(count(lit(1)) > 15, 1.0).otherwise(0.0).as("value")))
      gridCube(s, d).mask(maskCube)
        .df.select(col("x"), col("y"), col("band"), col("value"))
    },

    "cube_ndvi" -> { (s, d) =>
      gridCube(s, d).ndvi(nir = "N", red = "R", targetBand = Some("ndvi"))
        .df.select(col("x"), col("y"), col("band"),
                   Exact.rnd4(col("value")).as("value"))
    },

    "cube_interpolate" -> { (s, d) =>
      val c = DataCube(Tables.events(s, d).select(
        col("ts").as("time"), col("user_id"), col("event_id"),
        when(col("event_id") % 7 === 0, lit(null).cast("double"))
          .otherwise(col("value")).as("value")))
      c.interpolateLinear(Seq("user_id"), tieBreak = Seq("event_id"))
        .df.select(col("event_id"), Exact.rnd4(col("value")).as("value"))
    },

    "cube_resample_asof" -> { (s, d) =>
      val c = DataCube(Tables.events(s, d).select(
        col("user_id"), col("ts").as("time"), col("value")))
      val users = Tables.events(s, d)
        .filter(col("user_id") < 50).select(col("user_id")).distinct()
      val times = s.range(1).select(explode(expr(
        "sequence(timestamp'2024-01-03', timestamp'2024-01-28', interval 5 days)"
      )).as("time"))
      c.resampleCubeTemporal(users.crossJoin(times), Seq("user_id"))
        .df.select(col("user_id"), col("time"), Exact.rnd4(col("value")).as("value"))
    },

    "cube_dimension_ops" -> { (s, d) =>
      gridCube(s, d)
        .addDimension("sensor", "s1")
        .renameDimension("band", "channel")
        .renameLabels("channel", Map("N" -> "n", "R" -> "r", "A" -> "a"))
        .df.select(col("x"), col("y"), col("channel"), col("sensor"),
          col("value"))
    },

    "cube_agg_temporal_intervals" -> { (s, d) =>
      val c = DataCube(Tables.events(s, d).select(
        col("ts").as("time"), col("event_type").as("band"), col("value")))
      c.aggregateTemporal(Seq(
          ("2024-01-01", "2024-01-08", "p1"),
          ("2024-01-08", "2024-01-20", "p2"),
          ("2024-01-15", "2024-02-01", "p3")), // overlapping on purpose
          "sum")
        .df.select(col("time"), col("band"),
          Exact.rnd4(col("value")).as("value"))
    },

    "cube_fit_curve" -> { (s, d) =>
      val c = DataCube(Tables.events(s, d).select(
        col("user_id"), col("ts").as("time"), col("value")))
      c.fitCurveQuadratic(Seq("user_id"), epoch = "2024-01-01")
        .select(col("user_id"), Exact.rnd4(col("c0")).as("c0"),
          Exact.rnd4(col("c1")).as("c1"), Exact.rnd4(col("c2")).as("c2"))
    },

    "cube_predict_curve" -> { (s, d) =>
      val c = DataCube(Tables.events(s, d).select(
        col("user_id"), col("event_id"), col("ts").as("time"), col("value")))
      val coefs = DataCube(Tables.events(s, d).select(
        col("user_id"), col("ts").as("time"), col("value")))
        .fitCurveQuadratic(Seq("user_id"), epoch = "2024-01-01")
      c.predictCurveQuadratic(coefs, Seq("user_id"), epoch = "2024-01-01")
        .df.select(col("event_id"), Exact.rnd4(col("value")).as("value"))
    },

    "cube_kernel" -> { (s, d) =>
      // 3×3 binomial kernel, x/16 weights are binary-exact
      val k = Seq(Seq(1, 2, 1), Seq(2, 4, 2), Seq(1, 2, 1))
        .map(_.map(_ / 16.0))
      gridCube(s, d).applyKernel(k, (0, 63), (0, 63))
        .df.select(col("x"), col("y"), col("band"),
          Exact.rnd4(col("value")).as("value"))
    },

    "cube_resample_spatial" -> { (s, d) =>
      gridCube(s, d).resampleSpatial(4, "mean")
        .df.select(col("x"), col("y"), col("band"),
          Exact.rnd4(col("value")).as("value"))
    },

    // resample_spatial with a projection argument: 10 m north-up UTM grid
    // re-gridded to a 25 m grid of the same EPSG — cell centers through
    // the composed affine, mean-reduce on collision. The CRS metadata +
    // affine is the reference's epsg_utils analog (see graft.cube.Crs).
    "cube_reproject" -> { (s, d) =>
      gridCube(s, d)
        .withCrs(graft.cube.Crs(32633, a = 10.0, c = 500000.0,
          e = -10.0, f = 4500000.0))
        .resampleProjection(graft.cube.Crs(32633, a = 25.0, c = 500000.0,
          e = -25.0, f = 4500000.0), "mean")
        .df.select(col("x"), col("y"), col("band"),
          Exact.rnd4(col("value")).as("value"))
    },

    "cube_anomaly" -> { (s, d) =>
      eventsCube(s, d).anomaly("dayofyear")
        .df.select(col("event_id"), Exact.rnd4(col("value")).as("value"))
    },

    "cube_mask_polygon" -> { (s, d) =>
      gridCube(s, d).maskPolygon(diamond)
        .df.select(col("x"), col("y"), col("band"),
          Exact.rnd4(col("value")).as("value"))
    },

    "cube_filter_spatial" -> { (s, d) =>
      gridCube(s, d).filterSpatial(diamond)
        .df.select(col("x"), col("y"), col("band"),
          Exact.rnd4(col("value")).as("value"))
    },

    "cube_neighborhood" -> { (s, d) =>
      gridCube(s, d).applyNeighborhood(1, 1, "median", (0, 63), (0, 63))
        .df.select(col("x"), col("y"), col("band"),
          Exact.rnd4(col("value")).as("value"))
    },

    "cube_reduce_spatial" -> { (s, d) =>
      gridCube(s, d).reduceSpatial("sum")
        .df.select(col("band"), Exact.rnd4(col("value")).as("value"))
    },

    "cube_quantiles" -> { (s, d) =>
      val c = DataCube(Tables.events(s, d).select(
        col("ts").as("time"), col("event_type").as("band"),
        col("user_id"), col("value")))
      c.quantiles("t", Seq(0.25, 0.5, 0.75))
        .select(col("band"), col("user_id"),
          Exact.rnd4(col("q_0_25")).as("q25"),
          Exact.rnd4(col("q_0_5")).as("q50"),
          Exact.rnd4(col("q_0_75")).as("q75"))
    },

    "cube_extrema" -> { (s, d) =>
      val c = DataCube(Tables.events(s, d).select(
        col("ts").as("time"), col("event_type").as("band"), col("value")))
      c.extrema("t")
        .select(col("band"), Exact.rnd4(col("vmin")).as("vmin"),
          Exact.rnd4(col("vmax")).as("vmax"))
    },

    "cube_first_last" -> { (s, d) =>
      val c = DataCube(Tables.events(s, d).select(
        col("ts").as("time"), col("event_type").as("band"),
        col("user_id"), col("value")))
      c.reduceDimension("t", "last")
        .df.select(col("band"), col("user_id"),
          Exact.rnd4(col("value")).as("value"))
    },

    "cube_flatten_dims" -> { (s, d) =>
      gridCube(s, d)
        .flattenDimensions(Seq("x", "y"), "cell", "_")
        .unflattenDimension("cell", Seq("xs", "ys"), "_")
        .df.select(col("xs"), col("ys"), col("band"),
          Exact.rnd4(col("value")).as("value"))
    },

    "cube_resample_grid" -> { (s, d) =>
      val target = DataCube(s.range(22).select((col("id") * 3).as("x"))
        .crossJoin(s.range(22).select((col("id") * 3).as("y")))
        .withColumn("value", lit(0.0)))
      gridCube(s, d).resampleCubeSpatial(target, "mean")
        .df.select(col("x").cast("long").as("x"),
          col("y").cast("long").as("y"), col("band"),
          Exact.rnd4(col("value")).as("value"))
    },

    "scale_linear_range" -> { (s, d) =>
      eventsCube(s, d).linearScaleRange(0.1, 0.9, -1.0, 1.0)
        .df.select(col("event_id"), Exact.rnd4(col("value")).as("value"))
    },

    "cube_sort" -> { (s, d) =>
      val c = DataCube(Tables.events(s, d).select(
        col("ts").as("time"), col("event_type").as("band"),
        col("user_id"), col("value")))
      c.sortAlongDim("time")
        .df.select(col("band"), col("user_id"),
          to_date(col("time")).as("day"),
          Exact.rnd4(col("value")).as("value"))
    },

    // C43: the array-process surface — series view along x, then
    // array_element (first value / last label), array_filter + any
    // (has_gt100), and a filtered sequential-fold sum, melted straight off
    // the series arrays in codegen.
    "cube_array_ops" -> { (s, d) =>
      val ser = gridCube(s, d).seriesAlong("x")
      val vals = col("values")
      ser.select(col("y"), col("band"),
        size(vals).as("n"),
        element_at(vals, 1).as("first_val"),
        element_at(col("labels"), size(col("labels"))).cast("long")
          .as("last_label"),
        exists(vals, x => x > lit(100.0)).as("has_gt100"),
        Exact.rnd4(aggregate(filter(vals, x => x > lit(0.0)),
          lit(0.0), (a, x) => a + x)).as("sum_pos"))
    },

    "cube_order" -> { (s, d) =>
      eventsCube(s, d)
        .orderAlongDim("time", Seq("band", "user_id"),
          tieBreak = Seq("event_id"))
        .df.select(col("band"), col("user_id"),
          col("position").cast("long").as("position"), col("value"))
    },

    "cube_rearrange" -> { (s, d) =>
      // dense 8-label series per band; perm(i) = (3i) mod 8 (a bijection)
      val c = DataCube(Tables.lineitem(s, d)
        .select(pmod(col("l_orderkey"), lit(8)).as("x"),
          col("l_returnflag").as("band"), col("l_quantity"))
        .groupBy("x", "band")
        .agg(Exact.rnd4(Exact.esum(col("l_quantity"))).as("value")))
      c.rearrange("x", (0 until 8).map(i => (3 * i) % 8))
        .df.select(col("x"), col("band"), col("value"))
    },

    "cube_normal" -> { (s, d) =>
      val c = DataCube(Tables.events(s, d).select(
        col("ts").as("time"), col("event_type").as("band"), col("value")))
      c.climatologicalNormal("month")
        .df.select(col("band"), col("period"),
          Exact.rnd4(col("value")).as("value"))
    },

    "cube_moving_avg" -> { (s, d) =>
      eventsCube(s, d)
        .movingAggregate("time", Seq("band", "user_id"), before = 1,
          after = 1, reducer = "mean", tieBreak = Seq("event_id"))
        .df.select(col("event_id"), Exact.rnd4(col("value")).as("value"))
    },

    // degree-3 fit, FULL oracle: the Cramer solve is generated column math
    // (graft.core.Cramer) whose SQL instantiation below evaluates the
    // identical double DAG — bit-identical coefficients cross-engine.
    // fitCurvePoly (pivoting Gaussian, arbitrary degree) keeps its
    // exact-recovery invariants in CubeSpec.
    "cube_fit_cubic" -> { (s, d) =>
      val c = DataCube(Tables.events(s, d).select(
        col("ts").as("time"), col("event_type").as("band"), col("value")))
      c.fitCurveCubic(Seq("band"), "2024-01-01")
        .select((col("band") +:
          (0 to 3).map(k => Exact.rnd4(col(s"c$k")).as(s"c$k"))): _*)
    },

    // degree-4 fit through the PIVOTING GAUSSIAN path (fitCurvePoly) —
    // the driver-gate entry for the degree>3 solve. Both engines build
    // decimal-exact (bit-identical) moments; the oracle solves the same
    // 5×5 normal equations by generated Cramer instead of mirroring the
    // data-dependent pivot order. The two solvers agree to ~1e-12 on
    // these well-conditioned systems — four orders inside the rnd4 hash
    // grid — so the coefficients hash identically.
    "cube_fit_quartic" -> { (s, d) =>
      val c = DataCube(Tables.events(s, d).select(
        col("ts").as("time"), col("event_type").as("band"), col("value")))
      c.fitCurvePoly(Seq("band"), "2024-01-01", degree = 4)
        .select((col("band") +: (0 to 4).map(k =>
          Exact.rnd4(element_at(col("coefs"), k + 1)).as(s"c$k"))): _*)
    },

    "cube_apply_polygon" -> { (s, d) =>
      gridCube(s, d).applyPolygon(diamond, v => v * 2 + 1)
        .df.select(col("x"), col("y"), col("band"),
          Exact.rnd4(col("value")).as("value"))
    },

    // C40: null out everything beyond an interior window, then trim the
    // all-nodata margins — bounds come back as the window; interior nulls
    // survive (coalesce to −1 so the gate never hashes a raw null).
    "cube_trim" -> { (s, d) =>
      val masked = gridCube(s, d).copy(df = gridCube(s, d).df
        .withColumn("value", when(col("x").between(5, 50) &&
          col("y").between(3, 40), col("value"))))
      masked.trimCube()
        .df.select(col("x"), col("y"), col("band"),
          coalesce(Exact.rnd4(col("value")), lit(-1.0)).as("value"))
    },

    "cube_upsample" -> { (s, d) =>
      gridCube(s, d).filterBbox(0, 16, 0, 16).upsampleSpatial(2)
        .df.select(col("x"), col("y"), col("band"),
          Exact.rnd4(col("value")).as("value"))
    },

    "cube_agg_window" -> { (s, d) =>
      gridCube(s, d).aggregateSpatialWindow(8, 4, "max")
        .df.select(col("x"), col("y"), col("band"),
          Exact.rnd4(col("value")).as("value"))
    },

    "cube_reduce_any" -> { (s, d) =>
      val c = DataCube(Tables.events(s, d).select(
        col("ts").as("time"), col("event_type").as("band"),
        col("user_id"), col("value")))
      val flags = c.applyUnary(v => when(v > 0.9, 1.0).otherwise(0.0))
      flags.reduceDimension("t", "any").df
        .join(flags.reduceDimension("t", "all").df
            .withColumnRenamed("value", "all_hi"), Seq("band", "user_id"))
        .select(col("band"), col("user_id"), col("value").as("any_hi"),
          col("all_hi"))
    },

    "cube_zonal_polygons" -> { (s, d) =>
      gridCube(s, d)
        .aggregateSpatialPolygons(zonePolygons, "mean", extraKeys = Seq("band"))
        .select(col("zone_id"), col("band"),
          Exact.rnd4(col("value")).as("value"), col("n_cells"))
    },

    "cube_date_shift" -> { (s, d) =>
      val c = DataCube(Tables.events(s, d).select(
        col("ts").as("time"), col("event_type").as("band"),
        col("event_id"), col("value")))
      c.shiftTime(3, "month")
        .df.select(col("event_id"),
          date_format(col("time"), "yyyy-MM-dd HH:mm:ss").as("shifted"))
    },

    "scale_minmax" -> { (s, d) =>
      eventsCube(s, d).scaleMinMax(perDim = Some("band"))
        .df.select(col("event_id"), Exact.rnd4(col("value")).as("value"))
    },

    // ValueScaling type PROCESSING: whitelisted SQL expression over `x`
    "scale_expression" -> { (s, d) =>
      graft.ml.ProcessExpression.scaleCube(eventsCube(s, d), "sql",
        "(x - 0.5) * 2 + sqrt(abs(x))")
        .df.select(col("event_id"), Exact.rnd4(col("value")).as("value"))
    },

    "scale_zscore" -> { (s, d) =>
      eventsCube(s, d).scaleZScore(perDim = Some("band"))
        .df.select(col("event_id"), Exact.rnd4(col("value")).as("value"))
    },

    "scale_clip" -> { (s, d) =>
      eventsCube(s, d).clip(Some(0.2), Some(0.8)).offset(0.1).scale(0.5)
        .df.select(col("event_id"), Exact.rnd4(col("value")).as("value"))
    }
  )

  /** Mirror of DataCube.fitCurveQuadratic: Gram sums with exact decimal
    * aggregation, Cramer's rule spelled with the same operation order. */
  private def det3Sql(a: String, b: String, c: String, d: String, e: String,
                      f: String, g: String, h: String, i: String): String =
    s"($a * ($e * $i - $f * $h) - $b * ($d * $i - $f * $g) + $c * ($d * $h - $e * $g))"

  private val fitCurveSql: String = {
    val dd = det3Sql("s0", "s1", "s2", "s1", "s2", "s3", "s2", "s3", "s4")
    val d0 = det3Sql("sy", "s1", "s2", "sty", "s2", "s3", "st2y", "s3", "s4")
    val d1 = det3Sql("s0", "sy", "s2", "s1", "sty", "s3", "s2", "st2y", "s4")
    val d2 = det3Sql("s0", "s1", "sy", "s1", "s2", "sty", "s2", "s3", "st2y")
    s"""td AS (
      |  SELECT user_id, event_id, ts,
      |    CAST(epoch_us(ts) - epoch_us(TIMESTAMP '2024-01-01') AS DOUBLE)
      |      / 86400000000.0 AS t,
      |    value AS v
      |  FROM events WHERE value IS NOT NULL),
      |g AS (
      |  SELECT user_id,
      |    CAST(count(*) AS DOUBLE) AS s0,
      |    CAST(sum(CAST(t AS DECIMAL(38,10))) AS DOUBLE) AS s1,
      |    CAST(sum(CAST(t * t AS DECIMAL(38,10))) AS DOUBLE) AS s2,
      |    CAST(sum(CAST(t * t * t AS DECIMAL(38,10))) AS DOUBLE) AS s3,
      |    CAST(sum(CAST(t * t * t * t AS DECIMAL(38,10))) AS DOUBLE) AS s4,
      |    CAST(sum(CAST(v AS DECIMAL(38,10))) AS DOUBLE) AS sy,
      |    CAST(sum(CAST(t * v AS DECIMAL(38,10))) AS DOUBLE) AS sty,
      |    CAST(sum(CAST(t * t * v AS DECIMAL(38,10))) AS DOUBLE) AS st2y
      |  FROM td GROUP BY 1),
      |coefs AS (
      |  SELECT user_id, $d0 / $dd AS c0, $d1 / $dd AS c1, $d2 / $dd AS c2
      |  FROM g)""".stripMargin
  }

  /** Degree-3 mirror of DataCube.fitCurveCubic: moments + Cramer solve,
    * the solve text generated by the SAME graft.core.Cramer expansion the
    * Column side uses — identical double DAG, bit-identical results. */
  private val fitCubicSql: String = {
    import graft.core.Cramer
    val mat = Vector.tabulate(4, 4)((i, j) => s"s${i + j}")
    val rhs = Vector.tabulate(4)(i => s"r$i")
    val coefs = Cramer.solve(mat, rhs, Cramer.sql)
    // mirrors DataCube tpow: foldLeft(1.0)(_ * _) — left-associated, and
    // the leading 1.0 * x is the identity in IEEE doubles
    def tp(k: Int) = (1 to k).map(_ => "t").foldLeft("1.0")((a, b) => s"$a * $b")
    val sSums = (0 to 6).map(k =>
      s"CAST(sum(CAST(${tp(k)} AS DECIMAL(38,10))) AS DOUBLE) AS s$k")
    val rSums = (0 to 3).map(k =>
      s"CAST(sum(CAST(${tp(k)} * v AS DECIMAL(38,10))) AS DOUBLE) AS r$k")
    val sels = coefs.zipWithIndex.map { case (c, k) =>
      s"floor(($c) * 10000 + 0.5) / 10000.0 AS c$k"
    }
    s"""WITH td AS (
      |  SELECT event_type AS band,
      |    CAST(epoch_us(ts) - epoch_us(TIMESTAMP '2024-01-01') AS DOUBLE)
      |      / 86400000000.0 AS t,
      |    value AS v
      |  FROM events WHERE value IS NOT NULL),
      |g AS (
      |  SELECT band,
      |    ${(sSums ++ rSums).mkString(",\n    ")}
      |  FROM td GROUP BY 1)
      |SELECT band, ${sels.mkString(",\n  ")}
      |FROM g""".stripMargin
  }

  /** Degree-4 oracle for the Gaussian fitCurvePoly path: same decimal-
    * exact moments, the solve by generated 5×5 Cramer (an unrolled mirror
    * of data-dependent partial pivoting is not expressible as static SQL;
    * the two solvers agree far inside the rnd4 grid — see the query's
    * comment). */
  private val fitQuarticSql: String = {
    import graft.core.Cramer
    val mat = Vector.tabulate(5, 5)((i, j) => s"s${i + j}")
    val rhs = Vector.tabulate(5)(i => s"r$i")
    val coefs = Cramer.solve(mat, rhs, Cramer.sql)
    def tp(k: Int) = (1 to k).map(_ => "t").foldLeft("1.0")((a, b) => s"$a * $b")
    val sSums = (0 to 8).map(k =>
      s"CAST(sum(CAST(${tp(k)} AS DECIMAL(38,10))) AS DOUBLE) AS s$k")
    val rSums = (0 to 4).map(k =>
      s"CAST(sum(CAST(${tp(k)} * v AS DECIMAL(38,10))) AS DOUBLE) AS r$k")
    val sels = coefs.zipWithIndex.map { case (c, k) =>
      s"floor(($c) * 10000 + 0.5) / 10000.0 AS c$k"
    }
    s"""WITH td AS (
      |  SELECT event_type AS band,
      |    CAST(epoch_us(ts) - epoch_us(TIMESTAMP '2024-01-01') AS DOUBLE)
      |      / 86400000000.0 AS t,
      |    value AS v
      |  FROM events WHERE value IS NOT NULL),
      |g AS (
      |  SELECT band,
      |    ${(sSums ++ rSums).mkString(",\n    ")}
      |  FROM td GROUP BY 1)
      |SELECT band, ${sels.mkString(",\n  ")}
      |FROM g""".stripMargin
  }

  val oracle: Map[String, String] = Map(

    "cube_fit_cubic" -> fitCubicSql,

    "cube_fit_quartic" -> fitQuarticSql,

    "cube_apply_unary" ->
      """SELECT event_id,
        | floor((sqrt(abs(value)) + ln(abs(value) + 1)) * 10000 + 0.5) / 10000.0 AS value
        |FROM events""".stripMargin,

    "cube_apply_dimension" ->
      """SELECT event_id, floor((CAST(sum(CAST(value AS DECIMAL(38,10))) OVER (
        |  PARTITION BY user_id ORDER BY ts, event_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)) * 10000 + 0.5) / 10000.0 AS value
        |FROM events""".stripMargin,

    // Mirror of cube_cumulative: running extrema over the same window.
    "cube_cumulative" ->
      """SELECT event_id,
        |  floor((max(value) OVER w) * 10000 + 0.5) / 10000.0 AS cummax,
        |  floor((min(value) OVER w) * 10000 + 0.5) / 10000.0 AS cummin
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin,

    "cube_reduce_time" ->
      """SELECT event_type AS band, user_id,
        | floor((CAST(sum(CAST(value AS DECIMAL(38,10))) AS DOUBLE)
        |       / count(value)) * 10000 + 0.5) / 10000.0 AS value
        |FROM events GROUP BY 1, 2""".stripMargin,

    "cube_agg_temporal" ->
      """SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
        | event_type AS band,
        | floor((CAST(sum(CAST(value AS DECIMAL(38,10))) AS DOUBLE)) * 10000 + 0.5) / 10000.0 AS value
        |FROM events GROUP BY 1, 2""".stripMargin,

    "cube_zonal_stats" ->
      s"""WITH $gridCubeSql,
        |zones AS (
        |  SELECT i AS zone_id, (i % 8) * 8 AS xmin, (i % 8) * 8 + 8 AS xmax,
        |         (i // 8) * 8 AS ymin, (i // 8) * 8 + 8 AS ymax
        |  FROM range(64) t(i))
        |SELECT zone_id, band,
        |       floor((CAST(sum(CAST(value AS DECIMAL(38,10))) AS DOUBLE)
        |             / count(value)) * 10000 + 0.5) / 10000.0 AS value,
        |       count(*) AS n_cells
        |FROM cube JOIN zones
        |  ON x >= xmin AND x < xmax AND y >= ymin AND y < ymax
        |GROUP BY 1, 2""".stripMargin,

    "cube_filter_temporal" ->
      """SELECT event_id, floor((value) * 10000 + 0.5) / 10000.0 AS value FROM events
        |WHERE ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-20'""".stripMargin,

    "cube_filter_bbox" ->
      s"""WITH $gridCubeSql
        |SELECT x, y, band, value FROM cube
        |WHERE x >= 16 AND x < 48 AND y >= 8 AND y < 40""".stripMargin,

    "cube_filter_bands" ->
      """SELECT event_type AS band, count(*) AS n FROM events
        |WHERE event_type IN ('click', 'view') GROUP BY 1""".stripMargin,

    "cube_merge" ->
      s"""WITH $gridCubeSql,
        |a AS (SELECT x, y, value FROM cube WHERE band = 'N'),
        |b AS (SELECT x, y, value FROM cube WHERE band = 'R')
        |SELECT coalesce(a.x, b.x) AS x, coalesce(a.y, b.y) AS y,
        |  floor((coalesce(a.value, 0) + coalesce(b.value, 0)) * 10000 + 0.5) / 10000.0 AS value
        |FROM a FULL OUTER JOIN b ON a.x = b.x AND a.y = b.y""".stripMargin,

    "cube_mask" ->
      s"""WITH $gridCubeSql,
        |m AS (
        |  SELECT l_partkey % 64 AS x, l_suppkey % 64 AS y,
        |         CASE WHEN count(*) > 15 THEN 1.0 ELSE 0.0 END AS mv
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT cube.x, cube.y, band,
        |  CASE WHEN mv IS NOT NULL AND mv <> 0 THEN NULL ELSE value END AS value
        |FROM cube LEFT JOIN m ON cube.x = m.x AND cube.y = m.y""".stripMargin,

    "cube_ndvi" ->
      s"""WITH $gridCubeSql,
        |nd AS (
        |  SELECT x, y, 'ndvi' AS band,
        |    (sum(CASE WHEN band = 'N' THEN value END) -
        |     sum(CASE WHEN band = 'R' THEN value END)) /
        |    (sum(CASE WHEN band = 'N' THEN value END) +
        |     sum(CASE WHEN band = 'R' THEN value END)) AS value
        |  FROM cube GROUP BY x, y)
        |SELECT x, y, band, floor((value) * 10000 + 0.5) / 10000.0 AS value FROM
        |(SELECT * FROM cube UNION ALL SELECT * FROM nd)""".stripMargin,

    "cube_interpolate" ->
      """WITH c AS (
        |  SELECT event_id, user_id, ts,
        |    CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS v
        |  FROM events),
        |w AS (
        |  SELECT event_id, ts, v,
        |    last_value(CASE WHEN v IS NOT NULL THEN v END IGNORE NULLS)
        |      OVER w_before AS pv,
        |    last_value(CASE WHEN v IS NOT NULL THEN epoch_us(ts) END IGNORE NULLS)
        |      OVER w_before AS pt,
        |    first_value(CASE WHEN v IS NOT NULL THEN v END IGNORE NULLS)
        |      OVER w_after AS nv,
        |    first_value(CASE WHEN v IS NOT NULL THEN epoch_us(ts) END IGNORE NULLS)
        |      OVER w_after AS nt
        |  FROM c
        |  WINDOW
        |    w_before AS (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |    w_after AS (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING))
        |SELECT event_id, floor((CASE WHEN v IS NOT NULL THEN v
        |  ELSE pv + (nv - pv) * (epoch_us(ts) - pt) / (nt - pt) END) * 10000 + 0.5) / 10000.0 AS value
        |FROM w""".stripMargin,

    "cube_resample_asof" ->
      """WITH users AS (SELECT DISTINCT user_id FROM events WHERE user_id < 50),
        |times AS (SELECT unnest(range(TIMESTAMP '2024-01-03',
        |  TIMESTAMP '2024-01-29', INTERVAL 5 DAY)) AS time),
        |tgt AS (SELECT user_id, time, CAST(NULL AS DOUBLE) AS v, 1 AS tag
        |        FROM users CROSS JOIN times),
        |src AS (SELECT user_id, ts AS time, value AS v, 0 AS tag FROM events),
        |u AS (SELECT * FROM src UNION ALL SELECT * FROM tgt),
        |w AS (
        |  SELECT user_id, time, tag,
        |    last_value(CASE WHEN tag = 0 THEN v END IGNORE NULLS)
        |      OVER w_upto AS pv,
        |    last_value(CASE WHEN tag = 0 THEN epoch_us(time) END IGNORE NULLS)
        |      OVER w_upto AS pt,
        |    first_value(CASE WHEN tag = 0 THEN v END IGNORE NULLS)
        |      OVER w_after AS nv,
        |    first_value(CASE WHEN tag = 0 THEN epoch_us(time) END IGNORE NULLS)
        |      OVER w_after AS nt
        |  FROM u
        |  WINDOW
        |    w_upto AS (PARTITION BY user_id ORDER BY time, tag, v ASC NULLS FIRST
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |    w_after AS (PARTITION BY user_id ORDER BY time, tag, v ASC NULLS FIRST
        |      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING))
        |SELECT user_id, time, floor((CASE
        |    WHEN nt IS NULL THEN pv
        |    WHEN pt IS NULL THEN nv
        |    WHEN epoch_us(time) - pt <= nt - epoch_us(time) THEN pv
        |    ELSE nv END) * 10000 + 0.5) / 10000.0 AS value
        |FROM w WHERE tag = 1""".stripMargin,

    "cube_dimension_ops" ->
      s"""WITH $gridCubeSql
        |SELECT x, y,
        |  CASE band WHEN 'N' THEN 'n' WHEN 'R' THEN 'r' WHEN 'A' THEN 'a'
        |       ELSE band END AS channel,
        |  's1' AS sensor, value
        |FROM cube""".stripMargin,

    "cube_agg_temporal_intervals" ->
      """WITH iv(lo, hi, label) AS (VALUES
        |  (TIMESTAMP '2024-01-01', TIMESTAMP '2024-01-08', 'p1'),
        |  (TIMESTAMP '2024-01-08', TIMESTAMP '2024-01-20', 'p2'),
        |  (TIMESTAMP '2024-01-15', TIMESTAMP '2024-02-01', 'p3'))
        |SELECT label AS time, event_type AS band,
        |  floor((CAST(sum(CAST(value AS DECIMAL(38,10))) AS DOUBLE)) * 10000 + 0.5) / 10000.0 AS value
        |FROM events JOIN iv ON ts >= lo AND ts < hi
        |GROUP BY 1, 2""".stripMargin,

    "cube_trim" ->
      s"""WITH $gridCubeSql,
        |n AS (
        |  SELECT x, y, band,
        |    CASE WHEN x BETWEEN 5 AND 50 AND y BETWEEN 3 AND 40
        |         THEN value END AS value
        |  FROM cube),
        |b AS (
        |  SELECT min(x) AS x0, max(x) AS x1, min(y) AS y0, max(y) AS y1
        |  FROM n WHERE value IS NOT NULL)
        |SELECT n.x, n.y, n.band,
        |  coalesce(floor((value) * 10000 + 0.5) / 10000.0, -1.0) AS value
        |FROM n, b
        |WHERE n.x BETWEEN x0 AND x1 AND n.y BETWEEN y0 AND y1""".stripMargin,

    "cube_fit_curve" ->
      s"""WITH $fitCurveSql
        |SELECT user_id,
        |  floor((c0) * 10000 + 0.5) / 10000.0 AS c0,
        |  floor((c1) * 10000 + 0.5) / 10000.0 AS c1,
        |  floor((c2) * 10000 + 0.5) / 10000.0 AS c2
        |FROM coefs""".stripMargin,

    "cube_predict_curve" ->
      s"""WITH $fitCurveSql
        |SELECT event_id, floor((c0 + c1 * (CAST(epoch_us(ts) - epoch_us(TIMESTAMP '2024-01-01') AS DOUBLE) / 86400000000.0)
        |  + c2 * (CAST(epoch_us(ts) - epoch_us(TIMESTAMP '2024-01-01') AS DOUBLE) / 86400000000.0)
        |       * (CAST(epoch_us(ts) - epoch_us(TIMESTAMP '2024-01-01') AS DOUBLE) / 86400000000.0))
        |  * 10000 + 0.5) / 10000.0 AS value
        |FROM events JOIN coefs USING (user_id)""".stripMargin,

    "cube_kernel" ->
      s"""WITH $gridCubeSql,
        |k(dx, dy, w) AS (VALUES
        |  (-1, -1, 1/16.0), (0, -1, 2/16.0), (1, -1, 1/16.0),
        |  (-1,  0, 2/16.0), (0,  0, 4/16.0), (1,  0, 2/16.0),
        |  (-1,  1, 1/16.0), (0,  1, 2/16.0), (1,  1, 1/16.0))
        |SELECT cube.x - dx AS x, cube.y - dy AS y, band,
        |  floor((CAST(sum(CAST(value * w AS DECIMAL(38,10))) AS DOUBLE))
        |        * 10000 + 0.5) / 10000.0 AS value
        |FROM cube CROSS JOIN k
        |WHERE cube.x - dx BETWEEN 0 AND 63 AND cube.y - dy BETWEEN 0 AND 63
        |GROUP BY 1, 2, 3""".stripMargin,

    "cube_resample_spatial" ->
      s"""WITH $gridCubeSql
        |SELECT CAST(floor(x / 4) AS BIGINT) AS x,
        |       CAST(floor(y / 4) AS BIGINT) AS y, band,
        |  floor((CAST(sum(CAST(value AS DECIMAL(38,10))) AS DOUBLE)
        |        / count(value)) * 10000 + 0.5) / 10000.0 AS value
        |FROM cube GROUP BY 1, 2, 3""".stripMargin,

    // mirrors DataCube.resampleProjection operand-for-operand: cell center
    // through the source affine, minus target origin, divided by target
    // pixel size, floored. Every literal is a dyadic-exact double, so both
    // engines see identical IEEE operations.
    "cube_reproject" ->
      s"""WITH $gridCubeSql
        |SELECT
        |  CAST(floor((((CAST(x AS DOUBLE) + 0.5) * 10.0 + 500000.0)
        |              - 500000.0) / 25.0) AS BIGINT) AS x,
        |  CAST(floor((((CAST(y AS DOUBLE) + 0.5) * -10.0 + 4500000.0)
        |              - 4500000.0) / -25.0) AS BIGINT) AS y, band,
        |  floor((CAST(sum(CAST(value AS DECIMAL(38,10))) AS DOUBLE)
        |        / count(value)) * 10000 + 0.5) / 10000.0 AS value
        |FROM cube GROUP BY 1, 2, 3""".stripMargin,

    "cube_anomaly" ->
      """SELECT event_id, floor((value -
        |  CAST(sum(CAST(value AS DECIMAL(38,10))) OVER w AS DOUBLE)
        |    / count(value) OVER w) * 10000 + 0.5) / 10000.0 AS value
        |FROM events
        |WINDOW w AS (PARTITION BY event_type, dayofyear(ts))""".stripMargin,

    "cube_mask_polygon" -> {
      val inside = insideSql(diamond, "CAST(x AS DOUBLE)", "CAST(y AS DOUBLE)")
      s"""WITH $gridCubeSql
        |SELECT x, y, band,
        |  CASE WHEN NOT $inside THEN NULL
        |       ELSE floor((value) * 10000 + 0.5) / 10000.0 END AS value
        |FROM cube""".stripMargin
    },

    "cube_filter_spatial" -> {
      val inside = insideSql(diamond, "CAST(x AS DOUBLE)", "CAST(y AS DOUBLE)")
      s"""WITH $gridCubeSql
        |SELECT x, y, band, floor((value) * 10000 + 0.5) / 10000.0 AS value
        |FROM cube WHERE $inside""".stripMargin
    },

    "cube_neighborhood" ->
      s"""WITH $gridCubeSql,
        |offs(dx, dy) AS (VALUES
        |  (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),(0,1),(1,-1),(1,0),(1,1))
        |SELECT cube.x + dx AS x, cube.y + dy AS y, band,
        |  floor((median(value)) * 10000 + 0.5) / 10000.0 AS value
        |FROM cube CROSS JOIN offs
        |WHERE cube.x + dx BETWEEN 0 AND 63 AND cube.y + dy BETWEEN 0 AND 63
        |GROUP BY 1, 2, 3""".stripMargin,

    "cube_reduce_spatial" ->
      s"""WITH $gridCubeSql
        |SELECT band,
        |  floor((CAST(sum(CAST(value AS DECIMAL(38,10))) AS DOUBLE)) * 10000 + 0.5) / 10000.0 AS value
        |FROM cube GROUP BY 1""".stripMargin,

    "cube_quantiles" ->
      """SELECT event_type AS band, user_id,
        |  floor((quantile_cont(value, 0.25)) * 10000 + 0.5) / 10000.0 AS q25,
        |  floor((quantile_cont(value, 0.5)) * 10000 + 0.5) / 10000.0 AS q50,
        |  floor((quantile_cont(value, 0.75)) * 10000 + 0.5) / 10000.0 AS q75
        |FROM events GROUP BY 1, 2""".stripMargin,

    "cube_extrema" ->
      """SELECT event_type AS band,
        |  floor((min(value)) * 10000 + 0.5) / 10000.0 AS vmin,
        |  floor((max(value)) * 10000 + 0.5) / 10000.0 AS vmax
        |FROM events GROUP BY 1""".stripMargin,

    "cube_first_last" ->
      """WITH r AS (
        |  SELECT event_type AS band, user_id, value,
        |    row_number() OVER (PARTITION BY event_type, user_id
        |      ORDER BY ts DESC NULLS LAST, value DESC NULLS LAST) AS rn
        |  FROM events)
        |SELECT band, user_id, floor((value) * 10000 + 0.5) / 10000.0 AS value
        |FROM r WHERE rn = 1""".stripMargin,

    "cube_flatten_dims" ->
      s"""WITH $gridCubeSql
        |SELECT CAST(x AS VARCHAR) AS xs, CAST(y AS VARCHAR) AS ys, band,
        |  floor((value) * 10000 + 0.5) / 10000.0 AS value
        |FROM cube""".stripMargin,

    "cube_resample_grid" ->
      s"""WITH $gridCubeSql
        |SELECT 3 * CAST(floor(CAST(x AS DOUBLE) / 3 + 0.5) AS BIGINT) AS x,
        |       3 * CAST(floor(CAST(y AS DOUBLE) / 3 + 0.5) AS BIGINT) AS y,
        |       band,
        |  floor((CAST(sum(CAST(value AS DECIMAL(38,10))) AS DOUBLE)
        |        / count(value)) * 10000 + 0.5) / 10000.0 AS value
        |FROM cube GROUP BY 1, 2, 3""".stripMargin,

    "scale_linear_range" ->
      """SELECT event_id, floor((
        |  (least(greatest(value, 0.1), 0.9) - 0.1) / (0.9 - 0.1)
        |    * (1.0 - (-1.0)) + (-1.0)) * 10000 + 0.5) / 10000.0 AS value
        |FROM events""".stripMargin,

    // sort: labels keep their order, values are sorted into them. Ties on
    // value pair ambiguously but produce identical row multisets, so the
    // sorted-rows hash is stable across engines.
    "cube_sort" ->
      """WITH base AS (
        |  SELECT event_type AS band, user_id, ts, value
        |  FROM events WHERE value IS NOT NULL),
        |lab AS (
        |  SELECT band, user_id, ts, row_number() OVER
        |    (PARTITION BY band, user_id ORDER BY ts) AS rn FROM base),
        |v AS (
        |  SELECT band, user_id, value, row_number() OVER
        |    (PARTITION BY band, user_id ORDER BY value, ts) AS rn FROM base)
        |SELECT lab.band, lab.user_id,
        |  CAST(date_trunc('day', lab.ts) AS DATE) AS day,
        |  floor(v.value * 10000 + 0.5) / 10000.0 AS value
        |FROM lab JOIN v ON lab.band = v.band AND lab.user_id = v.user_id
        |  AND lab.rn = v.rn""".stripMargin,

    // Mirror of cube_array_ops: list(… ORDER BY x) is the series array;
    // list_sum over the filtered ordered list is the same sequential left
    // fold as Spark's aggregate().
    "cube_array_ops" ->
      s"""WITH $gridCubeSql,
        |ser AS (
        |  SELECT y, band, list(x ORDER BY x) AS lx,
        |    list(value ORDER BY x) AS lv
        |  FROM cube GROUP BY 1, 2)
        |SELECT y, band,
        |  CAST(len(lv) AS INT) AS n,
        |  lv[1] AS first_val,
        |  CAST(lx[len(lx)] AS BIGINT) AS last_label,
        |  len(list_filter(lv, v -> v > 100.0)) > 0 AS has_gt100,
        |  floor((COALESCE(list_sum(list_filter(lv, v -> v > 0.0)), 0.0))
        |    * 10000 + 0.5) / 10000.0 AS sum_pos
        |FROM ser""".stripMargin,

    "cube_order" ->
      """SELECT event_type AS band, user_id,
        |  row_number() OVER (PARTITION BY event_type, user_id
        |    ORDER BY value, ts, event_id) - 1 AS position,
        |  row_number() OVER (PARTITION BY event_type, user_id
        |    ORDER BY ts, event_id) - 1 AS value
        |FROM events""".stripMargin,

    // output position i takes the value at source position (3i) mod 8;
    // 3 is its own inverse mod 8, so source x lands at output (3x) mod 8.
    "cube_rearrange" ->
      """WITH cube AS (
        |  SELECT l_orderkey % 8 AS x, l_returnflag AS band,
        |    floor((CAST(sum(CAST(l_quantity AS DECIMAL(38,10))) AS DOUBLE)) * 10000 + 0.5) / 10000.0 AS value
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT (x * 3) % 8 AS x, band, value FROM cube""".stripMargin,

    "cube_normal" ->
      """SELECT event_type AS band, month(ts) AS period,
        |  floor((CAST(sum(CAST(value AS DECIMAL(38,10))) AS DOUBLE)
        |         / count(value)) * 10000 + 0.5) / 10000.0 AS value
        |FROM events GROUP BY 1, 2""".stripMargin,

    "cube_moving_avg" ->
      """SELECT event_id, floor((
        |  CAST(sum(CAST(value AS DECIMAL(38,10))) OVER w AS DOUBLE)
        |    / count(value) OVER w) * 10000 + 0.5) / 10000.0 AS value
        |FROM events
        |WINDOW w AS (PARTITION BY event_type, user_id
        |  ORDER BY ts, event_id ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING)""".stripMargin,

    "cube_apply_polygon" -> {
      val inside = insideSql(diamond, "CAST(x AS DOUBLE)", "CAST(y AS DOUBLE)")
      s"""WITH $gridCubeSql
        |SELECT x, y, band,
        |  floor((CASE WHEN $inside THEN value * 2 + 1 ELSE value END)
        |    * 10000 + 0.5) / 10000.0 AS value
        |FROM cube""".stripMargin
    },

    "cube_upsample" ->
      s"""WITH $gridCubeSql,
        |off(dx, dy) AS (VALUES (0,0),(0,1),(1,0),(1,1))
        |SELECT x * 2 + dx AS x, y * 2 + dy AS y, band, value
        |FROM cube CROSS JOIN off
        |WHERE x >= 0 AND x < 16 AND y >= 0 AND y < 16""".stripMargin,

    "cube_agg_window" ->
      s"""WITH $gridCubeSql
        |SELECT x // 8 AS x, y // 4 AS y, band,
        |  floor((max(value)) * 10000 + 0.5) / 10000.0 AS value
        |FROM cube GROUP BY 1, 2, 3""".stripMargin,

    "cube_reduce_any" ->
      """SELECT event_type AS band, user_id,
        |  max(CASE WHEN value > 0.9 THEN CAST(1 AS DOUBLE)
        |      ELSE CAST(0 AS DOUBLE) END) AS any_hi,
        |  min(CASE WHEN value > 0.9 THEN CAST(1 AS DOUBLE)
        |      ELSE CAST(0 AS DOUBLE) END) AS all_hi
        |FROM events GROUP BY 1, 2""".stripMargin,

    "cube_zonal_polygons" -> {
      val px = "CAST(x AS DOUBLE)"
      val py = "CAST(y AS DOUBLE)"
      val cases = zonePolygons.map { case (name, poly) =>
        s"WHEN ${insideSql(poly, px, py)} THEN '$name'"
      }.mkString(" ")
      s"""WITH $gridCubeSql,
        |labeled AS (
        |  SELECT CASE $cases END AS zone_id, band, value FROM cube)
        |SELECT zone_id, band,
        |  floor((CAST(sum(CAST(value AS DECIMAL(38,10))) AS DOUBLE)
        |         / count(value)) * 10000 + 0.5) / 10000.0 AS value,
        |  count(*) AS n_cells
        |FROM labeled WHERE zone_id IS NOT NULL
        |GROUP BY 1, 2""".stripMargin
    },

    "cube_date_shift" ->
      """SELECT event_id,
        |  strftime(ts + INTERVAL 3 MONTH, '%Y-%m-%d %H:%M:%S') AS shifted
        |FROM events""".stripMargin,

    "scale_expression" ->
      """SELECT event_id, floor((
        |  (value - 0.5) * 2 + sqrt(abs(value))) * 10000 + 0.5) / 10000.0 AS value
        |FROM events""".stripMargin,

    "scale_minmax" ->
      """SELECT event_id, floor((
        |  (value - min(value) OVER w) /
        |  (max(value) OVER w - min(value) OVER w)) * 10000 + 0.5) / 10000.0 AS value
        |FROM events WINDOW w AS (PARTITION BY event_type)""".stripMargin,

    "scale_zscore" ->
      """WITH t AS (
        |  SELECT event_id, value,
        |    CAST(sum(CAST(value AS DECIMAL(38,10))) OVER w AS DOUBLE) AS sv,
        |    CAST(sum(CAST(value * value AS DECIMAL(38,10))) OVER w AS DOUBLE) AS sv2,
        |    count(value) OVER w AS n
        |  FROM events WINDOW w AS (PARTITION BY event_type))
        |SELECT event_id, floor((
        |  (value - sv / n) / sqrt(sv2 / n - (sv / n) * (sv / n))) * 10000 + 0.5) / 10000.0 AS value
        |FROM t""".stripMargin,

    "scale_clip" ->
      """SELECT event_id,
        | floor(((least(greatest(value, 0.2), 0.8) - 0.1) / 0.5) * 10000 + 0.5) / 10000.0 AS value
        |FROM events""".stripMargin
  )
}
