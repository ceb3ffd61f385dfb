package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.Exact

/** Top-principal-component PCA over an embedding column, hash-verifiable
  * end-to-end (the D58 trajectory extended from closed-form to ITERATIVE
  * training).
  *
  * Algorithm: mean + power iteration on the covariance, with C·v computed
  * WITHOUT materializing C — C·v = E[x·(x·v)] − μ·(μ·v), so each of the K
  * iterations is one distributed aggregate (a per-row dot product and
  * `dims` decimal sums) over the corpus. That is the scale-correct form:
  * at 100 TB each pass is scan → map-side partial aggregation of `dims`
  * doubles, no shuffle of data rows, no `dims²` moment blow-up, and the
  * driver only ever holds the `dims`-vector iterate (model state, the
  * seeded-centroid precedent).
  *
  * Cross-engine exactness: every data-dependent sum is an
  * order-independent decimal sum ([[Exact.esum]]); everything downstream
  * of the sums — mean division, the w = S/n − μ(μ·v) update, the
  * norm/normalize step, projection and residual — is a FIXED
  * left-associated double DAG that the driver (plain Scala doubles), the
  * Spark plan (Column literals) and the DuckDB oracle (generated CTE
  * chain, [[oracleSql]]) all evaluate identically, so the fitted
  * component, every per-vector projection and every residual norm are
  * bit-identical. The eigenvector's sign is pinned by the deterministic
  * all-⅛ seed. sqrt is IEEE-correctly-rounded in both engines.
  *
  * The op this enables is standard embedding-space post-processing:
  * "all-but-the-top" (Mu & Viswanath 2018) removes the dominant
  * component; `project` returns per-vector (projection, residual-norm).
  */
object Pca {

  private def coord(j: Int): Column =
    element_at(col("embedding"), j + 1).cast("double")

  /** One-expression exact vector-moment aggregate (VecESum Scaladoc has
    * the numeric-parity argument; the alternative — dims separate decimal
    * sums — re-plans and re-janinos a 64-aggregate stage per power
    * iteration). */
  private def vecEsum(arr: Column, dims: Int): Column = {
    import org.apache.spark.sql.GraftBridge.{toColumn, toExpression}
    toColumn(graft.functions.VecESum(toExpression(arr), dims)
      .toAggregateExpression())
  }

  /** The aggregate row for one C·v application: Σ xⱼ·(x·v) for all j as
    * one array.
    *
    * The iterate `v` rides as a ONE-ROW broadcast relation, not as
    * literals: literals inline into the generated code, so every power
    * iteration used to force a fresh Catalyst analysis + janino compile of
    * a 64-wide expression tree (~0.5–0.8 s/pass of pure planning — the
    * dominant cost of embed_pca/embed_pca2 at sf0.1). As column refs the
    * generated source is IDENTICAL each pass and the codegen class cache
    * hits from pass 2 on. Same operand order (xⱼ left, vⱼ right), so every
    * double is bit-identical to the literal form. */
  private def covSums(xdf: DataFrame, dims: Int,
                      v: Array[Double]): Array[Double] = {
    import org.apache.spark.sql.{Row, types => T}
    val vdf = xdf.sparkSession.createDataFrame(
      java.util.Collections.singletonList(Row.fromSeq(v.toSeq)),
      T.StructType((0 until dims).map(j =>
        T.StructField(s"_p$j", T.DoubleType, nullable = false))))
    val dv = (0 until dims).map(j => col(s"_x$j") * col(s"_p$j"))
      .reduceLeft(_ + _)
    xdf.crossJoin(broadcast(vdf))
      .withColumn("_dv", dv)
      .agg(vecEsum(array((0 until dims).map(j =>
        col(s"_x$j") * col("_dv")): _*), dims).as("_w"))
      .head().getSeq[Double](0).toArray
  }

  /** Fit means + top component: 1 + `iters` aggregate passes. Returns
    * (n, means, component).
    *
    * The coordinates are projected to flat columns once (and the per-row
    * dot product to ONE column per iteration) so every aggregate
    * expression is a 3-node product — inlining the 64-term dot into each
    * of the 64 sums instead costs minutes of Catalyst analysis/codegen
    * per pass while computing the identical doubles. The projected frame
    * is persisted across the iterations (iteration reuse, not a
    * correctness requirement). */
  def fit(emb: DataFrame, dims: Int, iters: Int): (Double, Array[Double], Array[Double]) = {
    val xdf = emb.filter(col("embedding").isNotNull)
      .select((0 until dims).map(j => coord(j).as(s"_x$j")): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val first = xdf.agg(count(lit(1)).as("_n"),
        vecEsum(array((0 until dims).map(j => col(s"_x$j")): _*), dims)
          .as("_s")).head()
      val n = first.getLong(0).toDouble
      val sums = first.getSeq[Double](1)
      val m = Array.tabulate(dims)(j => sums(j) / n)
      var v = Array.fill(dims)(0.125)
      for (_ <- 1 to iters) {
        val srow = covSums(xdf, dims, v)
        val mdv = (0 until dims).map(k => m(k) * v(k)).reduceLeft(_ + _)
        val w = Array.tabulate(dims)(j => srow(j) / n - m(j) * mdv)
        val norm = math.sqrt(w.map(x => x * x).reduceLeft(_ + _))
        v = w.map(_ / norm)
      }
      (n, m, v)
    } finally xdf.unpersist(blocking = false)
  }

  /** Per-vector projection on the component and residual norm after
    * removing it (the all-but-the-top decomposition). Means and component
    * ride as plan literals — a pure map, zero shuffle. */
  def project(emb: DataFrame, m: Array[Double], v: Array[Double]): DataFrame = {
    val dims = v.length
    val proj = (0 until dims)
      .map(j => (coord(j) - lit(m(j))) * lit(v(j))).reduceLeft(_ + _)
    val withProj = emb.filter(col("embedding").isNotNull)
      .select(col("vec_id"), col("embedding"), proj.as("_proj"))
    val resid = (0 until dims).map { j =>
      val r = (coord(j) - lit(m(j))) - col("_proj") * lit(v(j))
      r * r
    }.reduceLeft(_ + _)
    withProj.select(col("vec_id"),
      Exact.rnd4(col("_proj")).as("proj"),
      Exact.rnd4(sqrt(resid)).as("resid_norm"))
  }

  /** Fit + project in one call (the `embed_pca` query body). */
  def fitProject(emb: DataFrame, dims: Int, iters: Int): DataFrame = {
    val (_, m, v) = fit(emb, dims, iters)
    project(emb, m, v)
  }

  /** One C·v application at a fixed vector (shared by the Rayleigh
    * quotient and the deflated iteration): returns the un-normalized
    * w = S/n − μ(μ·v) with the same DAG as [[fit]]'s update. */
  private def applyCov(xdf: DataFrame, n: Double, m: Array[Double],
                       v: Array[Double]): Array[Double] = {
    val dims = v.length
    val srow = covSums(xdf, dims, v)
    val mdv = (0 until dims).map(k => m(k) * v(k)).reduceLeft(_ + _)
    Array.tabulate(dims)(j => srow(j) / n - m(j) * mdv)
  }

  /** Two-component fit: the top component as in [[fit]], its Rayleigh
    * quotient λ₁ = u₁·(C·u₁) from one extra pass, then power iteration on
    * the DEFLATED operator C − λ₁u₁u₁ᵀ — each pass is still one dims-sum
    * aggregate plus a literal correction (λ₁·u₁·(u₁·v), driver math).
    * Returns (n, means, u1, lambda1, u2). */
  def fit2(emb: DataFrame, dims: Int, iters: Int): (Double, Array[Double], Array[Double], Double, Array[Double]) = {
    val xdf = emb.filter(col("embedding").isNotNull)
      .select((0 until dims).map(j => coord(j).as(s"_x$j")): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val first = xdf.agg(count(lit(1)).as("_n"),
        vecEsum(array((0 until dims).map(j => col(s"_x$j")): _*), dims)
          .as("_s")).head()
      val n = first.getLong(0).toDouble
      val sums = first.getSeq[Double](1)
      val m = Array.tabulate(dims)(j => sums(j) / n)
      var u1 = Array.fill(dims)(0.125)
      for (_ <- 1 to iters) {
        val w = applyCov(xdf, n, m, u1)
        val norm = math.sqrt(w.map(x => x * x).reduceLeft(_ + _))
        u1 = w.map(_ / norm)
      }
      val w1 = applyCov(xdf, n, m, u1)
      val lam1 = (0 until dims).map(j => u1(j) * w1(j)).reduceLeft(_ + _)
      var u2 = Array.fill(dims)(0.125)
      for (_ <- 1 to iters) {
        val w0 = applyCov(xdf, n, m, u2)
        val uv = (0 until dims).map(k => u1(k) * u2(k)).reduceLeft(_ + _)
        val w = Array.tabulate(dims)(j => w0(j) - lam1 * u1(j) * uv)
        val norm = math.sqrt(w.map(x => x * x).reduceLeft(_ + _))
        u2 = w.map(_ / norm)
      }
      (n, m, u1, lam1, u2)
    } finally xdf.unpersist(blocking = false)
  }

  /** Two-component projection: per-vector (proj1, proj2, residual norm
    * after removing both) — the 2-D embedding map plus what it leaves
    * behind. */
  def project2(emb: DataFrame, m: Array[Double], u1: Array[Double],
               u2: Array[Double]): DataFrame = {
    val dims = u1.length
    def projOn(u: Array[Double]) = (0 until dims)
      .map(j => (coord(j) - lit(m(j))) * lit(u(j))).reduceLeft(_ + _)
    val withProj = emb.filter(col("embedding").isNotNull)
      .select(col("vec_id"), col("embedding"),
        projOn(u1).as("_p1"), projOn(u2).as("_p2"))
    val resid = (0 until dims).map { j =>
      val r = ((coord(j) - lit(m(j))) - col("_p1") * lit(u1(j))) -
        col("_p2") * lit(u2(j))
      r * r
    }.reduceLeft(_ + _)
    withProj.select(col("vec_id"),
      Exact.rnd4(col("_p1")).as("proj1"),
      Exact.rnd4(col("_p2")).as("proj2"),
      Exact.rnd4(sqrt(resid)).as("resid_norm"))
  }

  /** Fit2 + project2 (the `embed_pca2` query body). */
  def fitProject2(emb: DataFrame, dims: Int, iters: Int): DataFrame = {
    val (_, m, u1, _, u2) = fit2(emb, dims, iters)
    project2(emb, m, u1, u2)
  }

  /** D63: embedding-space outlier scoring — the diagonal-covariance
    * Mahalanobis norm. ONE moment pass (count + Σx + Σx² via two
    * [[graft.functions.VecESum]] aggregates), then means/stds ride as
    * plan literals through a zero-shuffle scoring map:
    * z = (x−μ)/σ, znorm = √Σz², outlier = znorm ≥ τ on the rnd4 grid.
    * σ = √max(var, 1e-12) guards constant dims identically in both
    * engines. The standard embedding-QC step before clustering/sampling:
    * broken encodes and out-of-distribution vectors score far from the
    * per-dim envelope. */
  def outlier(emb: DataFrame, dims: Int, tau: Double): DataFrame = {
    val xdf = emb.filter(col("embedding").isNotNull)
    val first = xdf.agg(count(lit(1)).as("_n"),
      vecEsum(array((0 until dims).map(coord): _*), dims).as("_s1"),
      vecEsum(array((0 until dims).map(j => coord(j) * coord(j)): _*), dims)
        .as("_s2")).head()
    val n = first.getLong(0).toDouble
    val s1 = first.getSeq[Double](1); val s2 = first.getSeq[Double](2)
    val m = Array.tabulate(dims)(j => s1(j) / n)
    val sd = Array.tabulate(dims) { j =>
      math.sqrt(math.max(s2(j) / n - m(j) * m(j), 1e-12))
    }
    val z2 = (0 until dims).map { j =>
      val z = (coord(j) - lit(m(j))) / lit(sd(j))
      z * z
    }.reduceLeft(_ + _)
    xdf.select(col("vec_id"),
        Exact.rnd4(sqrt(z2)).as("znorm"))
      .withColumn("is_outlier", col("znorm") >= tau)
  }

  /** Mirror of [[outlier]]: the moment CTE recomputes the identical
    * sums/means/stds, the scoring SELECT the identical z-norm DAG. */
  def outlierOracleSql(dims: Int, tau: Double): String = {
    def x(j: Int) = s"CAST(embedding[${j + 1}] AS DOUBLE)"
    def esum(e: String) =
      s"CAST(sum(CAST($e AS DECIMAL(38,10))) AS DOUBLE)"
    val g = s"g AS (\n  SELECT CAST(count(*) AS DOUBLE) AS nd,\n    " +
      ((0 until dims).map(j => s"${esum(x(j))} AS s$j") ++
       (0 until dims).map(j => s"${esum(s"${x(j)} * ${x(j)}")} AS q$j"))
        .mkString(",\n    ") + "\n  FROM base)"
    val stats = s"st AS (\n  SELECT " +
      (0 until dims).map(j => s"(s$j / nd) AS m$j").mkString(",\n    ") +
      ",\n    " +
      (0 until dims).map(j =>
        s"sqrt(greatest(((q$j / nd) - ((s$j / nd) * (s$j / nd))), 1e-12))" +
          s" AS d$j").mkString(",\n    ") +
      "\n  FROM g)"
    val z2 = (0 until dims).map { j =>
      val z = s"((${x(j)} - st.m$j) / st.d$j)"
      s"($z * $z)"
    }.reduceLeft((a, b) => s"($a + $b)")
    s"""WITH base AS MATERIALIZED (
      |  SELECT vec_id, embedding FROM embeddings
      |  WHERE embedding IS NOT NULL),
      |${g.replace("AS (", "AS MATERIALIZED (")},
      |${stats.replace("AS (", "AS MATERIALIZED (")}
      |SELECT vec_id,
      |  floor((sqrt($z2)) * 10000 + 0.5) / 10000.0 AS znorm,
      |  floor((sqrt($z2)) * 10000 + 0.5) / 10000.0 >= $tau AS is_outlier
      |FROM base CROSS JOIN st""".stripMargin
  }

  /** Two-component mirror of [[fit2]]+[[project2]]: chain `a` replays the
    * top component, a Rayleigh-quotient CTE pins λ₁, chain `b` replays
    * the deflated iteration (the λ₁·u₁·(u₁·v) correction as two 1-row
    * scalar joins per step), and the final SELECT emits proj1 / proj2 /
    * both-removed residual. Same MATERIALIZED-CTE discipline as
    * [[oracleSql]]. */
  def oracleSql2(dims: Int, iters: Int): String = {
    def x(j: Int) = s"CAST(embedding[${j + 1}] AS DOUBLE)"
    def lassoc(terms: Seq[String]): String =
      terms.reduceLeft((a, b) => s"($a + $b)")
    def esum(e: String) =
      s"CAST(sum(CAST($e AS DECIMAL(38,10))) AS DOUBLE)"
    val base = "base AS (\n  SELECT vec_id, embedding FROM embeddings\n" +
      "  WHERE embedding IS NOT NULL)"
    val g = s"g AS (\n  SELECT CAST(count(*) AS DOUBLE) AS nd,\n    " +
      (0 until dims).map(j => s"${esum(x(j))} AS s$j").mkString(",\n    ") +
      "\n  FROM g0)"
    val g0 = s"g0 AS (\n  SELECT embedding FROM base)"
    val mCte = s"m AS (\n  SELECT nd, " +
      (0 until dims).map(j => s"(s$j / nd) AS m$j").mkString(",\n    ") +
      "\n  FROM g)"
    def seeds(name: String) = s"$name AS (\n  SELECT " +
      (0 until dims).map(j => s"CAST(0.125 AS DOUBLE) AS p$j")
        .mkString(",\n    ") + ")"
    def mdvOf(pv: String) = lassoc((0 until dims).map(j => s"(m.m$j * $pv.p$j)"))
    // dot + sums for one C·v application at vector CTE `pv`
    def covApply(tag: String, pv: String): Seq[String] = {
      val dot = lassoc((0 until dims).map(j => s"(${x(j)} * $pv.p$j)"))
      Seq(
        s"${tag}d AS (\n  SELECT embedding, $dot AS dv\n" +
          s"  FROM base CROSS JOIN $pv)",
        s"${tag}w AS (\n  SELECT " +
          (0 until dims).map(j => s"${esum(s"${x(j)} * dv")} AS s$j")
            .mkString(",\n    ") + s"\n  FROM ${tag}d)")
    }
    // one plain-power step prefix$k from prefix${k-1}
    def step(prefix: String, k: Int, deflated: Boolean,
             uCte: String): Seq[String] = {
      val pv = s"$prefix${k - 1}"
      val tag = s"$prefix${k}_"
      val apply = covApply(tag, pv)
      val defl =
        if (!deflated)
          s"${tag}u AS (\n  SELECT " +
            (0 until dims).map(j =>
              s"((${tag}w.s$j / m.nd) - (m.m$j * q.mdv)) AS w$j")
              .mkString(",\n    ") +
            s"\n  FROM ${tag}w CROSS JOIN m CROSS JOIN" +
            s" (SELECT ${mdvOf(pv)} AS mdv FROM m CROSS JOIN $pv) q)"
        else {
          val uv = lassoc((0 until dims).map(j => s"($uCte.p$j * $pv.p$j)"))
          s"${tag}u AS (\n  SELECT " +
            (0 until dims).map(j =>
              s"(((${tag}w.s$j / m.nd) - (m.m$j * q.mdv)) - " +
                s"((lam.lam * $uCte.p$j) * q.uv)) AS w$j")
              .mkString(",\n    ") +
            s"\n  FROM ${tag}w CROSS JOIN m CROSS JOIN lam CROSS JOIN" +
            s" $uCte CROSS JOIN (SELECT ${mdvOf(pv)} AS mdv, $uv AS uv" +
            s" FROM m CROSS JOIN $pv CROSS JOIN $uCte) q)"
        }
      val nrm = lassoc((0 until dims).map(j => s"(w$j * w$j)"))
      val v = s"$prefix$k AS (\n  SELECT " +
        (0 until dims).map(j => s"(w$j / nrm) AS p$j").mkString(",\n    ") +
        s"\n  FROM (SELECT *, sqrt($nrm) AS nrm FROM ${tag}u))"
      apply :+ defl :+ v
    }
    val chainA = (1 to iters).flatMap(k => step("a", k, deflated = false, ""))
    val aN = s"a$iters"
    // Rayleigh quotient: one more C·u1 application, then λ₁ = Σ u1ⱼ·wⱼ
    val lamApply = covApply("l_", aN)
    val lamW = s"l_u AS (\n  SELECT " +
      (0 until dims).map(j =>
        s"((l_w.s$j / m.nd) - (m.m$j * q.mdv)) AS w$j").mkString(",\n    ") +
      s"\n  FROM l_w CROSS JOIN m CROSS JOIN" +
      s" (SELECT ${mdvOf(aN)} AS mdv FROM m CROSS JOIN $aN) q)"
    val lam = s"lam AS (\n  SELECT " +
      lassoc((0 until dims).map(j => s"($aN.p$j * l_u.w$j)")) +
      s" AS lam\n  FROM l_u CROSS JOIN $aN)"
    val chainB = (1 to iters).flatMap(k => step("b", k, deflated = true, aN))
    val bN = s"b$iters"
    def projOn(u: String) = lassoc((0 until dims).map(j =>
      s"((${x(j)} - m.m$j) * $u.p$j)"))
    val scored = s"scored AS (\n  SELECT vec_id, embedding, " +
      s"${projOn(aN)} AS pr1, ${projOn(bN)} AS pr2\n" +
      s"  FROM base CROSS JOIN m CROSS JOIN $aN CROSS JOIN $bN)"
    val resid = lassoc((0 until dims).map { j =>
      val r = s"(((${x(j)} - m.m$j) - (pr1 * $aN.p$j)) - (pr2 * $bN.p$j))"
      s"($r * $r)"
    })
    val ctes = (Seq(base, g0, g, mCte, seeds("a0")) ++ chainA ++
      lamApply ++ Seq(lamW, lam, seeds("b0")) ++ chainB :+ scored)
      .mkString(",\n")
      .replaceAll("AS \\(", "AS MATERIALIZED (")
    s"""WITH $ctes
      |SELECT vec_id,
      |  floor((pr1) * 10000 + 0.5) / 10000.0 AS proj1,
      |  floor((pr2) * 10000 + 0.5) / 10000.0 AS proj2,
      |  floor((sqrt($resid)) * 10000 + 0.5) / 10000.0 AS resid_norm
      |FROM scored CROSS JOIN m CROSS JOIN $aN CROSS JOIN $bN""".stripMargin
  }

  /** DuckDB mirror: the whole fit replayed as a generated CTE chain —
    * means, then per iteration a per-row dot CTE + a sum CTE + the
    * update/normalize CTEs — followed by the projection/residual SELECT.
    * Structurally the identical double DAG [[fit]]/[[project]] evaluate;
    * all column references are CTE-qualified so the cross joins stay
    * unambiguous. */
  def oracleSql(dims: Int, iters: Int): String = {
    def x(j: Int) = s"CAST(embedding[${j + 1}] AS DOUBLE)"
    def lassoc(terms: Seq[String]): String =
      terms.reduceLeft((a, b) => s"($a + $b)")
    def esum(e: String) =
      s"CAST(sum(CAST($e AS DECIMAL(38,10))) AS DOUBLE)"
    val base = "base AS (\n  SELECT vec_id, embedding FROM embeddings\n" +
      "  WHERE embedding IS NOT NULL)"
    val g = s"g AS (\n  SELECT CAST(count(*) AS DOUBLE) AS nd,\n    " +
      (0 until dims).map(j => s"${esum(x(j))} AS s$j").mkString(",\n    ") +
      "\n  FROM base)"
    val mCte = s"m AS (\n  SELECT nd, " +
      (0 until dims).map(j => s"(s$j / nd) AS m$j").mkString(",\n    ") +
      "\n  FROM g)"
    val v0 = s"v0 AS (\n  SELECT " +
      (0 until dims).map(j => s"CAST(0.125 AS DOUBLE) AS p$j")
        .mkString(",\n    ") + ")"
    val iterCtes = (1 to iters).flatMap { k =>
      val pv = s"v${k - 1}"
      val dot = lassoc((0 until dims).map(j => s"(${x(j)} * $pv.p$j)"))
      val d = s"d$k AS (\n  SELECT embedding, $dot AS dv\n" +
        s"  FROM base CROSS JOIN $pv)"
      val w = s"w$k AS (\n  SELECT " +
        (0 until dims).map(j => s"${esum(s"${x(j)} * dv")} AS s$j")
          .mkString(",\n    ") + s"\n  FROM d$k)"
      val mdv = lassoc((0 until dims).map(j => s"(m.m$j * $pv.p$j)"))
      val u = s"u$k AS (\n  SELECT " +
        (0 until dims).map(j =>
          s"((w$k.s$j / m.nd) - (m.m$j * udv.mdv)) AS w$j")
          .mkString(",\n    ") +
        s"\n  FROM w$k CROSS JOIN m CROSS JOIN $pv" +
        s" CROSS JOIN (SELECT $mdv AS mdv FROM m CROSS JOIN $pv) udv)"
      val nrm = lassoc((0 until dims).map(j => s"(w$j * w$j)"))
      val v = s"v$k AS (\n  SELECT " +
        (0 until dims).map(j => s"(w$j / nrm) AS p$j").mkString(",\n    ") +
        s"\n  FROM (SELECT *, sqrt($nrm) AS nrm FROM u$k))"
      Seq(d, w, u, v)
    }
    val vN = s"v$iters"
    val proj = lassoc((0 until dims).map(j =>
      s"((${x(j)} - m.m$j) * $vN.p$j)"))
    val residTerms = lassoc((0 until dims).map { j =>
      val r = s"((${x(j)} - m.m$j) - (proj * $vN.p$j))"
      s"($r * $r)"
    })
    val scored = s"scored AS (\n  SELECT vec_id, embedding, $proj AS proj\n" +
      s"  FROM base CROSS JOIN m CROSS JOIN $vN)"
    // MATERIALIZED: DuckDB inlines CTEs by default, and v{k-1} is
    // referenced three times per iteration — inlined, the chain
    // re-evaluates exponentially (3^iters base scans). Materializing each
    // 1-row iterate keeps the replay linear (the semanticOracleSql
    // precedent).
    val ctes = (Seq(base, g, mCte, v0) ++ iterCtes :+ scored).mkString(",\n")
      .replaceAll("AS \\(", "AS MATERIALIZED (")
    s"""WITH $ctes
      |SELECT vec_id,
      |  floor((proj) * 10000 + 0.5) / 10000.0 AS proj,
      |  floor((sqrt($residTerms)) * 10000 + 0.5) / 10000.0 AS resid_norm
      |FROM scored CROSS JOIN m CROSS JOIN $vN""".stripMargin
  }
}
