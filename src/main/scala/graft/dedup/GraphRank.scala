package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Exact

/** D74: PageRank centrality over the near-duplicate candidate graph —
  * graph importance as a curation signal: within a duplication
  * neighborhood the most-connected document is the canonical carrier
  * (template hubs, boilerplate centers, heavily-mirrored originals), the
  * graph twin of the quality-based keep-best policy (D47) and a crawl
  * re-prioritization signal.
  *
  * Fixed-iteration power method (iters = 4, damping 0.85) with uniform
  * dangling-mass redistribution:
  *
  *   r₀ = 1/N;  rₜ₊₁(v) = (1−α)/N + α·(Σ_{u→v} rₜ(u)/deg(u) + Dₜ/N)
  *
  * where Dₜ is the total rank on isolated nodes. Every per-node sum is
  * decimal-exact ([[Exact.esum]]) so each iterate is partition-invariant,
  * divisions are pinned IEEE ops, and the oracle unrolls the identical
  * recurrence (CTEs MATERIALIZED — each iterate is referenced twice, and
  * inlined it would re-run the minhash chain exponentially). Output is
  * r·N (relative centrality, mean 1) on the rnd4 grid.
  *
  * Scale shape: the canonical distributed PageRank — per iteration ONE
  * ranks⋈edges join (both sides keyed on the node id; at lake scale the
  * edge set is pre-partitioned by src once and every iteration reuses
  * that partitioning) and one O(edges) partial-agg shuffle; the dangling
  * term is a 1-row aggregate. Iterates persist round-to-round with the
  * previous round explicitly unpersisted (the star-contraction loop's
  * lineage discipline); the final iterate stays cached for the consumer
  * (caller-owned, the jaccardAuto convention).
  */
object GraphRank {

  /** PageRank over undirected candidate `pairs` (doc_a, doc_b) among
    * `nodes` (single id column). Returns (id, deg, rank_score).
    *
    * N and each round's dangling mass Dₜ are DRIVER literals; the update
    * expression keeps the exact IEEE DAG the oracle mirrors, only with
    * the two scalars inlined. The edge set and degree table are
    * force-materialized once and stay cached for the returned plan
    * (caller-owned, the jaccardAuto convention) — without that the
    * terminal consumer would recompute the whole candidate chain for the
    * final degree join.
    *
    * r14: Dₜ no longer costs a per-round aggregation job. A node carries
    * dangling mass iff it has NO edges at all (deg counts both
    * directions, so degree-0 means it neither sends nor receives), and
    * every such node's iterate is the SAME closed-form double — it gets
    * no contribution, so rₜ₊₁(iso) = (1−α)/N + α·Dₜ/N, evaluated in the
    * identical operation order as the distributed update expression. Dₜ
    * is then the decimal-exact sum of n_iso copies of that one double,
    * which [[esumOfConst]] replays bit-for-bit off the executed plan
    * (cast-to-DECIMAL(38,10) per row, exact decimal add, cast back).
    * What was `iters + 1` blocking anti-join aggregation jobs is now one
    * isolated-node count, and with the per-round materialization gone
    * the whole `iters`-round recurrence collapses into ONE lazy plan the
    * final action executes end-to-end (the round DAG is linear — each
    * iterate is referenced exactly once by the next — so nothing is
    * re-executed; ids/edges/deg are cached and read k times from cache).
    * Iterate values are bit-identical to the per-round-materialized
    * form; the oracle is unchanged. */
  def pageRank(nodes: DataFrame, pairs: DataFrame, iters: Int = 4,
               damping: Double = 0.85): DataFrame = {
    val idCol = nodes.columns.head
    // Cache ids and edges ALREADY PARTITIONED on their join keys: the
    // cached partitioning is what each round's joins reuse — without it
    // every iteration re-exchanges the O(nodes) id set and the O(edges)
    // edge set (4 rounds × 2 avoidable shuffles at lake scale).
    val ids = graft.core.CacheScope.pin(nodes.select(col(idCol).as("id"))
      .repartition(col("id")))
    val nD = ids.count().toDouble
    val edges = graft.core.CacheScope.pin(
      pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
        .unionByName(pairs.select(col("doc_b").as("src"),
          col("doc_a").as("dst")))
        .repartition(col("src")))
    val deg = graft.core.CacheScope.pin(
      edges.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg")))
    // one job materializes edges + deg AND counts the dangling nodes
    val nIso = ids.join(deg, Seq("id"), "left_anti").count()
    var rIso = 1.0 / nD
    var dVal = esumOfConst(rIso, nIso)
    var ranks = ids.select(col("id"), lit(1.0 / nD).as("r"))
    for (_ <- 0 until iters) {
      val contrib = ranks.join(deg, "id")
        .select(col("id"), (col("r") / col("deg").cast("double")).as("m"))
        .join(edges, col("id") === col("src"))
        .groupBy(col("dst").as("id"))
        .agg(esum10(col("m")).as("c"))
      ranks = ids
        .join(contrib, Seq("id"), "left")
        .select(col("id"),
          (lit(1.0 - damping) / lit(nD) +
            lit(damping) * (coalesce(col("c"), lit(0.0)) +
              lit(dVal) / lit(nD))).as("r"))
      // the same IEEE DAG the expression above evaluates for a
      // contribution-less node, in the same operation order
      rIso = (1.0 - damping) / nD + damping * (0.0 + dVal / nD)
      dVal = esumOfConst(rIso, nIso)
    }
    ranks
      .join(deg, Seq("id"), "left")
      .select(col("id").as("doc_id"),
        coalesce(col("deg"), lit(0L)).as("deg"),
        Exact.rnd4(col("r") * lit(nD)).as("rank_score"))
  }

  /** Exact order-free sum on the 1e-10 grid with a PURE-IEEE per-row
    * image: Σ floor(x·10¹⁰ + 0.5) as BIGINT, divided back by 10¹⁰ as one
    * double op — the [[Exact.rnd4]] construction lifted to an aggregate.
    *
    * Why not [[Exact.esum]] here: the CAST(double AS DECIMAL(38,10))
    * per-row image is engine-internal — Spark rounds HALF_UP on the
    * double's SHORTEST-STRING decimal form, DuckDB on its exact binary
    * expansion — and PageRank iterates are sums of scale-10 decimals and
    * short literals, so r/deg routinely TERMINATES exactly at decimal
    * digit 11 with a '5': Spark's string image sits exactly on the half
    * boundary (always rounds up) while the binary value falls on whichever
    * side the nearest double landed (r14 found dedup_graph_rank's round-2
    * hub contribution 2 grid-ulps apart between the engines at sf0.1,
    * flipping one rnd4'd output). floor(x·10¹⁰ + 0.5) is the same double
    * DAG in both engines, so the per-row image — and therefore the sum —
    * is identical by construction, not by cast-internals luck. */
  private[graft] def esum10(x: Column): Column =
    sum(floor(x * lit(1.0e10) + lit(0.5))).cast("double") / lit(1.0e10)

  /** `coalesce(esum10(r), 0.0)` over `n` rows that all carry the same
    * double `r`, replayed on the driver: per-row image
    * k = floor(r·10¹⁰ + 0.5) (exact — PageRank iterates keep r ≤ 1, so
    * r·10¹⁰ + 0.5 < 2⁵³), long sum = n·k (≤ ~10¹⁰ because Σr ≤ 1 + ε),
    * one double division back. Empty input (n = 0) coalesces to 0.0.
    * Pinned bit-for-bit by GraphRankSpec against the executed aggregate. */
  private[graft] def esumOfConst(r: Double, n: Long): Double =
    if (n == 0L) 0.0
    else (n * math.floor(r * 1.0e10 + 0.5).toLong).toDouble / 1.0e10

  /** Oracle CTE suffix over `cand` (doc_a, doc_b) and `corpus` (doc_id)
    * CTEs: unrolled fixed-iteration replay. Terminal CTE: `pr_out`. */
  def oracleSql(iters: Int = 4, damping: Double = 0.85): String = {
    val a = damping.toString
    val oneMinus = (1.0 - damping).toString
    val iterCtes = (1 to iters).map { t =>
      s"""prd$t AS MATERIALIZED (
         |  SELECT coalesce(CAST(sum(CAST(floor(r.r * 10000000000.0 + 0.5)
         |    AS BIGINT)) AS DOUBLE), 0.0) / 10000000000.0 AS d
         |  FROM prr${t - 1} r LEFT JOIN prdeg dg ON dg.id = r.id
         |  WHERE dg.id IS NULL),
         |prc$t AS MATERIALIZED (
         |  SELECT e.dst AS id,
         |    CAST(sum(CAST(floor(r.r / CAST(dg.deg AS DOUBLE)
         |      * 10000000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
         |      / 10000000000.0 AS c
         |  FROM prr${t - 1} r
         |  JOIN prdeg dg ON dg.id = r.id
         |  JOIN predges e ON e.src = r.id
         |  GROUP BY e.dst),
         |prr$t AS MATERIALIZED (
         |  SELECT nd.id,
         |    $oneMinus / CAST(nn.n AS DOUBLE)
         |      + $a * (coalesce(c.c, 0.0) + d.d / CAST(nn.n AS DOUBLE)) AS r
         |  FROM prnodes nd
         |  LEFT JOIN prc$t c ON c.id = nd.id
         |  CROSS JOIN prn nn CROSS JOIN prd$t d)""".stripMargin
    }.mkString(",\n")
    s"""predges AS MATERIALIZED (
       |  SELECT doc_a AS src, doc_b AS dst FROM cand
       |  UNION ALL SELECT doc_b, doc_a FROM cand),
       |prnodes AS MATERIALIZED (SELECT doc_id AS id FROM corpus),
       |prn AS (SELECT count(*) AS n FROM prnodes),
       |prdeg AS MATERIALIZED (
       |  SELECT src AS id, count(*) AS deg FROM predges GROUP BY 1),
       |prr0 AS MATERIALIZED (
       |  SELECT id, 1.0 / CAST(nn.n AS DOUBLE) AS r
       |  FROM prnodes CROSS JOIN prn nn),
       |$iterCtes,
       |pr_out AS (
       |  SELECT r.id AS doc_id, coalesce(dg.deg, 0) AS deg,
       |    floor((r.r * CAST(nn.n AS DOUBLE)) * 10000 + 0.5) / 10000.0
       |      AS rank_score
       |  FROM prr$iters r
       |  LEFT JOIN prdeg dg ON dg.id = r.id
       |  CROSS JOIN prn nn)""".stripMargin
  }

  /** D82: per-node triangle count + local clustering coefficient over the
    * candidate graph — the graph-QC twin of PageRank: high clustering
    * marks tight mirror cliques (every copy pairs with every copy), low
    * clustering at high degree marks template hubs that chain unrelated
    * documents (the bucket pathology the cap guards). A curation pipeline
    * reads this to decide cluster-collapse vs hub-investigation.
    *
    * Degree-oriented wedge counting (the standard distributed shape):
    * orient every edge from its (deg, id)-smaller endpoint, generate
    * wedges only at each node's out-neighbors, close them against the
    * oriented edge set — each triangle is found exactly once at its
    * smallest member, and wedge volume is bounded by O(E^{3/2})
    * regardless of hub degree (id-ordered wedges would explode
    * quadratically at a high-degree hub). Joins are integer equi-joins;
    * counts exact; the coefficient 2T/(d(d−1)) is one pinned double DAG.
    * The oracle counts the same triangles by the simpler a<b<c id-order
    * three-way join — algorithm-independent set equality.
    */
  def triangleStats(pairs: DataFrame): DataFrame = {
    val e = pairs.select(col("doc_a").as("a"), col("doc_b").as("b"))
      .distinct()
    val deg = e.select(col("a").as("v"))
      .unionByName(e.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("deg"))
    val withDeg = e
      .join(deg.select(col("v").as("a"), col("deg").as("da")), Seq("a"))
      .join(deg.select(col("v").as("b"), col("deg").as("db")), Seq("b"))
    val aFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    val o = withDeg.select(
      when(aFirst, col("a")).otherwise(col("b")).as("src"),
      when(aFirst, col("b")).otherwise(col("a")).as("dst"),
      when(aFirst, col("db")).otherwise(col("da")).as("ddeg"))
    val w1 = o.select(col("src"), col("dst").as("v"), col("ddeg").as("dv"))
    val w2 = o.select(col("src").as("_s2"), col("dst").as("w"),
      col("ddeg").as("dw"))
    val wedges = w1.join(w2, col("src") === col("_s2") &&
        (col("dv") < col("dw") ||
          (col("dv") === col("dw") && col("v") < col("w"))))
      .select(col("src"), col("v"), col("w"))
    val tri = wedges
      .join(o.select(col("src").as("v"), col("dst").as("w"))
        .hint("shuffle_hash"), Seq("v", "w"))
      .select(col("src").as("x"), col("v"), col("w"))
    val cnt = tri.select(explode(array(col("x"), col("v"), col("w"))).as("v"))
      .groupBy("v").agg(count(lit(1)).as("n_tri"))
    val d = col("deg").cast("double")
    deg.join(cnt, Seq("v"), "left")
      .select(col("v").as("doc_id"), col("deg").as("degree"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"),
        Exact.rnd4(when(col("deg") < 2, lit(0.0))
          .otherwise((lit(2.0) * coalesce(col("n_tri"), lit(0L))
            .cast("double")) / (d * (d - lit(1.0)))))
          .as("clustering"))
  }
}
