package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.Exact
import graft.functions.VectorFunctions

/** D75: farthest-first k-center selection (Gonzalez 1985) — the greedy
  * 2-approximation to the k-center cover, the coreset/active-learning
  * subset selection that maximizes COVERAGE of embedding space (where
  * D56's cluster-balanced draw balances density, k-center bounds the
  * worst-case distance from any vector to its nearest selected center).
  *
  * Selection: seed = smallest-md5(id) vector (the coordination
  * convention); each round adds the vector FARTHEST from the selected
  * set (squared-Euclidean, ties to the smaller id). Every round's
  * distance is the pinned IEEE DAG d²(x,c) = ‖x‖² + (‖c‖² − 2·x·c) the
  * silhouette/IVF ops use — centroid norms fold dimension-ascending at
  * plan time, dots are the verified sequential folds — so the whole
  * greedy trajectory replays in SQL: round t's center CTE is
  * `ORDER BY d DESC, id LIMIT 1` over the same numbers.
  *
  * Scale shape: k rounds, each ONE map over the corpus (centers are
  * plan literals — scores are codegen) ending in a TakeOrdered(1); the
  * corpus never shuffles. The driver holds O(k·dims) doubles — the
  * seededCentroids contract. At 100 TB you run the greedy on the IVF
  * cells' diversity sample (D56) rather than raw rows; the composition
  * is the same plan with a different input.
  */
object KCenter {

  /** The greedy trajectory: k (id, center vector) pairs in selection
    * order. O(k) jobs, O(k·dims) driver state. */
  def select(corpus: DataFrame, k: Int, idCol: String = "vec_id",
             embCol: String = "embedding"): IndexedSeq[(Long, Array[Double])] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    // pin the projected corpus across the k greedy rounds: each round is
    // one map + TakeOrdered(1) over these two columns, and re-scanning
    // parquet k times was the worst clean-battery sf ratio (4.4× at 10×
    // data, r11) — the cache turns k scans into one
    val base = corpus.select(col(idCol).cast("long").as("id"),
      col(embCol).cast("array<float>").as("e"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val seed = base
      .withColumn("_r", md5(col("id").cast("string")))
      .orderBy(col("_r"), col("id")).limit(1)
      .select("id", "e").as[(Long, Array[Float])].head()
    var centers = Vector((seed._1, seed._2.map(_.toDouble)))
    while (centers.length < k) {
      val emb = col("e")
      val xx = VectorFunctions.dot(emb, emb)
      val scores = Ann.centScores(centers.map(_._2).toArray, emb)
        .map(_.getField("d"))
      val dMin = xx +
        (if (scores.length == 1) scores.head else least(scores: _*))
      val next = base.select(col("id"), col("e"), dMin.as("d"))
        .orderBy(col("d").desc, col("id").asc).limit(1)
        .select("id", "e").as[(Long, Array[Float])].head()
      centers = centers :+ ((next._1, next._2.map(_.toDouble)))
    }
    base.unpersist(false)
    centers
  }

  /** Select k centers, then assign every vector to its nearest center:
    * (id, center_idx, center_id, dist, is_center). `dist` is the true
    * Euclidean distance on the rnd4 grid. */
  def coverQuery(corpus: DataFrame, k: Int, idCol: String = "vec_id",
                 embCol: String = "embedding"): DataFrame = {
    val centers = select(corpus, k, idCol, embCol)
    val emb = col(embCol)
    val xx = VectorFunctions.dot(emb, emb)
    val sorted = array_sort(array(
      Ann.centScores(centers.map(_._2).toArray, emb): _*))
    val idx = element_at(sorted, 1).getField("i")
    val cid = centers.map(_._1).zipWithIndex
      .foldLeft(lit(-1L)) { case (acc, (id, i)) =>
        when(idx === i, lit(id)).otherwise(acc)
      }
    corpus.select(col(idCol),
      idx.as("center_idx"), cid.as("center_id"),
      Exact.rnd4(sqrt(greatest(xx +
        element_at(sorted, 1).getField("d"), lit(0.0)))).as("dist"),
      (col(idCol).cast("long") === cid).as("is_center"))
  }

  /** Oracle CTE chain over a `knc` CTE (id, e): replays the greedy
    * trajectory round for round. Terminal CTE: `kc_out` with
    * (id, center_idx, center_id, dist, is_center). */
  def oracleSql(k: Int, dims: Int): String = {
    def score(eSql: String, cSql: String): String =
      s"""list_sum(list_transform(generate_series(1, $dims),
         |      i -> CAST($cSql[i] AS DOUBLE) * CAST($cSql[i] AS DOUBLE)))
         |    - 2 * list_sum(list_transform(generate_series(1, $dims),
         |      i -> CAST($eSql[i] AS DOUBLE) * CAST($cSql[i] AS DOUBLE)))"""
        .stripMargin
    val rounds = (1 until k).map { t =>
      val prev = (0 until t).map(j =>
        s"SELECT $j AS idx, cid, e FROM kc$j").mkString("\n  UNION ALL ")
      s"""kcent$t AS ($prev),
         |kd$t AS MATERIALIZED (
         |  SELECT kx.id, kx.e,
         |    kx.xx + min(${score("kx.e", "c.e")}) AS d
         |  FROM kxx kx CROSS JOIN kcent$t c
         |  GROUP BY kx.id, kx.e, kx.xx),
         |kc$t AS MATERIALIZED (
         |  SELECT id AS cid, e FROM kd$t ORDER BY d DESC, id ASC LIMIT 1)"""
        .stripMargin
    }.mkString(",\n")
    val allCent = (0 until k).map(j =>
      s"SELECT $j AS idx, cid, e FROM kc$j").mkString("\n  UNION ALL ")
    s"""kxx AS MATERIALIZED (
       |  SELECT id, e,
       |    list_sum(list_transform(generate_series(1, $dims),
       |      i -> CAST(e[i] AS DOUBLE) * CAST(e[i] AS DOUBLE))) AS xx
       |  FROM knc),
       |kc0 AS MATERIALIZED (
       |  SELECT id AS cid, e FROM (
       |    SELECT id, e, md5(CAST(id AS VARCHAR)) AS r FROM knc
       |    ORDER BY r, id LIMIT 1)),
       |$rounds,
       |kcall AS ($allCent),
       |ksc AS (
       |  SELECT kx.id, c.idx, c.cid, ${score("kx.e", "c.e")} AS s, kx.xx
       |  FROM kxx kx CROSS JOIN kcall c),
       |kr AS (
       |  SELECT id, idx, cid, s, xx,
       |    row_number() OVER (PARTITION BY id ORDER BY s, idx) AS r
       |  FROM ksc),
       |kc_out AS (
       |  SELECT id, idx AS center_idx, cid AS center_id,
       |    floor((sqrt(greatest(xx + s, 0.0))) * 10000 + 0.5) / 10000.0
       |      AS dist,
       |    id = cid AS is_center
       |  FROM kr WHERE r = 1)""".stripMargin
  }
}
