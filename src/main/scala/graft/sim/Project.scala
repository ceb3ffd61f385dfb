package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.Exact

/** D73: Johnson-Lindenstrauss random projection — dimensionality
  * reduction for the embedding column (64 → 16 here) with a ±1/√k sign
  * matrix (Achlioptas 2003: the database-friendly JL construction — a
  * dense Gaussian is unnecessary; ±1 entries preserve pairwise distances
  * with the same guarantee and cost only adds/subtracts).
  *
  * The sign matrix derives from md5 parity of (outDim, inDim) — the
  * LSH-hyperplane convention ([[graft.dedup.Dedup.lshBucket]]): a
  * data-independent constant both the plan and the oracle generator
  * recompute, so the whole projection replays bit-for-bit. Each output
  * coordinate is a LEFT-ASSOCIATED ±x fold (exact: float→double casts,
  * then double adds in pinned order) scaled by 1/√k (0.25 — exactly
  * representable), mirrored as an unrolled +/- chain in SQL (the ann_lsh
  * precedent).
  *
  * Scale shape: a pure map — scan → project, ZERO shuffle, whole-stage
  * codegen; at 100 TB this is the cheap front of every downstream
  * ANN/clustering pass (16 doubles per row instead of 64 floats), and
  * the projected table can be written as the physical layout the way the
  * SQ8/PQ codes are. `norm_ratio` (projected/original L2 norm) rides
  * along so the JL distortion is visible in the artifact.
  */
object Project {

  /** ±1 sign for (output dim j, input dim i): md5 parity, seeded. */
  def jlSign(j: Int, i: Int, seed: String = "jl:"): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$seed$j:$i".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    if (hex.charAt(0) >= '8') 1.0 else -1.0
  }

  /** Left-associated signed fold Σ ±x_i over array elements (double). */
  private def signedFold(emb: Column, j: Int, dims: Int,
                         seed: String): Column =
    (1 until dims).foldLeft(
      lit(jlSign(j, 0, seed)) * emb.getItem(0).cast("double")) { (acc, i) =>
      if (jlSign(j, i, seed) > 0) acc + emb.getItem(i).cast("double")
      else acc - emb.getItem(i).cast("double")
    }

  /** Project `embCol` (array<float> of `dims`) to `outDims` coordinates
    * p0..p{k-1} (rnd4) plus the norm-preservation ratio. */
  def jlProject(embs: DataFrame, idCol: String = "vec_id",
                embCol: String = "embedding", outDims: Int = 16,
                dims: Int = 64, seed: String = "jl:"): DataFrame = {
    val scale = 1.0 / math.sqrt(outDims.toDouble)
    val emb = col(embCol)
    val qs = (0 until outDims).map(j =>
      lit(scale) * signedFold(emb, j, dims, seed))
    val xNorm = sqrt((1 until dims).foldLeft(
      emb.getItem(0).cast("double") * emb.getItem(0).cast("double")) {
      (acc, i) =>
        acc + emb.getItem(i).cast("double") * emb.getItem(i).cast("double")
    })
    val pNorm = sqrt(qs.tail.foldLeft(qs.head * qs.head)(
      (acc, q) => acc + q * q))
    embs.select(
      (col(idCol) +:
        qs.zipWithIndex.map { case (q, j) => Exact.rnd4(q).as(s"p$j") }) :+
        Exact.rnd4(pNorm / xNorm).as("norm_ratio"): _*)
  }

  /** DuckDB mirror: the same signs (recomputed from [[jlSign]]), the same
    * left-associated chains. `embSql` is the array expression (1-based
    * indexing in DuckDB). */
  def jlOracleSelect(embSql: String, outDims: Int = 16, dims: Int = 64,
                     seed: String = "jl:"): String = {
    val scale = 1.0 / math.sqrt(outDims.toDouble)
    def chain(j: Int): String =
      (1 until dims).foldLeft(
        s"(${jlSign(j, 0, seed)}) * CAST($embSql[1] AS DOUBLE)") { (acc, i) =>
        val op = if (jlSign(j, i, seed) > 0) "+" else "-"
        s"($acc $op CAST($embSql[${i + 1}] AS DOUBLE))"
      }
    val ps = (0 until outDims).map { j =>
      s"floor(($scale * ${chain(j)}) * 10000 + 0.5) / 10000.0 AS p$j"
    }
    val xn = (1 until dims).foldLeft(
      s"CAST($embSql[1] AS DOUBLE) * CAST($embSql[1] AS DOUBLE)") {
      (acc, i) =>
        s"($acc + CAST($embSql[${i + 1}] AS DOUBLE) * CAST($embSql[${i + 1}] AS DOUBLE))"
    }
    val pn = (1 until outDims).foldLeft {
      val q0 = s"($scale * ${chain(0)})"
      s"$q0 * $q0"
    } { (acc, j) =>
      val q = s"($scale * ${chain(j)})"
      s"($acc + $q * $q)"
    }
    (ps :+
      s"floor((sqrt($pn) / sqrt($xn)) * 10000 + 0.5) / 10000.0 AS norm_ratio")
      .mkString(",\n  ")
  }
}
