package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.sim.Ann

/** Similarity-search queries over the `embeddings` table (SURVEY.md
  * §2D6–D7). Query set = vectors with vec_id < 20; corpus = full table.
  *
  * ann_topk and ann_lsh carry full DuckDB oracles (the sequential-double
  * cosine/dot folds are bit-identical across engines — verified; the LSH
  * hyperplanes are data-independent md5 literals the oracle generator
  * recomputes, so the bucket layout and multi-probe set mirror exactly).
  * ann_ivf stays rows-only: its cells come from MLlib k-means TRAINING,
  * which no static SQL can reproduce — AnnSpec checks score agreement and
  * recall against the exact top-k instead.
  */
object SimQueries {

  private def qset(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d).filter(col("vec_id") < 20)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "ann_topk" -> { (s, d) =>
      Ann.bruteForceTopK(qset(s, d), Tables.embeddings(s, d), k = 5)
    },

    "ann_lsh" -> { (s, d) =>
      // multi-probe: each query also checks one-bit-flipped buckets —
      // higher recall for query-side-only extra lookups (AnnSpec measures)
      Ann.lshTopK(qset(s, d), Tables.embeddings(s, d), k = 5,
        planes = 4, tables = 8, hammingProbes = 1)
    },

    "ann_ivf" -> { (s, d) =>
      Ann.ivfTopK(qset(s, d), Tables.embeddings(s, d), k = 5,
        nlist = 16, nProbe = 4)
    }
  )

  private def cosSql(a: String, b: String): String =
    s"""list_sum(list_transform(generate_series(1, len($a)),
       |  i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))
       |/ (sqrt(list_sum(list_transform(generate_series(1, len($a)),
       |     i -> CAST($a[i] AS DOUBLE) * CAST($a[i] AS DOUBLE))))
       | * sqrt(list_sum(list_transform(generate_series(1, len($b)),
       |     i -> CAST($b[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))))""".stripMargin

  /** Mirror of Dedup.lshBucket's plane signs: ±1 per (table-seed, plane,
    * component) from the SAME md5 — computed HERE at oracle-generation
    * time and inlined as literal lists, exactly as the Spark side inlines
    * them as plan-time `typedlit` literals. */
  private def lshSign(seed: String, p: Int, i: Int): Int = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$seed$p:$i".getBytes("UTF-8")).map("%02x".format(_)).mkString
    if (hex.charAt(0) >= '8') 1 else -1
  }

  /** 4-bit sign-LSH bucket string for table `t` over column `c` —
    * same fold as the native DotProduct (verified bit-identical). */
  private def lshBucketExpr(t: Int, c: String): String =
    (0 until 4).map { p =>
      val w = (0 until 64)
        .map(i => if (lshSign(s"$t/", p, i) > 0) "1.0" else "-1.0")
        .mkString("[", ", ", "]")
      s"(CASE WHEN list_sum(list_transform(generate_series(1, 64), " +
        s"i -> CAST($c[i] AS DOUBLE) * ($w)[i])) > 0 THEN '1' ELSE '0' END)"
    }.mkString(" || ")

  val oracle: Map[String, String] = Map(

    // Mirrors Ann.lshTopK(k=5, planes=4, tables=8, hammingProbes=1):
    // corpus bucketed once per table; queries probe the base bucket plus
    // every one-bit flip; candidates = bucket-mates in ANY table (DISTINCT
    // collapses multi-table collisions); exact cosine + deterministic
    // (sim DESC, c_id ASC) rank. Deterministic end-to-end because the
    // hyperplanes are data-independent md5 literals shared by generator
    // and plan.
    "ann_lsh" -> {
      val corpus = (0 until 8).map { t =>
        s"SELECT vec_id AS c_id, embedding AS ce, $t AS t, " +
          s"${lshBucketExpr(t, "embedding")} AS bucket FROM embeddings"
      }.mkString("\nUNION ALL\n")
      def flip(p: Int) =
        s"substr(base, 1, $p) || (CASE WHEN substr(base, ${p + 1}, 1) = '1' " +
          s"THEN '0' ELSE '1' END) || substr(base, ${p + 2}, ${3 - p})"
      val queriesSql = (0 until 8).map { t =>
        s"""SELECT q_id, qe, $t AS t,
           |  unnest([base, ${(0 until 4).map(flip).mkString(", ")}]) AS bucket
           |FROM (SELECT vec_id AS q_id, embedding AS qe,
           |        ${lshBucketExpr(t, "embedding")} AS base
           |      FROM embeddings WHERE vec_id < 20)""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH cb AS (
         |$corpus),
         |qb AS (
         |$queriesSql),
         |cand AS (
         |  SELECT DISTINCT q_id, c_id, qe, ce
         |  FROM qb JOIN cb ON qb.t = cb.t AND qb.bucket = cb.bucket
         |  WHERE q_id <> c_id),
         |sims AS (
         |  SELECT q_id, c_id, ${cosSql("qe", "ce")} AS sim FROM cand),
         |ranked AS (
         |  SELECT q_id, c_id, sim,
         |    row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, c_id ASC) AS rank
         |  FROM sims)
         |SELECT q_id, c_id, rank, floor((sim) * 10000 + 0.5) / 10000.0 AS sim
         |FROM ranked WHERE rank <= 5""".stripMargin
    },

    "ann_topk" ->
      s"""WITH q AS (SELECT vec_id AS q_id, embedding AS qe FROM embeddings
        |           WHERE vec_id < 20),
        |c AS (SELECT vec_id AS c_id, embedding AS ce FROM embeddings),
        |sims AS (
        |  SELECT q_id, c_id, ${cosSql("qe", "ce")} AS sim
        |  FROM q CROSS JOIN c WHERE q_id <> c_id),
        |ranked AS (
        |  SELECT q_id, c_id, sim,
        |    row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, c_id ASC) AS rank
        |  FROM sims)
        |SELECT q_id, c_id, rank, floor((sim) * 10000 + 0.5) / 10000.0 AS sim
        |FROM ranked WHERE rank <= 5""".stripMargin
  )
}
