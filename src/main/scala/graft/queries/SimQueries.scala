package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.sim.Ann

/** Similarity-search queries over the `embeddings` table (SURVEY.md
  * §2D6–D7). Query set = vectors with vec_id < 20; corpus = full table.
  *
  * ann_topk has a full DuckDB oracle (the sequential-double cosine fold is
  * bit-identical across engines — verified); ann_lsh is rows-only since its
  * result depends on the bucket layout, and its ScalaTest spec checks
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

  val oracle: Map[String, String] = Map(
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
