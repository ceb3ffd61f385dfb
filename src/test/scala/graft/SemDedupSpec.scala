package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.sim.SemDedup

/** SemDeDup invariants beyond the hash gate: the planted cosine-duplicate
  * pairs must resolve to exactly one survivor each, the sweep must be a
  * no-op above the max possible similarity, and the verdict must be
  * deterministic across runs.
  */
class SemDedupSpec extends SparkSpec {

  // the dedup_embedding fixture: embeddings ∪ cosine-invariant 1.5×-scaled
  // copies — every (i, i+100000) pair is a semantic duplicate
  private lazy val corpus = {
    val e = Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
    e.unionByName(e.select((col("vec_id") + 100000).as("vec_id"),
      transform(col("embedding"), x => x * lit(1.5f)).as("embedding")))
  }
  private lazy val n = Tables.embeddings(spark, sfDir).count()

  private lazy val verdict =
    SemDedup.semanticDedup(corpus, nlist = 16, tau = 0.97).cache()

  test("one row per vector, cells within [0, nlist)") {
    assert(verdict.count() == 2 * n)
    assert(verdict.select("vec_id").distinct().count() == 2 * n)
    val cells = verdict.agg(min("cell"), max("cell")).head()
    assert(cells.getInt(0) >= 0 && cells.getInt(1) < 16)
  }

  test("every planted duplicate pair keeps exactly one member") {
    val a = verdict.select(col("vec_id"), col("kept"))
    val b = verdict.select((col("vec_id") - 100000).as("vec_id"),
      col("kept").as("kept_b"))
    val pairs = a.join(b, "vec_id")
    assert(pairs.count() == n)
    assert(pairs.filter(col("kept") === col("kept_b")).count() == 0,
      "a planted pair must drop exactly one member")
  }

  test("tau above the similarity ceiling keeps everything") {
    val all = SemDedup.semanticDedup(corpus, nlist = 16, tau = 1.5)
    assert(all.filter(!col("kept")).count() == 0)
  }

  test("verdict is deterministic across runs") {
    val again = SemDedup.semanticDedup(corpus, nlist = 16, tau = 0.97)
    assert(verdict.exceptAll(again).count() == 0 &&
      again.exceptAll(verdict).count() == 0)
  }
}
