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

  test("semantic decontamination: map-only plan, benchmark excluded, " +
    "verdicts match a driver recompute") {
    import graft.core.Tables
    val emb = Tables.embeddings(spark, sfDir)
    val bench = emb.filter(col("vec_id") < 20)
    val out = SemDedup.semanticDecontaminate(emb, bench, tau = 0.30).cache()
    // benchmark rows never judge themselves
    assert(out.filter(col("vec_id") < 20).count() == 0)
    // map-only: no Exchange anywhere in the executed plan — the benchmark
    // is plan-time literals, the corpus is scanned once
    out.collect()
    val exchanges = out.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.Exchange => e
    }
    assert(exchanges.isEmpty,
      s"decontamination must not shuffle:\n${out.queryExecution.executedPlan}")
    // spot-check verdicts against an independent driver-side recompute
    val bvecs = bench.select(col("vec_id"),
        col("embedding").cast("array<float>"))
      .collect().map(r => r.getSeq[Float](1).toArray)
    val rows = emb.filter(col("vec_id") % 53 === 21)
      .select(col("vec_id"), col("embedding").cast("array<float>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val verdicts = out.filter(col("vec_id") % 53 === 21)
      .select("vec_id", "kept").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    rows.foreach { case (id, e) =>
      val expectKept = bvecs.map(cos(e, _)).max < 0.30
      assert(verdicts(id) == expectKept, s"verdict diverges for vec $id")
    }
    // the threshold bites on this corpus: some rows are contaminated
    assert(out.filter(!col("kept")).count() > 0)
  }
}
