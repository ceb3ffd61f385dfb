package graft

import org.apache.spark.sql.functions._

import graft.ml.VitBridge

/** Semantics of the ViT patch-embedding → featuremap bridge
  * (torch_vit_encoder_tools.py analog): raster placement, CLS handling,
  * multilevel stacking, and the execution-time square-raster check.
  */
class VitBridgeSpec extends SparkSpec {

  /** 2 samples × (1 CLS + 9 patches); embedding = [sample*100 + patch]. */
  private def patches(perSample: Int) = {
    import spark.implicits._
    (for { s <- 0 until 2; p <- 0 until perSample }
      yield (s.toLong, p, Array((s * 100 + p).toFloat)))
      .toDF("sample", "patch", "embedding")
  }

  test("featuremapWithCls drops CLS and places patches row-major") {
    val fm = VitBridge.featuremapWithCls(patches(10), Seq("sample"))
    assert(fm.columns.toSeq == Seq("sample", "py", "px", "embedding"))
    val got = fm.collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
      r.getSeq[Float](3).head)).toSet
    // patch 1..9 → reindexed 0..8 on a 3×3 raster: patch 5 → idx 4 → (1,1)
    assert(got.contains((0L, 1, 1, 5f)))
    assert(got.contains((1L, 0, 0, 101f)))
    assert(got.contains((1L, 2, 2, 109f)))
    assert(got.size == 18)
  }

  test("featuremapWithoutCls places patch i at (i div side, i mod side)") {
    val fm = VitBridge.featuremapWithoutCls(patches(9), Seq("sample"))
    val got = fm.collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
      r.getSeq[Float](3).head)).toSet
    assert(got.contains((0L, 0, 0, 0f)))
    assert(got.contains((0L, 2, 1, 7f)))
  }

  test("non-square patch count raises at execution time") {
    val fm = VitBridge.featuremapWithoutCls(patches(10), Seq("sample"))
    val e = intercept[Exception](fm.collect())
    assert(e.getMessage.contains("n*n raster") ||
      e.getCause != null && e.getCause.getMessage.contains("n*n raster"))
  }

  test("clsEmbedding returns one row per sample, patch 0") {
    val cls = VitBridge.clsEmbedding(patches(10), Seq("sample"))
    val got = cls.collect().map(r => (r.getLong(0), r.getSeq[Float](1).head))
    assert(got.toSet == Set((0L, 0f), (1L, 100f)))
  }

  test("multilevel keeps the layer column as a sample key") {
    import spark.implicits._
    val layered = (for { s <- 0 until 2; l <- 0 until 3; p <- 0 until 4 }
      yield (s.toLong, l, p, Array((s * 1000 + l * 100 + p).toFloat)))
      .toDF("sample", "layer", "patch", "embedding")
    val fm = VitBridge.featuremapMultilevel(layered, Seq("sample"))
    assert(fm.columns.toSeq == Seq("sample", "layer", "py", "px", "embedding"))
    val got = fm.collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
      r.getInt(3), r.getSeq[Float](4).head)).toSet
    assert(got.contains((1L, 2, 1, 1, 1203f))) // patch 3 → (1,1) on 2×2
    assert(got.size == 24)
  }
}
