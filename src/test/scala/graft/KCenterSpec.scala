package graft

import org.apache.spark.sql.functions._

import graft.sim.KCenter

/** D75 farthest-first k-center: blob coverage, monotone radius, and
  * deterministic selection. */
class KCenterSpec extends SparkSpec {
  import spark.implicits._

  // three well-separated blobs in 8-d
  private def blobs = (0 until 90).map { i =>
    val blob = i % 3
    val base = Array.fill(8)(blob * 10.0f)
    base(i % 8) += (i % 5) * 0.1f
    (i.toLong, base)
  }.toDF("vec_id", "embedding")

  test("k=3 on three separated blobs places one center per blob") {
    val centers = KCenter.select(blobs, 3, embCol = "embedding")
    assert(centers.map(_._1 % 3).distinct.length == 3,
      s"centers ${centers.map(_._1)} must hit all three blobs")
  }

  test("cover radius is non-increasing in k, exactly k centers flagged") {
    val radii = Seq(2, 4, 8).map { k =>
      val out = KCenter.coverQuery(blobs, k).persist()
      val nCenters = out.filter(col("is_center")).count()
      assert(nCenters == k, s"expected $k centers, got $nCenters")
      val r = out.agg(max("dist")).head().getDouble(0)
      out.unpersist(false)
      r
    }
    assert(radii(0) >= radii(1) && radii(1) >= radii(2),
      s"radii $radii must be non-increasing")
  }

  test("selection is invariant under repartitioning") {
    val a = KCenter.select(blobs.repartition(13), 5).map(_._1)
    val b = KCenter.select(blobs.coalesce(1), 5).map(_._1)
    assert(a == b, s"$a vs $b")
  }
}
