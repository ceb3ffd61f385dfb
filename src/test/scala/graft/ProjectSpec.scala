package graft

import org.apache.spark.sql.functions._

import graft.sim.Project

/** D73 JL projection: exact coordinate replay against a host-side fold,
  * and the norm-preservation guarantee in aggregate. */
class ProjectSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = (0 until 200).map { v =>
    (v.toLong, Array.tabulate(64)(i =>
      (((v * 31 + i * 17) % 13) - 6).toFloat / 3.0f))
  }.toDF("vec_id", "embedding")

  test("projected coordinates equal the host-side signed fold exactly") {
    val row = Project.jlProject(fixture).filter(col("vec_id") === 7L).head()
    val emb = fixture.filter(col("vec_id") === 7L)
      .head().getAs[scala.collection.Seq[Float]]("embedding")
    (0 until 16).foreach { j =>
      var acc = Project.jlSign(j, 0) * emb(0).toDouble
      (1 until 64).foreach { i =>
        if (Project.jlSign(j, i) > 0) acc += emb(i).toDouble
        else acc -= emb(i).toDouble
      }
      val expected = math.floor(0.25 * acc * 10000 + 0.5) / 10000
      assert(row.getAs[Double](s"p$j") == expected, s"p$j mismatch")
    }
  }

  test("JL guarantee in aggregate: E[norm_ratio^2] is ~1") {
    val mean = Project.jlProject(fixture)
      .agg(avg(col("norm_ratio") * col("norm_ratio"))).head().getDouble(0)
    assert(mean > 0.8 && mean < 1.2, s"mean squared norm ratio $mean")
  }

  test("map-only: projection is partition-invariant bitwise") {
    val a = Project.jlProject(fixture.repartition(13))
      .orderBy("vec_id").collect()
    val b = Project.jlProject(fixture.coalesce(1))
      .orderBy("vec_id").collect()
    a.zip(b).foreach { case (x, y) => assert(x == y) }
  }
}
