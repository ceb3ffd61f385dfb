package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.VectorFunctions

/** The SQL surface of the native expressions must agree exactly with the
  * Column API (same Expression class underneath). */
class ExtensionsSpec extends SparkSpec {

  test("cosine_sim / dot_product register and match the Column API bitwise") {
    GraftExtensions.install(spark)
    val emb = Tables.embeddings(spark, sfDir).limit(50)
      .select(col("vec_id"), col("embedding"))
    emb.createOrReplaceTempView("ext_emb")
    val viaSql = spark.sql(
      """SELECT a.vec_id AS qa, b.vec_id AS qb,
        |  cosine_sim(a.embedding, b.embedding) AS c,
        |  dot_product(a.embedding, b.embedding) AS dp
        |FROM ext_emb a JOIN ext_emb b ON a.vec_id < b.vec_id""".stripMargin)
    val viaCol = emb.as("a").join(emb.as("b"),
        col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("qa"), col("b.vec_id").as("qb"),
        VectorFunctions.cosine(col("a.embedding"), col("b.embedding")).as("c"),
        VectorFunctions.dot(col("a.embedding"), col("b.embedding")).as("dp"))
    assert(viaSql.exceptAll(viaCol).isEmpty && viaCol.exceptAll(viaSql).isEmpty)
  }

  test("intersect_count registers and matches size(array_intersect)") {
    import spark.implicits._
    GraftExtensions.install(spark)
    val rng = new scala.util.Random(7)
    (0 until 200).map { _ =>
      def a() = (0 until rng.nextInt(10)).map(_ => s"t${rng.nextInt(6)}")
      (a(), a())
    }.toDF("a", "b").createOrReplaceTempView("ext_ic")
    val bad = spark.sql(
      """SELECT intersect_count(a, b) AS fast,
        |  size(array_intersect(a, b)) AS ref FROM ext_ic""".stripMargin)
      .filter(col("fast") =!= col("ref")).count()
    assert(bad == 0, "SQL intersect_count diverges from array_intersect")
  }

  test("sketch SQL functions match the Column API; probe round-trips") {
    import spark.implicits._
    GraftExtensions.install(spark)
    (1 to 300).map(i => s"k${i % 67}").toDF("v")
      .createOrReplaceTempView("ext_sk")
    val viaSql = spark.sql(
      """SELECT graft_bottom_k(v, 16) AS bk, graft_count_min(v, 4, 64) AS cm,
        |  graft_bloom(v, 4096, 3) AS bf
        |FROM ext_sk""".stripMargin)
    val viaCol = spark.table("ext_sk").agg(
      graft.functions.Sketch.bottomK(col("v"), 16).as("bk"),
      graft.functions.Sketch.countMin(col("v"), 4, 64).as("cm"),
      graft.functions.Sketch.bloom(col("v"), 4096, 3).as("bf"))
    assert(viaSql.exceptAll(viaCol).isEmpty && viaCol.exceptAll(viaSql).isEmpty)
    // probe the SQL-built filter with the SQL scalar: every member found
    val hits = spark.sql(
      """SELECT count(*) AS n FROM ext_sk,
        |  (SELECT graft_bloom(v, 4096, 3) AS bf FROM ext_sk)
        |WHERE graft_bloom_contains(bf, v, 4096, 3)""".stripMargin)
      .as[Long].head()
    assert(hits == 300L, s"bloom membership via SQL missed rows: $hits")
  }

  test("sql plan with cosine_sim stays in whole-stage codegen") {
    GraftExtensions.install(spark)
    Tables.embeddings(spark, sfDir).createOrReplaceTempView("ext_emb2")
    val plan = spark.sql(
      "SELECT cosine_sim(embedding, embedding) FROM ext_emb2")
      .queryExecution.executedPlan.toString
    // "*(n)" prefixes mark operators inside a WholeStageCodegen stage
    assert(plan.contains("*(1) Project [cosinesimilarity"),
      s"no codegen span in:\n$plan")
  }

  test("openEO scalar SQL functions: nd / clip / scale / hash_sample") {
    GraftExtensions.install(spark)
    val r = spark.sql(
      """SELECT normalized_difference(3.0D, 1.0D) AS nd,
        |  clip_value(5.0D, 0.0D, 2.0D) AS cl,
        |  linear_scale_range(0.5D, 0.0D, 1.0D, -1.0D, 1.0D) AS ls""".stripMargin)
      .collect().head
    assert(r.getDouble(0) == 0.5 && r.getDouble(1) == 2.0 &&
      r.getDouble(2) == 0.0)
    // hash_sample must equal TextFunctions.hashSampleKeep row for row
    val docs = Tables.documents(spark, sfDir).select("doc_id")
    docs.createOrReplaceTempView("ext_docs")
    val viaSql = spark.sql(
      "SELECT doc_id FROM ext_docs WHERE hash_sample(doc_id, 0.3)")
    val viaCol = docs.filter(
      graft.functions.TextFunctions.hashSampleKeep(col("doc_id"), 0.3))
    assert(viaSql.exceptAll(viaCol).isEmpty && viaCol.exceptAll(viaSql).isEmpty)
    assert(viaSql.count() > 0)
    intercept[Exception] {
      spark.sql("SELECT hash_sample(doc_id, doc_id) FROM ext_docs").collect()
    }
  }
}
