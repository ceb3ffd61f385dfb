package graft

import org.apache.spark.sql.functions._

import graft.core.Skew

/** Salting utilities must be result-equivalent to their plain forms on
  * pathologically skewed inputs (one key carrying ~90% of rows).
  */
class SkewSpec extends SparkSpec {

  private lazy val skewed = {
    import spark.implicits._
    // key 0 is hot: 9000 rows; keys 1..9 get 100 each
    val rows = (1 to 9000).map(i => (0L, i.toLong)) ++
      (for { k <- 1 to 9; i <- 1 to 100 } yield (k.toLong, (k * 1000 + i).toLong))
    rows.toDF("k", "v")
  }

  test("saltedJoin equals plain join on a hot key") {
    import spark.implicits._
    val dim = (0 to 9).map(k => (k.toLong, s"name_$k")).toDF("k", "name")
    val plain = skewed.join(dim, Seq("k")).select("k", "v", "name")
    val salted = Skew.saltedJoin(skewed, dim, Seq("k"), salts = 8)
      .select("k", "v", "name")
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty,
      "salted join must be row-multiset equal to the plain join")
    assert(salted.count() == plain.count())
  }

  test("saltedDistinctCount equals plain countDistinct") {
    val plain = skewed.groupBy("k").agg(countDistinct("v").as("n_distinct"))
    val salted = Skew.saltedDistinctCount(skewed, Seq("k"), "v", salts = 8)
    val joined = plain.withColumnRenamed("n_distinct", "np")
      .join(salted, Seq("k"))
    assert(joined.filter(col("np") =!= col("n_distinct")).count() == 0)
    assert(joined.count() == 10)
  }
}
