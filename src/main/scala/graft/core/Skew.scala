package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-handling utilities (SURVEY §5).
  *
  * AQE's skew-join split handles most shuffle-join skew at runtime; these
  * are the explicit techniques for when the plan must be skew-proof by
  * construction (e.g. a hot key carrying 10% of a 100 TB fact table, or a
  * key whose skew is known at authoring time).
  */
object Skew {

  /** Salted equi-join for a skewed fact⋈dim join that is too big to
    * broadcast: the fact side gets a per-row salt in [0, salts), the dim
    * side is replicated once per salt value, and the join key becomes
    * (keys, salt) — a hot key's rows now spread over `salts` reducers
    * instead of one. Row-multiset equal to the plain join; cost is
    * `salts`× the dim side's shuffle volume, which is the knob to tune
    * against the hot key's size.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, keys: Seq[String],
                 salts: Int): DataFrame = {
    require(salts > 1, s"salts must be > 1, got $salts")
    // salt from the row's partition+offset (monotonically_increasing_id):
    // deterministic within a run, uniform across a partition's rows
    val salted = fact.withColumn("_salt",
      pmod(monotonically_increasing_id(), lit(salts.toLong)).cast("int"))
    val replicated = dim.withColumn("_salt",
      explode(array((0 until salts).map(lit): _*)))
    salted.join(replicated, keys :+ "_salt").drop("_salt")
  }

  /** Two-phase aggregation with a salted partial for reducers whose merge
    * is not algebraic in Spark's partial-agg sense (e.g. collect-based or
    * distinct-heavy aggregates): phase 1 reduces (keys, salt) groups, phase
    * 2 merges the ≤ `salts` partials per key. For plain sum/count/min/max
    * Spark's own map-side partial aggregation already does this — use this
    * wrapper only when profiling shows a straggling reducer on a hot key.
    */
  def saltedDistinctCount(df: DataFrame, keys: Seq[String], valueCol: String,
                          salts: Int): DataFrame = {
    require(salts > 1, s"salts must be > 1, got $salts")
    val salted = df.withColumn("_salt",
      pmod(xxhash64(col(valueCol)), lit(salts.toLong)).cast("int"))
    // same value always lands in the same salt bucket → per-bucket distinct
    // counts are disjoint and sum exactly
    salted.groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(countDistinct(col(valueCol)).as("_partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum("_partial").as("n_distinct"))
  }
}
