package graft

/** Smoke gate: every declared query runs and returns rows on sf0.001, and
  * every oracle key has a matching queries entry. Value-level correctness is
  * checked against DuckDB by tools/check.py and the driver's gate.
  */
class QueriesSpec extends SparkSpec {

  test("oracleSql keys are a subset of queries keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query impl: $missing")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"query $name runs and returns rows on sf0.001") {
      assert(fn(spark, sfDir).count() > 0, s"$name returned 0 rows")
    }
  }
}
