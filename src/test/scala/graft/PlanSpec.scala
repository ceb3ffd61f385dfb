package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Plan-shape assertions for the properties the 100 TB design depends on.
  * Row-level correctness is the oracle gate's job; these tests pin the
  * PHYSICAL plans: filters must reach the parquet scan, dimension joins
  * must broadcast, map-only operators must not shuffle. A regression here
  * is invisible at sf0.01 and fatal at scale.
  */
class PlanSpec extends SparkSpec {

  private def plan(df: DataFrame): String = {
    df.collect() // let AQE finalize so the asserted plan is the executed one
    df.queryExecution.executedPlan.toString
  }

  test("temporal extent pushes into the parquet scan as a raw-column filter") {
    val p = plan(Tables.eventsRanged(spark, sfDir, "2024-01-05", "2024-01-10")
      .select("event_id"))
    assert(p.contains("PushedFilters: [IsNotNull(ts), GreaterThanOrEqual(ts,"),
      s"ts range must appear in PushedFilters:\n$p")
  }

  test("bbox filter pushes x/y predicates to the scan") {
    val p = plan(Tables.lineitem(spark, sfDir)
      .filter(col("l_partkey") >= 16 && col("l_partkey") < 48)
      .select("l_partkey"))
    assert(p.contains("GreaterThanOrEqual(l_partkey,16)") &&
      p.contains("LessThan(l_partkey,48)"),
      s"x range must reach PushedFilters:\n$p")
  }

  test("q5 dimension joins are broadcast, not shuffled") {
    val p = plan(SparkEntry.queries("q5_region")(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast join:\n$p")
  }

  test("q1 aggregates with a map-side partial before the exchange") {
    val p = plan(SparkEntry.queries("q1_agg")(spark, sfDir))
    val firstAgg = p.indexOf("HashAggregate")
    val exchange = p.indexOf("Exchange")
    assert(firstAgg >= 0 && exchange >= 0,
      s"expected HashAggregate and Exchange:\n$p")
    assert(p.contains("partial_sum"),
      s"expected partial (map-side) aggregation before the exchange:\n$p")
    assert(p.contains("*("), "aggregation must be whole-stage codegen")
  }

  test("scale ops are map-only: no Exchange in the plan") {
    val p = plan(SparkEntry.queries("scale_clip")(spark, sfDir))
    assert(!p.contains("Exchange"), s"scaling must not shuffle:\n$p")
    assert(p.contains("*("), "scaling must be whole-stage codegen")
  }

  test("text analysis is map-only: no Exchange in the plan") {
    val p = plan(SparkEntry.queries("text_langid")(spark, sfDir))
    assert(!p.contains("Exchange"), s"langid must not shuffle:\n$p")
  }

  test("brute-force ANN never shuffles the corpus: broadcast nested loop") {
    val p = plan(SparkEntry.queries("ann_topk")(spark, sfDir))
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"queries must broadcast against the corpus scan:\n$p")
  }

  test("projection pruning reaches the scan (ReadSchema is narrow)") {
    val p = plan(Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag").agg(sum("l_quantity")))
    val schema = p.linesIterator.find(_.contains("ReadSchema:"))
      .getOrElse(fail(s"no ReadSchema in plan:\n$p"))
    assert(schema.contains("l_returnflag") && schema.contains("l_quantity") &&
      !schema.contains("l_extendedprice") && !schema.contains("l_comment"),
      s"scan must read only the two referenced columns:\n$schema")
  }
}
