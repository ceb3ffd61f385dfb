package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Exact, Tables}

/** Headline analytics queries (SURVEY.md §2E). TPC-H-shaped anchors used by
  * Bench; every float output is rounded to 4 decimals on both the Spark and
  * the DuckDB side so the driver's hash compare is stable.
  */
object BenchQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          Exact.rnd4(Exact.esum(col("l_quantity"))).as("sum_qty"),
          Exact.rnd4(Exact.esum(col("l_extendedprice"))).as("sum_base_price"),
          Exact.rnd4(Exact.esum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("sum_disc_price"),
          Exact.rnd4(Exact.eavg(col("l_quantity"))).as("avg_qty"),
          Exact.rnd4(Exact.eavg(col("l_discount"))).as("avg_disc"),
          count(lit(1)).as("count_order")
        )
    },
    "q3_join" -> { (s, d) =>
      // Fact-fact join shuffles on the key; the customer dim side is
      // broadcast so only orders⋈lineitem shuffles at scale.
      val c = broadcast(
        Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING"))
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val l = Tables.lineitem(s, d)
        .filter(col("l_shipdate") > lit("1996-01-01").cast("timestamp"))
      c.join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(Exact.rnd4(Exact.esum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey").asc)
        .limit(10)
    },
    "q5_region" -> { (s, d) =>
      // All dimension tables broadcast; the only shuffle is
      // orders⋈lineitem + the final 25-group aggregation.
      val r = broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA"))
      val n = broadcast(Tables.nation(s, d))
      val sup = broadcast(Tables.supplier(s, d))
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
                col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      val l = Tables.lineitem(s, d)
      c.join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("o_orderkey") === col("l_orderkey"))
        .join(sup, col("l_suppkey") === col("s_suppkey") &&
                   col("c_nationkey") === col("s_nationkey"))
        .join(n, col("s_nationkey") === col("n_nationkey"))
        .join(r, col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(Exact.rnd4(Exact.esum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("revenue"))
    },

    // Skew.saltedJoin end-to-end: fact keys are pathologically hot by
    // construction (brand has ~25 values over 60k+ rows); the salted join
    // must produce exactly the plain-join aggregate.
    "q_salted_join" -> { (s, d) =>
      val fact = Tables.lineitem(s, d)
        .select(col("l_partkey").as("partkey"), col("l_quantity"))
      val dim = Tables.part(s, d)
        .select(col("p_partkey").as("partkey"), col("p_brand"))
      graft.core.Skew.saltedJoin(fact, dim, Seq("partkey"), salts = 8)
        .groupBy("p_brand")
        .agg(Exact.rnd4(Exact.esum(col("l_quantity"))).as("sum_qty"),
          count(lit(1)).as("n"))
    }
  )

  val oracle: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        | floor((CAST(sum(CAST(l_quantity AS DECIMAL(38,10))) AS DOUBLE)) * 10000 + 0.5) / 10000.0 AS sum_qty,
        | floor((CAST(sum(CAST(l_extendedprice AS DECIMAL(38,10))) AS DOUBLE)) * 10000 + 0.5) / 10000.0 AS sum_base_price,
        | floor((CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,10))) AS DOUBLE)) * 10000 + 0.5) / 10000.0 AS sum_disc_price,
        | floor((CAST(sum(CAST(l_quantity AS DECIMAL(38,10))) AS DOUBLE) / count(l_quantity)) * 10000 + 0.5) / 10000.0 AS avg_qty,
        | floor((CAST(sum(CAST(l_discount AS DECIMAL(38,10))) AS DOUBLE) / count(l_discount)) * 10000 + 0.5) / 10000.0 AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q3_join" ->
      """SELECT l_orderkey, o_orderdate,
        | floor((CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,10))) AS DOUBLE)) * 10000 + 0.5) / 10000.0 AS revenue
        |FROM customer, orders, lineitem
        |WHERE c_mktsegment = 'BUILDING'
        |  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate > TIMESTAMP '1996-01-01'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey ASC
        |LIMIT 10""".stripMargin,
    "q5_region" ->
      """SELECT n_name,
        | floor((CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,10))) AS DOUBLE)) * 10000 + 0.5) / 10000.0 AS revenue
        |FROM customer, orders, lineitem, supplier, nation, region
        |WHERE c_custkey = o_custkey AND o_orderkey = l_orderkey
        |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name""".stripMargin,

    "q_salted_join" ->
      """SELECT p_brand,
        | floor((CAST(sum(CAST(l_quantity AS DECIMAL(38,10))) AS DOUBLE)) * 10000 + 0.5) / 10000.0 AS sum_qty,
        | count(*) AS n
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY 1""".stripMargin
  )
}
