package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory each
  * entry maps to. `queries` keys and `oracleSql` keys line up 1:1 for every
  * SQL-expressible operator; rows-only operators appear in `queries` alone.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    BenchQueries.queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    BenchQueries.queries ++ CubeQueries.queries ++ TextQueries.queries ++
      DedupQueries.queries ++ SimQueries.queries ++ MlQueries.queries ++
      StreamQueries.queries ++ PipelineQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    BenchQueries.oracle ++ CubeQueries.oracle ++ TextQueries.oracle ++
      DedupQueries.oracle ++ SimQueries.oracle ++ MlQueries.oracle ++
      StreamQueries.oracle ++ PipelineQueries.oracle
}
