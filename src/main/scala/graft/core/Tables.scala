package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver-generated testdata lake (TESTDATA.md).
  *
  * Plain parquet scans: column pruning and predicate pushdown happen in the
  * callers' plans (verified via `PushedFilters` in explain output). At
  * cluster scale these paths would be a partitioned table; nothing here
  * assumes single-file inputs.
  */
object Tables {
  def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = read(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = read(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = read(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = read(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = read(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = read(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = read(s, d, "lineitem")
  /** events.parquet stores `ts` as TIMESTAMP(NANOS), which Spark has no
    * native type for. Sessions set spark.sql.legacy.parquet.nanosAsLong, and
    * this reader converts the nano count to a microsecond TimestampType with
    * integer division (a double intermediate would lose precision at 1e18).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    // Defensive: a driver-owned session may not carry this conf, and without
    // it the TIMESTAMP(NANOS) column throws before our Long fallback can run.
    // It is a runtime SQLConf, so setting it at read time is safe.
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = read(s, d, "events")
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    else raw
  }
  def documents(s: SparkSession, d: String): DataFrame = read(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = read(s, d, "embeddings")
}
