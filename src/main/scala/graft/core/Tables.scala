package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver-generated testdata lake (TESTDATA.md).
  *
  * Plain parquet scans: column pruning and predicate pushdown happen in the
  * callers' plans (verified via `PushedFilters` in explain output). At
  * cluster scale these paths would be a partitioned table; nothing here
  * assumes single-file inputs.
  */
object Tables {

  /** Id offset for synthetic twin corpora (dedup fixtures union a mutated
    * copy of every document/vector under `id + TwinShift`; the cluster
    * fixture adds a second copy at `id + TwinShift2`). 10⁹ leaves ~7
    * orders of magnitude of headroom over any replica corpus this harness
    * will see (the r13 ceiling was 10⁵, which a 20× docs replica already
    * touched); ids are int64 everywhere, and DuckDB's BIGINT addition
    * takes the same literal, so both engines shift identically.
    * Every twin builder still asserts max(id) < TwinShift — growth past
    * the ceiling must fail loudly, never silently corrupt the corpora. */
  val TwinShift: Long = 1000000000L
  val TwinShift2: Long = 2 * TwinShift

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
    else if (raw.schema("ts").dataType ==
        org.apache.spark.sql.types.TimestampNTZType)
      // parquet written without isAdjustedToUTC reads as TIMESTAMP_NTZ,
      // which watermarks, unix_micros and the Timestamp encoders reject —
      // normalize to TimestampType at the reader (session TZ is pinned
      // UTC, so the wall-clock interpretation matches the DuckDB oracle's
      // naive read exactly, and downstream code keeps ONE timestamp type)
      raw.withColumn("ts", col("ts").cast("timestamp"))
    else raw
  }
  /** events with a [from, to) time filter applied to the RAW nanosecond
    * column before the timestamp conversion. Predicates on the converted
    * `timestamp_micros(ts DIV 1000)` expression cannot reach the parquet
    * scan (only IsNotNull pushes); a plain Long comparison pushes as a
    * row-group min/max filter — at 100 TB this is the difference between
    * scanning a day and scanning the lake. Mirrors openEO semantics, where
    * the temporal extent belongs to load_collection itself.
    */
  def eventsRanged(s: SparkSession, d: String, from: String, to: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = read(s, d, "events")
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType) {
      // Nano bounds derived IN the session timezone (same interpretation as
      // filterTemporal and the oracle); the expression is foldable, so
      // constant folding turns it into a literal that still pushes to the
      // parquet scan. JVM-default-TZ parsing here would shift the selected
      // row range whenever session TZ != host TZ.
      def ns(t: String): Column =
        unix_micros(lit(t).cast("timestamp")) * lit(1000L)
      raw.filter(col("ts") >= ns(from) && col("ts") < ns(to))
        .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    } else {
      // NTZ storage: compare against NTZ literals so the predicate stays on
      // the raw column (pushable to the scan) and only THEN normalize the
      // type — a cast on the column side would block row-group pruning.
      val ntz = raw.schema("ts").dataType ==
        org.apache.spark.sql.types.TimestampNTZType
      val tt = if (ntz) "timestamp_ntz" else "timestamp"
      raw.filter(col("ts") >= lit(from).cast(tt) &&
          col("ts") < lit(to).cast(tt))
        .withColumn("ts", col("ts").cast("timestamp"))
    }
  }

  def documents(s: SparkSession, d: String): DataFrame = read(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = read(s, d, "embeddings")

  /** Scan-parallelism floor for CPU-dense per-row pipelines (tokenize →
    * shingle → md5 chains cost orders of magnitude more CPU per byte than
    * the scan itself). A parquet scan parallelizes at row-group
    * granularity, so a source written as one file with one row group —
    * this harness's testdata lake, or any small dimension snapshot — runs
    * its entire downstream map work in ONE task no matter how many cores
    * the cluster has; no split-size config can recover parallelism that
    * the file layout does not carry (guide §6: minPartitionNum floors the
    * SPLIT count, not the row-group count).
    *
    * When (and only when) the scan's file layout caps parallelism below
    * the session's default parallelism, redistribute round-robin to the
    * core count before the expensive map work. The repartition shuffles
    * the raw rows once — O(input) bytes, the cheapest possible exchange —
    * and is a provable no-op at lake scale, where any real table already
    * carries ≥ cores splits and this returns `df` unchanged; it is
    * therefore a floor, not a local-mode tuning constant. Row order
    * within partitions changes, which every operator in this repo is
    * already pinned to tolerate (partition-count invariance is bitwise-
    * verified per round at two core counts and two scale factors).
    *
    * The decision reads the FILE LAYOUT of the plan's scans (leaf file
    * sizes vs `spark.sql.files.maxPartitionBytes`), never `df.rdd` — the
    * r14 probe materialized an RDD lineage per query build (a fixed
    * driver tax on every sub-second query) and threw on streaming plans.
    * File sizes are cached per path for the session lifetime (the lake is
    * immutable during a run), so repeated corpus builds cost zero FS
    * calls. Streaming inputs pass through untouched: micro-batch
    * parallelism is the source's concern, and a static floor computed at
    * plan-build time would be meaningless there. Apply it ONLY on paths
    * whose downstream work is CPU-dense; for a cheap map or a tiny
    * aggregation the exchange is pure cost (the r14 lesson: a blanket
    * floor taxed ~180 sub-second queries and broke the map-only plan
    * pins). */
  private val fileLenCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  /** Estimated scan-split count of `df`'s leaf files, mirroring Spark's
    * packing rule (each file charged its size plus one open cost, bins of
    * maxPartitionBytes). Over-estimating is safe here: the floor then
    * skips a repartition that large inputs do not need anyway. */
  private def estScanSplits(df: DataFrame): Long = {
    val conf = df.sparkSession.sessionState.conf
    val maxSplit = math.max(1L, conf.filesMaxPartitionBytes)
    val openCost = conf.filesOpenCostInBytes
    val hconf = df.sparkSession.sessionState.newHadoopConf()
    val cost = df.inputFiles.map { p =>
      fileLenCache.computeIfAbsent(p, { _ =>
        val path = new org.apache.hadoop.fs.Path(p)
        try path.getFileSystem(hconf).getFileStatus(path).getLen
        catch { case _: java.io.IOException => 0L }
      }).longValue() + openCost
    }.sum
    math.max(1L, (cost + maxSplit - 1) / maxSplit)
  }

  def fanOut(df: DataFrame): DataFrame = {
    if (df.isStreaming) df
    else {
      val target = df.sparkSession.sparkContext.defaultParallelism
      if (estScanSplits(df) >= target) df else df.repartition(target)
    }
  }
}
