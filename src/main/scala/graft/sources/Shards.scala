package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Deterministic corpus sharding + manifest — SURVEY.md §2D90.
  *
  * The training-data export step: before a corpus feeds a trainer it is
  * (1) SHUFFLED — documents must arrive in a source-decorrelated order, or
  * early training sees one crawl/domain for hours — and (2) SHARDED into
  * fixed files whose contents and internal order every re-run reproduces
  * bit-for-bit (job restarts, re-exports and audits all depend on it).
  *
  * A seeded md5 over the document id gives both at once: the shard is the
  * first 4 hash hex digits mod nShards (a uniform, data-independent
  * assignment — map-only, no shuffle to ASSIGN), and the within-shard
  * position is the rank of the full hash string (a deterministic
  * pseudo-random permutation; ranking is windowed PER SHARD, so each shard
  * sorts independently and in parallel — there is no global sort and no
  * single-partition window anywhere). Writing `partitionBy(shard)` makes
  * the shard the at-rest unit a trainer's data loader maps 1:1 to workers.
  *
  * The manifest is the corpus data card: one row per shard with exact doc
  * and token counts plus an order-free xor checksum over the documents'
  * content hashes — enough to verify a re-export byte-for-byte without
  * re-reading either copy (xor of 32-bit md5-prefix folds: commutative, so
  * it needs no ordering guarantee from the aggregate, and exact in both
  * engines). One O(docs) partial-agg groupBy; output is O(shards).
  */
object Shards {

  /** Seeded order key: md5 over "seed:id" — the permutation driver. */
  private def orderKey(seed: String, idCol: Column): Column =
    md5(concat(lit(seed), lit(":"), idCol.cast("string")))

  /** Deterministic shard id: first 4 hex of the order key, mod nShards. */
  def shardOf(seed: String, idCol: Column, nShards: Int): Column =
    (conv(substring(orderKey(seed, idCol), 1, 4), 16, 10).cast("int")
      % nShards)

  /** 32-bit content hash of a document: first 8 md5 hex digits as a long
    * (the Sketch hexFold width — exact in IEEE doubles and DuckDB). */
  private def contentHash(textCol: Column): Column =
    conv(substring(md5(textCol), 1, 8), 16, 10).cast("long")

  /** The shuffled, sharded corpus: (shard, pos, doc_id, text...) with pos
    * the document's 1-based position in its shard under the seeded
    * permutation. Window is partitioned by shard — shards rank
    * independently, so the sort parallelizes across the cluster. */
  def assign(docs: DataFrame, nShards: Int, seed: String,
             idCol: String = "doc_id"): DataFrame = {
    val key = orderKey(seed, col(idCol))
    val w = Window.partitionBy("shard").orderBy(key.asc, col(idCol).asc)
    docs.withColumn("shard", shardOf(seed, col(idCol), nShards))
      .withColumn("pos", row_number().over(w))
  }

  /** Materialize the shards: one directory per shard, each internally in
    * permutation order (the loader reads files as written). */
  def write(docs: DataFrame, path: String, nShards: Int, seed: String,
            idCol: String = "doc_id"): Unit =
    assign(docs, nShards, seed, idCol)
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("pos"))
      .write.mode("overwrite").partitionBy("shard").parquet(path)

  /** The per-shard manifest (data card): exact doc/token counts, the
    * order-free xor content checksum, and the permutation's first doc id
    * (pins that the ORDER, not just the membership, reproduced). */
  def manifest(docs: DataFrame, nShards: Int, seed: String,
               idCol: String = "doc_id",
               textCol: String = "text"): DataFrame =
    docs.select(col(idCol),
        shardOf(seed, col(idCol), nShards).as("shard"),
        size(TextFunctions.tokens(col(textCol))).cast("long").as("_nt"),
        contentHash(col(textCol)).as("_ch"),
        orderKey(seed, col(idCol)).as("_k"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("_nt")).as("n_tokens"),
        bit_xor(col("_ch")).as("checksum"),
        min_by(col(idCol), col("_k")).as("first_doc"))
      .orderBy("shard")
}
