package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.Exact
import graft.functions.TextFunctions._

/** The RAG retrieval stages (SURVEY §2 D57) as reusable builders, so the
  * direct query (`pipeline_rag`) and the process-graph vocabulary
  * (`embed_chunks` / `slice_queries` / `similarity_search` nodes) compose
  * the IDENTICAL expressions — one definition, one oracle mirror, and the
  * graph variant shares the direct query's oracle verbatim.
  *
  * Scale shape (unchanged from the inline original): chunking + embedding
  * are map-side column math (zero shuffle at any corpus size), the query
  * table broadcasts, and the only shuffle is the per-query top-k window
  * over pre-scored rows. The bucket-count featurizer is a 1:1 slot for a
  * trained encoder (multimodal_embed_mlp runs real weights through the
  * same seam).
  */
object Retrieval {

  /** Unigram ++ bigram feature stream (the D36 feature build): bigrams
    * give the few hash buckets discriminative power on a small
    * vocabulary. */
  def ragFeatures(tk: Column): Column = concat(tk, shingles(tk, 2))

  /** Per-chunk bucket-count embedding; drops chunks too short to carry a
    * bigram (their feature vector is all-zero — cosine undefined). */
  def embedChunks(ch: DataFrame, dims: Int): DataFrame =
    ch.filter(size(tokens(col("chunk"))) >= 2)
      .withColumn("cemb", bucketCounts(ragFeatures(tokens(col("chunk"))), dims))

  /** Query fixture: a `len`-token mid-document slice at token `off` of the
    * first `n` documents, embedded with the same featurizer. The chunk
    * grid's overlap guarantees any span this long within the offset bound
    * is fully contained in one chunk, so the self-document must surface
    * (TextSpec pins it). */
  def sliceQueries(docs: DataFrame, n: Int, off: Int, len: Int,
                   dims: Int): DataFrame = {
    val t = tokens(col("text"))
    docs.filter(col("doc_id") < n && size(t) >= off + 1)
      .select(col("doc_id").as("q_id"),
        concat_ws(" ", slice(t, off + 1, len)).as("qtext"))
      .withColumn("qemb", bucketCounts(ragFeatures(tokens(col("qtext"))), dims))
  }

  /** Exact cosine top-k per query: queries broadcast against the chunk
    * table; deterministic tie-break (doc_id, chunk_id). */
  def topK(ch: DataFrame, qs: DataFrame, k: Int): DataFrame = {
    val sims = ch.crossJoin(broadcast(qs))
      .select(col("q_id"), col("doc_id"), col("chunk_id"),
        VectorFunctions.cosine(col("qemb"), col("cemb")).as("sim"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("q_id")
      .orderBy(col("sim").desc, col("doc_id"), col("chunk_id"))
    sims.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("doc_id"), col("chunk_id"), col("rank"),
        Exact.rnd4(col("sim")).as("sim"))
  }
}
