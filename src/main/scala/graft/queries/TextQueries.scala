package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Exact, Tables}
import graft.functions.TextFunctions._

/** Text-analysis operators over the `documents` table (SURVEY.md §2D8–D11).
  *
  * All map-only column pipelines: at 100 TB each of these is a single pass
  * over the corpus with no shuffle at all (the plans are scan → project),
  * so they scale linearly with executors and are bounded by read bandwidth.
  */
object TextQueries {

  private def docs(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)

  /** Corpus with the scan-parallelism floor applied ([[Tables.fanOut]]).
    * Wired ONLY into the operators whose downstream per-row work is heavy
    * enough to repay the exchange (token-explosion aggregations, shingle/
    * winnow chains — each verified faster at BOTH bench core counts).
    * Map-only and sub-second queries keep the plain scan: the r14 round
    * proved a blanket floor taxes every cheap query with an Exchange it
    * cannot amortize and breaks the map-only plan contracts (PlanSpec). */
  private def docsWide(s: SparkSession, d: String): DataFrame =
    Tables.fanOut(Tables.documents(s, d))

  /** D31 mix fixture: an up-weighted source, a lightly-weighted one, an
    * excluded one, everything else on the default weight. Budgets are
    * floor(w × total) LONG literals computed HERE so the oracle CASE
    * inlines the identical numbers. */
  private val mixWeights: Seq[(String, Double)] =
    Seq("src0" -> 0.30, "src1" -> 0.15, "src2" -> 0.05, "src3" -> 0.0)
  private val mixDefaultWeight = 0.025
  private val mixBudget = 8000L

  /** D78 Zipf rank-frequency least-squares fit over any (doc_id, text)
    * corpus — see the `text_zipf` entry for the design notes. */
  private[graft] def zipf(corpus: DataFrame, topK: Int = 1000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // Distributed top-k (TakeOrderedAndProject) over the O(vocab) table;
    // the rank window then runs over only topK rows (bounded by
    // construction), never a single-partition pass over the full vocab.
    val ranked = corpus
      .select(explode(tokens(col("text"))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("term").asc)
      .limit(topK)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("cnt").desc, col("term").asc)))
      .select(log(col("rank").cast("double")).as("x"),
        log(col("cnt").cast("double")).as("y"))
    val m = ranked.agg(
      count(lit(1)).as("n"),
      Exact.esum(col("x")).as("sx"), Exact.esum(col("y")).as("sy"),
      Exact.esum(col("x") * col("x")).as("sxx"),
      Exact.esum(col("y") * col("y")).as("syy"),
      Exact.esum(col("x") * col("y")).as("sxy"))
    val nD = col("n").cast("double")
    val slope = (col("sxy") - col("sx") * col("sy") / nD) /
      (col("sxx") - col("sx") * col("sx") / nD)
    val icept = (col("sy") - slope * col("sx")) / nD
    val r2num = (nD * col("sxy") - col("sx") * col("sy")) *
      (nD * col("sxy") - col("sx") * col("sy"))
    val r2den = (nD * col("sxx") - col("sx") * col("sx")) *
      (nD * col("syy") - col("sy") * col("sy"))
    m.select(col("n").as("n_terms"),
      Exact.rnd4(slope).as("slope"),
      Exact.rnd4(icept).as("intercept"),
      Exact.rnd4(when(col("n") <= 1 || r2den === 0.0, lit(0.0))
        .otherwise(r2num / r2den)).as("r2"))
  }

  /** D77 token-distribution entropy over any (doc_id, text) corpus — see
    * the `text_entropy` entry for the design notes. */
  private[graft] def entropy(corpus: DataFrame): DataFrame = {
    val dt = corpus
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("k"))
    val ag = dt.groupBy("doc_id").agg(
      sum(col("k")).as("n_tokens"),
      count(lit(1)).as("n_distinct"),
      Exact.esum(col("k").cast("double") * log(col("k").cast("double")))
        .as("s"))
    val nD = col("n_tokens").cast("double")
    val h = log(nD) - col("s") / nD
    ag.select(col("doc_id"), col("n_tokens"), col("n_distinct"),
      Exact.rnd4(h).as("entropy"),
      Exact.rnd4(when(col("n_tokens") <= 1, lit(0.0))
        .otherwise(lit(1.0) - h / log(nD))).as("redundancy"))
  }

  /** D72 collocation mining over any (doc_id, text) corpus — see the
    * `text_collocations` entry for the design notes. */
  private[graft] def collocations(corpus: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val t = tokens(col("text"))
    val uni = corpus.select(explode(t).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cw"))
    val bi = corpus.select(explode(shingles(t, 2)).as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("cab"))
      .filter(col("cab") >= 5)
    val tot = corpus.agg(
      sum(size(t).cast("long")).as("tt"),
      sum(when(size(t) >= 2, size(t) - 1).otherwise(0).cast("long"))
        .as("bt"))
    val joined = bi
      .withColumn("wa", split(col("bigram"), " ").getItem(0))
      .withColumn("wb", split(col("bigram"), " ").getItem(1))
      .join(broadcast(uni.select(col("w").as("wa"), col("cw").as("ca"))), "wa")
      .join(broadcast(uni.select(col("w").as("wb"), col("cw").as("cb"))), "wb")
      .crossJoin(broadcast(tot))
    val lift = col("cab").cast("double") * col("tt").cast("double") *
      col("tt").cast("double") /
      (col("bt").cast("double") * col("ca").cast("double") *
        col("cb").cast("double"))
    // Distributed top-32 first (TakeOrderedAndProject over the O(distinct
    // bigrams) table); the rank window is then bounded to 32 rows.
    joined.withColumn("lift", Exact.rnd4(lift))
      .orderBy(col("lift").desc, col("bigram").asc)
      .limit(32)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("lift").desc, col("bigram").asc)))
      .select(col("rank"), col("bigram"), col("cab"), col("ca"),
        col("cb"), col("lift"))
  }

  /** The streamed shard manifest for `corpus_shards_stream`, materialized
    * once per (JVM, sf dir): the corpus staged as files, replayed as a
    * micro-batched stream into the complete-mode manifest aggregation,
    * final store dumped to parquet (the invIndex/nbScored at-rest-fixture
    * convention — no driver-side corpus collect anywhere). */
  private val shardStreamCache =
    scala.collection.concurrent.TrieMap.empty[String, String]
  def shardManifestStream(s: SparkSession, d: String): DataFrame = {
    val path = shardStreamCache.getOrElseUpdate(d, {
      val arrivals = docs(s, d).select(col("doc_id"), col("text"))
      val stage = java.nio.file.Files
        .createTempDirectory("graft_shard_stream_").toString
      arrivals.repartition(3, col("doc_id")).write
        .mode("overwrite").parquet(stage)
      val name = "graft_shard_manifest_" +
        java.lang.Integer.toHexString(d.hashCode & 0x7fffffff)
      val q = graft.sources.Shards.manifest(
          s.readStream.schema(arrivals.schema)
            .option("maxFilesPerTrigger", 1).parquet(stage),
          nShards = 8, seed = "s42")
        .writeStream.format("memory").queryName(name)
        .outputMode("complete").start()
      val out = java.nio.file.Files
        .createTempDirectory("graft_shard_manifest_").toString
      try {
        q.processAllAvailable()
        s.table(name).write.mode("overwrite").parquet(out)
      } finally q.stop()
      out
    })
    s.read.parquet(path)
  }

  /** The stream-merged KMV sketches for `text_sketch_stream` (E10 through
    * the gate), materialized once per (JVM, sf dir) like
    * [[shardManifestStream]]: the corpus staged as files and replayed as a
    * real micro-batched file-source stream into a COMPLETE-mode
    * groupBy(source) over the mergeable bottom-k aggregate — Spark
    * partial-aggregates each micro-batch map-side and MERGES into the
    * state store, the same merge() the batch plan runs, so the final
    * sketches are bit-identical to one batch pass. Only the
    * mergeable-state columns ride (kth_hash + estimate): the exact
    * distinct-count companion of the batch anchor is not streaming state
    * (multiple/distinct aggregates are a rescan, not a merge), which is
    * precisely the sketch's reason to exist at 100 TB ingest. Arrival
    * order is immaterial — bottom-k of a union is order-free. */
  private val sketchStreamCache =
    scala.collection.concurrent.TrieMap.empty[String, String]
  def sketchStream(s: SparkSession, d: String): DataFrame = {
    val path = sketchStreamCache.getOrElseUpdate(d, {
      val k = 64
      val arrivals = docs(s, d).select(col("doc_id"), col("source"),
        col("text"))
      val stage = java.nio.file.Files
        .createTempDirectory("graft_sketch_stream_").toString
      arrivals.repartition(3, col("doc_id")).write
        .mode("overwrite").parquet(stage)
      // per-invocation unique suffix: two sf dirs can hash-collide, and
      // getOrElseUpdate may evaluate this builder twice under concurrent
      // first access — a reused queryName would throw on the second start
      val name = "graft_sketch_stream_" +
        java.util.UUID.randomUUID().toString.replace("-", "")
      val q = s.readStream.schema(arrivals.schema)
        .option("maxFilesPerTrigger", 1).parquet(stage)
        .select(col("source"),
          explode(graft.functions.TextFunctions.shingles(
            tokens(col("text")), 4)).as("g"))
        .groupBy("source")
        .agg(graft.functions.Sketch.bottomK(md5(col("g")), k).as("_sk"))
        .writeStream.format("memory").queryName(name)
        .outputMode("complete").start()
      val out = java.nio.file.Files
        .createTempDirectory("graft_sketch_out_").toString
      try {
        q.processAllAvailable()
        s.table(name)
          .select(col("source"),
            when(size(col("_sk")) >= k, element_at(col("_sk"), k))
              .as("kth_hash"),
            Exact.rnd4(graft.functions.Sketch.kmvEstimate(col("_sk"), k))
              .as("est_distinct"))
          .write.mode("overwrite").parquet(out)
      } finally q.stop()
      out
    })
    s.read.parquet(path)
  }

  /** The stream-scored quality verdicts for `text_quality_stream` (E13
    * through the gate), materialized once per (JVM, sf dir): the D58
    * ridge probe's weights are fitted ONCE in batch (the offline trainer),
    * then the corpus arrives as a real micro-batched file-source stream
    * whose foreachBatch scores each batch with [[graft.ml.RidgeProbe
    * .applyWeights]] — the identical broadcast-join DAG the batch
    * `fitScore` runs, so the streamed verdicts reproduce `text_quality_
    * fit`'s oracle VERBATIM. The train-offline / score-on-stream split
    * every production quality filter runs, now hash-gated end to end.
    * Stateless per batch: the weight table is 1 row, pinned before the
    * stream starts; no driver-side corpus collect anywhere. */
  private val qualityStreamCache =
    scala.collection.concurrent.TrieMap.empty[String, String]
  def qualityStreamScores(s: SparkSession, d: String): DataFrame = {
    val path = qualityStreamCache.getOrElseUpdate(d, {
      val xs = Seq("x1", "x2", "x3")
      val w = graft.ml.RidgeProbe.fit(
        graft.ml.RidgeProbe.qualityFeatures(docs(s, d)), xs, "y",
        lambda = 0.001)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      w.count()
      val arrivals = docs(s, d).select(col("doc_id"), col("text"))
      val stage = java.nio.file.Files
        .createTempDirectory("graft_quality_stream_").toString
      arrivals.repartition(3, col("doc_id")).write
        .mode("overwrite").parquet(stage)
      val outDir = java.nio.file.Files
        .createTempDirectory("graft_quality_out_").toString
      val q = s.readStream.schema(arrivals.schema)
        .option("maxFilesPerTrigger", 1).parquet(stage)
        .writeStream.outputMode("append")
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          // batchId-named file via tmp+rename: a retried batch (foreachBatch
          // is at-least-once) overwrites its own output instead of appending
          // a duplicate that would break the hash gate
          graft.streaming.DedupStreams.writeBatchFile(
            graft.ml.RidgeProbe.applyWeights(
              graft.ml.RidgeProbe.qualityFeatures(batch), w, xs, "y",
              threshold = 0.5),
            new org.apache.hadoop.fs.Path(outDir,
              f"batch-$batchId%05d.parquet"))
          ()
        }.start()
      try q.processAllAvailable() finally { q.stop(); w.unpersist() }
      outDir
    })
    s.read.parquet(path)
  }

  /** The stream-TRAINED logistic verdicts for `text_gd_stream` (E16
    * through the gate), materialized once per (JVM, sf dir): model
    * TRAINING on a stream — the corpus staged as 3 deterministic chunks
    * (doc_id % 3, arrival order by mtime), each micro-batch folding ONE
    * decimal-exact [[graft.ml.LogisticProbe.step]] into the driver-held
    * weights (foreachBatch is the documented home of batch-shaped
    * training state, the E9/E16 convention), then the whole corpus scored
    * once under the stream-trained literals. Because each step's gradient
    * is an exact decimal aggregate over a deterministic chunk, the DuckDB
    * oracle REPLAYS the entire online training as 3 unrolled chunk-step
    * CTEs — online learning itself is hash-gated, not just spec-pinned.
    * The weights held on the driver are k+1 doubles (metadata-sized). */
  private val gdStreamCache =
    scala.collection.concurrent.TrieMap.empty[String, String]
  def gdStreamScores(s: SparkSession, d: String): DataFrame = {
    val path = gdStreamCache.getOrElseUpdate(d, {
      val xs = Seq("x1", "x2", "x3")
      val arrivals = docs(s, d).select(col("doc_id"), col("text"))
      val stage = java.nio.file.Files
        .createTempDirectory("graft_gd_stream_").toString
      val stageP = new org.apache.hadoop.fs.Path(stage)
      val fs = stageP.getFileSystem(s.sparkContext.hadoopConfiguration)
      val base = System.currentTimeMillis() - 86400000L
      (0 until 3).foreach { c =>
        val tmp = java.nio.file.Files
          .createTempDirectory(s"graft_gd_chunk${c}_").toString
        arrivals.filter(col("doc_id") % 3 === c).repartition(1)
          .write.mode("overwrite").parquet(tmp)
        val tmpP = new org.apache.hadoop.fs.Path(tmp)
        val part = fs.listStatus(tmpP)
          .filter(_.getPath.getName.endsWith(".parquet")).headOption
          .getOrElse(sys.error(
            s"gd stream stage: chunk $c wrote no parquet part under $tmp"))
        val dst = new org.apache.hadoop.fs.Path(stageP,
          f"arrival-$c%05d.parquet")
        fs.rename(part.getPath, dst)
        fs.setTimes(dst, base + c * 60000L, -1)
      }
      @volatile var w: Seq[Double] = Vector.fill(xs.size + 1)(0.0)
      val q = s.readStream.schema(arrivals.schema)
        .option("maxFilesPerTrigger", 1).parquet(stage)
        .writeStream.outputMode("append")
        .foreachBatch { (batch: DataFrame, _: Long) =>
          w = graft.ml.LogisticProbe.step(
            graft.ml.RidgeProbe.qualityFeatures(batch), xs, "y",
            lr = 4.0, w)
          ()
        }.start()
      try q.processAllAvailable() finally q.stop()
      val outDir = java.nio.file.Files
        .createTempDirectory("graft_gd_out_").toString
      graft.ml.LogisticProbe.scoreWithWeights(
          graft.ml.RidgeProbe.qualityFeatures(docs(s, d)), xs, "y", w,
          threshold = 0.5)
        .write.mode("overwrite").parquet(outDir)
      outDir
    })
    s.read.parquet(path)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // D10: whitespace + BPE-ish token counting, chars/4 estimator.
    "text_tokens" -> { (s, d) =>
      docs(s, d).select(
        col("doc_id"),
        size(tokens(col("text"))).as("ws_tokens"),
        bpeCount(col("text")).as("bpe_tokens"),
        expr("(length(text) + 3) DIV 4").as("est_tokens"))
    },

    // D22: per-source corpus statistics — the size/length profile a
    // curation pipeline reads before setting sampling rates. Exact
    // percentiles (Spark `percentile` = DuckDB quantile_cont); one
    // partial-agg shuffle keyed on source.
    "text_corpus_stats" -> { (s, d) =>
      val t = tokens(col("text"))
      docs(s, d).select(col("source"), size(t).as("n_words"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_words").cast("long")).as("total_words"),
          Exact.rnd4(percentile(col("n_words"), lit(0.5))).as("p50_words"),
          Exact.rnd4(percentile(col("n_words"), lit(0.9))).as("p90_words"))
    },

    // D21: Gopher-style repetition signals — repeated-word fraction and
    // top-bigram fraction; high values flag templated/looping text. All
    // per-document higher-order column math, map-only.
    "text_repetition" -> { (s, d) =>
      val t = tokens(col("text"))
      docs(s, d).select(
        col("doc_id"), size(t).as("n_words"),
        Exact.rnd4(graft.functions.TextFunctions.dupWordFraction(t))
          .as("dup_word_frac"),
        Exact.rnd4(graft.functions.TextFunctions.topNgramFraction(t, 2))
          .as("top_bigram_frac"))
    },

    // D24: sequence packing — per-source fixed-token-budget packs in
    // deterministic (source, doc_id) order; one partitioned window, no
    // global sort.
    "text_pack" -> { (s, d) =>
      graft.functions.TextFunctions.packBySource(
        docs(s, d).select(col("doc_id"), col("source"), col("text")), 2048)
    },

    // D26: the composed curation pipeline — language filter → quality
    // filter → first-wins near-dedup on the survivors → sequence packing,
    // all as ONE declarative DataFrame chain (filters stay map-side; the
    // only shuffles are the dedup bucket hops and the pack window). Docs
    // with no signature (too short to shingle) carry no near-dup evidence
    // and are KEPT.
    "pipeline_curate" -> { (s, d) =>
      val base = docsWide(s, d)
        .select(col("doc_id"), col("source"), col("text"))
        .filter(qualityScore(col("text")) >= 0.5 &&
          langPredict(tokens(col("text"))) === "en")
      val verdicts = graft.dedup.Dedup.firstWinsKept(
        graft.dedup.Dedup.minhashSignatures(base))
      val kept = base.join(verdicts, Seq("doc_id"), "left")
        .filter(col("kept").isNull || col("kept") === 1)
        .select(col("doc_id"), col("source"), col("text"))
      graft.functions.TextFunctions.packBySource(kept, 1024)
    },

    // D26+D90: the composed EXPORT pipeline — the same curation chain as
    // pipeline_curate (language + quality filters, first-wins near-dedup)
    // ending in the D90 sharding manifest of the kept corpus: the full
    // curate→export story as one declarative chain, its data card the
    // output. Filters stay map-side; shuffles are the dedup bucket hops
    // and the one manifest partial-agg.
    "pipeline_export" -> { (s, d) =>
      val base = docsWide(s, d)
        .select(col("doc_id"), col("source"), col("text"))
        .filter(qualityScore(col("text")) >= 0.5 &&
          langPredict(tokens(col("text"))) === "en")
      val verdicts = graft.dedup.Dedup.firstWinsKept(
        graft.dedup.Dedup.minhashSignatures(base))
      val kept = base.join(verdicts, Seq("doc_id"), "left")
        .filter(col("kept").isNull || col("kept") === 1)
        .select(col("doc_id"), col("text"))
      graft.sources.Shards.manifest(kept, nShards = 8, seed = "s42")
    },

    // D57: the composed retrieval pipeline — chunk (D25) → per-chunk
    // bucket-count embedding → exact cosine top-5 per query, as ONE
    // declarative chain: the chunk-embed-index-search path of a RAG
    // ingest, with the featurizer a 1:1 slot for a trained encoder.
    // Chunking + embedding are map-side (zero shuffle); queries broadcast;
    // the only shuffle is the per-query top-k window over pre-scored rows.
    "pipeline_rag" -> { (s, d) =>
      import graft.functions.Retrieval
      val ch = Retrieval.embedChunks(
        docsWide(s, d).select(col("doc_id"),
            posexplode(chunk(tokens(col("text")), 32, 8)))
          .select(col("doc_id"), col("pos").cast("int").as("chunk_id"),
            col("col.text").as("chunk")),
        dims = 16)
      // queries = a 24-token mid-document slice at offset 8 of the first 3
      // docs. The 32/8 chunk grid's overlap exists exactly so any ≤8-offset
      // span this long is FULLY contained in one chunk — the self-document
      // must surface (TextSpec pins it).
      val qs = Retrieval.sliceQueries(docs(s, d), n = 3, off = 8, len = 24,
        dims = 16)
      Retrieval.topK(ch, qs, k = 5)
    },

    // D25: document chunking (64-token windows, 16 overlap) — map-side
    // explode, chunk text round-trips the tokenizer.
    "text_chunk" -> { (s, d) =>
      docs(s, d).select(col("doc_id"),
          posexplode(graft.functions.TextFunctions.chunk(
            tokens(col("text")), 64, 16)))
        .select(col("doc_id"), col("pos").cast("int").as("chunk_id"),
          col("col.start").as("start"), col("col.text").as("chunk"))
    },

    // D29: the full Gopher heuristic filter battery — every signal plus
    // the combined verdict per document, map-only.
    "text_gopher_rules" -> { (s, d) =>
      docs(s, d).select(col("doc_id"), gopherSignals(col("text")).as("g"))
        .select(col("doc_id"),
          col("g.n_words").as("n_words"),
          Exact.rnd4(col("g.mean_wlen")).as("mean_wlen"),
          Exact.rnd4(col("g.symbol_ratio")).as("symbol_ratio"),
          Exact.rnd4(col("g.bullet_frac")).as("bullet_frac"),
          Exact.rnd4(col("g.ellipsis_frac")).as("ellipsis_frac"),
          Exact.rnd4(col("g.alpha_frac")).as("alpha_frac"),
          col("g.stop_hits").as("stop_hits"),
          col("g.pass").as("pass"))
    },

    // D30: unigram-LM fluency score (the KenLM-perplexity-filter analog):
    // corpus-trained unigram counts broadcast back over the corpus.
    "text_lm_score" -> { (s, d) => unigramLmScore(docs(s, d)) },

    // D80: the interpolated bigram LM — the KenLM-shaped fluency filter;
    // unseen bigrams back off to the unigram leg, the first token scores
    // context-free.
    "text_lm_bigram" -> { (s, d) => bigramLmScore(docs(s, d)) },

    // D85: per-source JS divergence vs the corpus distribution — the
    // source-drift monitor of a mixture pipeline.
    "text_source_drift" -> { (s, d) =>
      sourceDrift(Tables.documents(s, d))
    },

    // D31: source mixing to a token budget — up-weighted, down-weighted,
    // defaulted and excluded sources in one mix.
    "text_mix" -> { (s, d) =>
      mixToBudget(docs(s, d), mixWeights, mixDefaultWeight, mixBudget)
    },

    // D41: temperature-based source rebalancing — quota ∝ √n_s (τ=0.5),
    // selection by the coordinated md5 rank.
    "text_temperature_mix" -> { (s, d) =>
      temperatureSample(docs(s, d), budget = 200L)
    },

    // D32: tf-idf top-3 characteristic terms per document.
    "text_tfidf" -> { (s, d) => tfidfTopTerms(docsWide(s, d), k = 3) },

    // D34: KMV distinct sketch — per-source distinct 4-gram cardinality
    // via the bottom-64 native aggregate (O(k) state, mergeable), with
    // the exact count alongside so the estimate's accuracy is visible
    // in the artifact itself.
    "text_distinct_sketch" -> { (s, d) =>
      val k = 64
      docsWide(s, d)
        .select(col("source"),
          explode(graft.functions.TextFunctions.shingles(
            tokens(col("text")), 4)).as("g"))
        .groupBy("source")
        .agg(graft.functions.Sketch.bottomK(md5(col("g")), k).as("_sk"),
          countDistinct(col("g")).as("true_distinct"))
        .select(col("source"), col("true_distinct"),
          when(size(col("_sk")) >= k, element_at(col("_sk"), k))
            .as("kth_hash"),
          Exact.rnd4(graft.functions.Sketch.kmvEstimate(col("_sk"), k))
            .as("est_distinct"))
    },

    // E10 through the gate: the STREAMED twin of text_distinct_sketch —
    // micro-batched arrival, complete-mode merge of the bottom-k state,
    // final sketches hash-checked against the batch oracle (minus the
    // exact-count companion, which is a rescan, not mergeable state).
    "text_sketch_stream" -> { (s, d) => sketchStream(s, d) },

    // D53: HyperLogLog registers — per-source distinct 4-gram cardinality
    // in 256 BYTES per sketch (vs KMV's k strings), merge = elementwise
    // max. Registers derive from md5 hex (index = first 2 chars, rank =
    // leading zeros of the next 48-bit field + 1), the estimate is the
    // raw harmonic fold with exact 2^-M terms — no ln(), no libm — so
    // registers AND estimate replay bit-for-bit in DuckDB. The __ALL__
    // row recomputes globally for the artifact; at lake scale it's the
    // max-union of the per-source register arrays (SketchSpec pins
    // merge ≡ global). True counts ride along to show the bias.
    "text_distinct_hll" -> { (s, d) =>
      val sh0 = docsWide(s, d).select(col("source"),
        explode(graft.functions.TextFunctions.shingles(
          tokens(col("text")), 4)).as("g"))
      val sh = sh0.unionByName(
        sh0.select(lit("__ALL__").as("source"), col("g")))
      sh.groupBy("source")
        .agg(graft.functions.Sketch.hll(md5(col("g")), 8).as("_rs"),
          countDistinct(col("g")).as("true_distinct"))
        .select(col("source"), col("true_distinct"),
          size(filter(col("_rs"), r => r === 0)).as("zero_regs"),
          Exact.rnd4(graft.functions.Sketch.hllEstimate(col("_rs"), 8))
            .as("est_distinct"))
    },

    // D38: count-min heavy hitters — ONE O(depth·width) sketch of the
    // whole token stream (never the key universe), estimates for the
    // exact top-20 alongside their true counts so the driver artifact
    // shows the over-count mass; the exact groupBy is the verification
    // twin the sketch replaces when the universe outgrows memory.
    "text_heavy_hitters" -> { (s, d) =>
      val (depth, width) = (4, 1024)
      val tok = docs(s, d).select(explode(tokens(col("text"))).as("t"))
      val sketch = tok.agg(graft.functions.Sketch
        .countMin(col("t"), depth, width).as("_cms"))
      tok.groupBy("t").agg(count(lit(1)).as("true_cnt"))
        .orderBy(col("true_cnt").desc, col("t").asc).limit(20)
        .crossJoin(broadcast(sketch))
        .select(col("t").as("token"), col("true_cnt"),
          graft.functions.Sketch
            .cmsEstimate(col("_cms"), col("t"), depth, width).as("est_cnt"))
    },

    // D51: lexical retrieval over inverted postings — the BM25 ranking
    // SHAPE (per-term tf saturation × rarity weight × length
    // normalization, Robertson & Zaragoza 2009) with the log-free
    // rational idf (N−df+0.5)/(df+0.5): log() is libm (not IEEE-exact
    // across engines — the D41 sqrt-vs-pow lesson), the odds form is a
    // per-term monotone transform of it, and every number here is exact
    // integer counts + pinned double ops, so ranks replay bit-for-bit.
    // The query's term IN-filter runs map-side BEFORE the postings
    // groupBy, so only the query terms' postings ever shuffle — with the
    // postings bucketed by term at lake scale, a search touches its
    // terms' buckets, never the corpus.
    "text_search_lexical" -> { (s, d) =>
      val terms = Seq("hash", "merge", "window")
      val base = docs(s, d).select(col("doc_id"),
        size(tokens(col("text"))).as("dl"),
        tokens(col("text")).as("_t"))
      val stats = base.agg(count(lit(1)).as("n"),
        sum(col("dl").cast("long")).as("total_len"))
      val postings = base
        .select(col("doc_id"), col("dl"), explode(col("_t")).as("term"))
        .filter(col("term").isin(terms: _*))
        .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))
      val nD = col("n").cast("double")
      val dfD = col("df").cast("double")
      val rel = col("dl").cast("double") /
        (col("total_len").cast("double") / nD)
      val idfR = (nD - dfD + 0.5) / (dfD + 0.5)
      val sat = col("tf").cast("double") * lit(2.2) /
        (col("tf").cast("double") + lit(1.2) * (lit(0.25) + lit(0.75) * rel))
      val dfTab = postings.groupBy("term").agg(count(lit(1)).as("df"))
      val comp = postings
        .join(broadcast(dfTab), Seq("term"))
        .crossJoin(broadcast(stats))
        .select(col("doc_id"), col("term"), (idfR * sat).as("c"))
      val scored = comp.groupBy("doc_id").agg(
        count(lit(1)).as("n_terms"),
        (coalesce(sum(when(col("term") === terms(0), col("c"))), lit(0.0)) +
          coalesce(sum(when(col("term") === terms(1), col("c"))), lit(0.0)) +
          coalesce(sum(when(col("term") === terms(2), col("c"))), lit(0.0)))
          .as("_score"))
      scored.orderBy(col("_score").desc, col("doc_id").asc).limit(20)
        .select(col("doc_id"), col("n_terms"),
          Exact.rnd4(col("_score")).as("score"))
    },

    // D45: Bloom-filter shingle membership — cross-crawl content overlap
    // without co-shuffling two corpora. "Yesterday's" crawl (even doc_id)
    // compresses to ONE 2^18-bit filter over its 8-gram shingles (map-side
    // partials, merge = bitwise OR, 32 KB state no matter the corpus
    // size); "today's" docs probe it map-side for a per-doc overlap
    // count. Never a false negative, so bloom_hits ≥ true_hits always —
    // the exact semi-join twin rides along to make the false-positive
    // mass visible in the artifact (m is a fixture constant here;
    // production sizes m to the expected n). At 100 TB the filter is the
    // only state that crosses days: the probe pays one scan + one 32 KB
    // broadcast where the exact answer co-shuffles both crawls.
    "text_bloom_overlap" -> { (s, d) =>
      val (bits, hashes) = (262144, 3)
      val sh = docsWide(s, d).select(col("doc_id"),
        explode(graft.functions.TextFunctions.shingles(
          tokens(col("text")), 8)).as("g"))
      val ref = sh.filter(col("doc_id") % 2 === 0).select(col("g"))
      val filt = ref.agg(
        graft.functions.Sketch.bloom(col("g"), bits, hashes).as("_bf"))
      val refSet = ref.distinct().withColumnRenamed("g", "rg")
      sh.filter(col("doc_id") % 2 === 1)
        .crossJoin(broadcast(filt))
        .join(refSet, col("g") === col("rg"), "left")
        .select(col("doc_id"),
          graft.functions.Sketch.bloomContains(col("_bf"), col("g"),
            bits, hashes).as("bh"),
          col("rg").isNotNull.as("th"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_shingles"),
          sum(when(col("bh"), 1L).otherwise(0L)).as("bloom_hits"),
          sum(when(col("th"), 1L).otherwise(0L)).as("true_hits"))
    },

    // D40: coordinated uniform row sample as a mergeable sketch + sample
    // quantiles. The sample = the k docs with the smallest md5(doc_id)
    // per source — BottomKSketch over "md5(id):value" keys (the 32-hex
    // prefix dominates the ordering, so membership depends on the id hash
    // ONLY: samples drawn for different value columns pick the SAME docs —
    // coordinated sampling, the property that makes cross-metric and
    // cross-day samples joinable at lake scale). O(k) state, map-side
    // partials, merge = keep k smallest: one pass, no shuffle of the
    // corpus, deterministic and DuckDB-replayable. Quantile estimates are
    // order statistics of the sample at ceil(q·n) rank — integer-exact;
    // the collect_list truth twin is the verification the sketch replaces
    // when a source outgrows memory.
    "text_sampled_quantiles" -> { (s, d) =>
      val k = 64
      val key = concat(md5(col("doc_id").cast("string")), lit(":"),
        col("n_chars").cast("string"))
      def at(sorted: org.apache.spark.sql.Column, q: Double) =
        element_at(sorted, ceil(lit(q) * size(sorted)).cast("int"))
      docs(s, d).groupBy("source")
        .agg(graft.functions.Sketch.bottomK(key, k).as("_sk"),
          sort_array(collect_list(col("n_chars"))).as("_all"))
        .select(col("source"),
          size(col("_sk")).cast("long").as("sample_n"),
          sort_array(transform(col("_sk"),
            x => split(x, ":").getItem(1).cast("long"))).as("_vals"),
          col("_all"))
        .select(col("source"), col("sample_n"),
          at(col("_vals"), 0.5).as("est_p50"),
          at(col("_vals"), 0.9).as("est_p90"),
          at(col("_all"), 0.5).as("true_p50"),
          at(col("_all"), 0.9).as("true_p90"))
    },

    // D49: per-source quality calibration — raw quality scores are not
    // comparable across heterogeneous sources (a boilerplate-heavy dump
    // compresses the score range), so selection thresholds are set on the
    // WITHIN-SOURCE percentile, not the raw score: pct = percent_rank
    // over the rnd4 quality grid per source, keep = pct ≥ 0.2 (drop each
    // source's bottom quintile). The per-dump normalization practice of
    // CCNet/FineWeb-style pipelines. One source-partitioned window —
    // same shuffle shape as text_pack; ranking on the shared rnd4 grid
    // keeps rank() (and so percent_rank) engine-independent.
    "text_quality_calibrated" -> { (s, d) =>
      val t = tokens(col("text"))
      val nWords = size(t)
      val stopRatio = stopHits(t, Seq("the", "a", "of", "and", "to", "in",
        "is")).cast("double") / nWords
      val avgWlen = length(regexp_replace(col("text"), " ", ""))
        .cast("double") / nWords
      val score =
        lit(0.4) * least(stopRatio * 5.0, lit(1.0)) +
        lit(0.3) * least(avgWlen / 8.0, lit(1.0)) +
        lit(0.3) * when(nWords.between(20, 1000), 1.0).otherwise(0.0)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("source").orderBy("quality")
      docs(s, d)
        .select(col("doc_id"), col("source"),
          Exact.rnd4(score).as("quality"))
        .withColumn("_pr", percent_rank().over(w))
        .select(col("doc_id"), col("source"), col("quality"),
          Exact.rnd4(col("_pr")).as("pct_in_source"),
          (col("_pr") >= 0.2).as("kept"))
    },

    // D58: ridge-TRAINED linear quality probe — the first model fit the
    // driver gate hash-verifies end-to-end (weights AND predictions).
    // Label = the curation keep-verdict (length band AND function-word
    // density floor — an AND of thresholds no linear scorer represents
    // exactly, so the fit is a real approximation problem); features =
    // the three cheap quality signals on the rnd4 grid; training =
    // closed-form ridge via decimal-exact moments + the shared Cramer
    // expansion (RidgeProbe). The practical op is classifier
    // distillation: collapse a rule cascade into one fused scan-time
    // scorer. Plan: scan → 14-sum global aggregate (map-side partials),
    // broadcast the 1-row weight table, re-scan to score — no data-row
    // shuffle at any scale.
    "text_quality_fit" -> { (s, d) =>
      graft.ml.RidgeProbe.qualityProbe(docs(s, d))
    },

    // E13 through the gate: the STREAMED twin of text_quality_fit —
    // weights trained offline once, every micro-batch scored with the
    // identical broadcast-join DAG, verdicts hash-checked against the
    // batch oracle verbatim (the train-offline / score-on-stream split).
    "text_quality_stream" -> { (s, d) => qualityStreamScores(s, d) },

    // D65: logistic quality probe — 8 full-batch GD steps with an
    // ALGEBRAIC sigmoid (no libm exp), decimal-exact gradients, weights
    // as plan literals (LogisticProbe). The classic hashed-LR curation
    // classifier, hash-gated end-to-end: one metadata-sized aggregation
    // per iteration, zero-shuffle literal scoring.
    "text_logistic_fit" -> { (s, d) =>
      graft.ml.LogisticProbe.qualityLogistic(docs(s, d))
    },

    // E16 through the gate: ONLINE TRAINING — one decimal-exact GD step
    // per arriving micro-batch (3 deterministic chunks), whole corpus
    // scored under the stream-trained weights; the oracle replays the
    // chunked training as unrolled SQL, so the online-learning seam is
    // hash-gated end to end.
    "text_gd_stream" -> { (s, d) => gdStreamScores(s, d) },

    // D59: BPE vocabulary training — K=8 merges learned from the corpus
    // word-frequency table (one corpus pass, then K compact-vocab
    // iterations; the driver only ever sees the K single-row argmaxes).
    // The merge list IS the model, hash-gated against an unrolled oracle
    // that replays every iteration.
    "text_bpe_train" -> { (s, d) =>
      graft.functions.Bpe.merges(s, graft.functions.Bpe.train(docs(s, d), 8))
    },

    // D60: tokenize with the trained merges — per-document subword counts
    // with all 8 merges applied as plan-time literals: a pure map over the
    // corpus (zero shuffle, codegen), the shape tokenization must have at
    // 100 TB.
    "text_bpe_apply" -> { (s, d) =>
      val table = docs(s, d)
      graft.functions.Bpe.subwordCounts(table,
          graft.functions.Bpe.train(table, 8))
        .filter(col("n_words") > 0)
    },

    // D35: DSIR importance weighting vs the src0 target domain, with
    // per-source stratified top-5 selection.
    "text_dsir" -> { (s, d) => dsirScore(docs(s, d)) },

    // D36: hashed-feature linear scorer (fastText-shape hashing trick).
    "text_hashed_score" -> { (s, d) => hashedLinearScore(docs(s, d)) },

    // D9: quality scoring from length/stopword/word-length signals.
    "text_quality" -> { (s, d) =>
      val t = tokens(col("text"))
      val nWords = size(t)
      val nChars = length(col("text"))
      val stopRatio = stopHits(t, Seq("the", "a", "of", "and", "to", "in", "is"))
        .cast("double") / nWords
      val avgWlen = length(regexp_replace(col("text"), " ", ""))
        .cast("double") / nWords
      val score =
        lit(0.4) * least(stopRatio * 5.0, lit(1.0)) +
        lit(0.3) * least(avgWlen / 8.0, lit(1.0)) +
        lit(0.3) * when(nWords.between(20, 1000), 1.0).otherwise(0.0)
      docs(s, d).select(
        col("doc_id"), nWords.as("n_words"),
        Exact.rnd4(stopRatio).as("stop_ratio"),
        Exact.rnd4(avgWlen).as("avg_word_len"),
        Exact.rnd4(score).as("quality"))
    },

    // D8: language ID — per-language stop-word hit scoring, deterministic
    // priority order on ties, all-zero → 'und'.
    "text_langid" -> { (s, d) =>
      val t = tokens(col("text"))
      val scores: Seq[(String, Column)] = langStopwords.map {
        case (lang, words) => lang -> stopHits(t, words)
      }
      val best = greatest(scores.map(_._2): _*)
      val pred = scores.foldRight(lit("und")) { case ((lang, sc), acc) =>
        when(sc === best && best > 0, lang).otherwise(acc)
      }
      // foldRight keeps declared priority: the first lang reaching the max
      // wins because its `when` is evaluated first.
      val cols = col("doc_id") +:
        scores.map { case (l, c) => c.as(s"s_$l") } :+ pred.as("lang_pred")
      docs(s, d).select(cols: _*)
    },

    // D14: deterministic stratified sampling — 50% of 'en', 10% default,
    // keyed by doc_id, reproducible across engines and cluster sizes.
    "text_sample" -> { (s, d) =>
      docs(s, d)
        .filter(stratifiedSampleKeep(col("doc_id"), col("lang"),
          Seq("en" -> 0.5), defaultRate = 0.1))
        .select(col("doc_id"), col("lang"))
    },

    // D15: corpus-wide top-k n-grams (count desc, ngram asc — total order,
    // so the LIMIT edge is deterministic). Partial aggregation makes the
    // shuffle O(distinct ngrams); the final top-k is a tiny sorted take.
    "text_topngrams" -> { (s, d) =>
      docsWide(s, d)
        .select(explode(shingles(tokens(col("text")), 2)).as("ngram"))
        .groupBy("ngram").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("ngram").asc)
        .limit(50)
    },

    // D16: PII redaction — emails/digit-runs rewritten map-side; the corpus
    // gets a deterministic synthetic PII suffix on every 5th doc so the
    // rewrite actually exercises.
    "text_redact" -> { (s, d) =>
      val withPii = when(col("doc_id") % 5 === 0,
        concat(col("text"),
          lit(" contact user123@example.com or call 12345678 now")))
        .otherwise(col("text"))
      docs(s, d).select(col("doc_id"),
        redact(withPii).as("clean"),
        (redact(withPii) =!= withPii).as("had_pii"))
    },

    // D11: document fingerprinting — md5 of normalized text plus a winnow
    // fingerprint (min md5 over 3-word shingles), robust to reordering at
    // the edges of the document.
    "text_fingerprint" -> { (s, d) =>
      val norm = normalize(col("text"))
      val sh = shingles(split(norm, " "), 3)
      docs(s, d).select(
        col("doc_id"),
        md5(norm).as("fp"),
        array_min(transform(sh, md5(_))).as("winnow_fp"))
    },

    // D69: χ² feature selection — the most English-discriminative terms
    // by chi-square over the per-term 2×2 presence/label contingency
    // (the classic supervised vocab/feature-selection step). Counts are
    // exact integers; χ² = N(ad−bc)²/((a+b)(c+d)(a+c)(b+d)) evaluates in
    // doubles identically cross-engine. Shuffle shape: distinct
    // (doc, term) explode → one O(doc-terms) term aggregation → the
    // final rank runs on O(vocab) rows (term-level, corpus-independent).
    "text_chi2_terms" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val base = docs(s, d).select(col("doc_id"),
        (col("lang") === "en").cast("long").as("en"),
        explode(array_distinct(tokens(col("text")))).as("term"))
      val tot = docs(s, d).agg(count(lit(1)).as("n"),
        sum((col("lang") === "en").cast("long")).as("n_en"))
      val byTerm = base.groupBy("term")
        .agg(count(lit(1)).as("ab"), sum("en").as("a"))
        .filter(col("ab") >= 5)
        .crossJoin(broadcast(tot))
      val (a, b) = (col("a").cast("double"),
        (col("ab") - col("a")).cast("double"))
      val c = (col("n_en") - col("a")).cast("double")
      val dd = (col("n") - col("n_en") - (col("ab") - col("a"))).cast("double")
      val chi2 = col("n").cast("double") * (a * dd - b * c) * (a * dd - b * c) /
        ((a + b) * (c + dd) * (a + c) * (b + dd))
      val scored = byTerm.withColumn("chi2", Exact.rnd4(chi2))
      // Distributed top-32 (TakeOrderedAndProject) over the O(vocab)
      // scored table; the rank window then sees only 32 rows.
      scored
        .orderBy(col("chi2").desc, col("term").asc)
        .limit(32)
        .withColumn("rank", row_number().over(
          Window.orderBy(col("chi2").desc, col("term").asc)))
        .select(col("rank"), col("term"), col("a").as("en_docs"),
          (col("ab") - col("a")).as("other_docs"), col("chi2"))
    },

    // D78: Zipf rank-frequency fit — the corpus-health diagnostic (a
    // natural-language corpus follows ln(freq) ≈ a + s·ln(rank) with
    // s ≈ −1; machine-generated or templated corpora bend the curve):
    // closed-form least squares of ln(cnt) on ln(rank) over the top-1000
    // vocabulary. Exact counts → deterministic (cnt DESC, term ASC) rank
    // → ln pairs → decimal-exact moment sums over ≤1000 term-level rows →
    // pinned-division slope/intercept/r². The corpus is scanned once into
    // an O(vocab) aggregate; everything after is corpus-size-independent.
    "text_zipf" -> { (s, d) => zipf(docs(s, d)) },

    // D90: deterministic corpus sharding manifest — the data card of the
    // training-data export (seeded-md5 shuffle → shard assignment →
    // per-shard exact counts, order-free xor content checksum, and the
    // permutation's first doc). Assignment is map-only; the manifest is
    // one O(docs) partial-agg groupBy to O(shards) rows; the at-rest
    // write (partitionBy(shard), permutation order within) is
    // spec-covered in ShardsSpec.
    "corpus_shards" -> { (s, d) =>
      graft.sources.Shards.manifest(docs(s, d), nShards = 8, seed = "s42")
    },

    // E21 through the gate: the STREAMED manifest twin of corpus_shards.
    // The manifest's aggregates (counts, sums, bit_xor, min_by) are all
    // mergeable, so the data card doubles as streaming state: the corpus
    // arrives as a file-source stream (one staged file per micro-batch)
    // and a complete-mode groupBy(shard) partial-aggregates each batch
    // and MERGES into the store. After the last batch the store must
    // equal the batch manifest bit-for-bit — this key shares
    // corpus_shards' hash oracle VERBATIM, putting the merge bookkeeping
    // through the gate (StreamingSpec E21 remains the in-flight parity
    // pin).
    "corpus_shards_stream" -> { (s, d) => shardManifestStream(s, d) },

    // D77: token-distribution Shannon entropy — the compressibility
    // quality proxy (low entropy relative to length = repetitive,
    // templated or looping text; the signal a gzip-ratio filter
    // approximates). entropy = ln(n) − Σ k·ln(k)/n from exact per-term
    // counts (ln on the D30 precedent; the k·ln(k) sum is decimal-exact
    // so the per-doc value is partition-invariant); `redundancy` =
    // 1 − H/ln(n) normalizes to [0,1]. One O(doc-terms) partial-agg
    // shuffle + one per-doc regroup — the tf-idf shape.
    "text_entropy" -> { (s, d) => entropy(docs(s, d)) },

    // D72: collocation mining — the corpus's most-associated bigrams by
    // PMI in its LOG-FREE lift form: lift(a,b) = (c(ab)/B)/((c(a)/T)²-ish
    // = c(ab)·T²/(B·c(a)·c(b)), a strictly monotone transform of PMI
    // (PMI = ln lift), so the ranking is identical while every number
    // stays exact integer counts + pinned IEEE multiply/divide (the D51
    // rational-idf lesson — no libm ln anywhere). The phrase-discovery
    // step of corpus curation (multi-word-expression vocab, tokenizer
    // seeding). Shuffle shape: one O(tokens) bigram explode collapsed by
    // partial agg to O(distinct bigrams), unigram counts broadcast back,
    // final rank on term-level rows — corpus scanned twice, never joined
    // row-wise.
    "text_collocations" -> { (s, d) => collocations(docsWide(s, d)) },

    // D66: MOSS winnowing — per-doc fingerprint SET selected as the
    // rightmost window minimum over 3-gram hashes (window 4): every
    // shared run of ≥6 tokens is guaranteed a shared fingerprint at
    // ~2/(w+1) density. Map-side explode, zero shuffle; the exploded
    // (doc, pos, fp) rows are the provenance index a lake would persist
    // bucketed by fp.
    "text_winnow" -> { (s, d) =>
      winnowFps(docsWide(s, d))
        .select(col("doc_id"), col("s.pos").as("pos"), col("s.fp").as("fp"))
    },

    // D67: cross-document overlap from the winnowed fingerprints — the
    // D66 consumer: pairs sharing ≥2 fingerprints ranked by containment
    // (shared / smaller fingerprint set). Fingerprint buckets above the
    // cap are dropped map-side BEFORE the pair explode (the D20 playbook:
    // an O(buckets) aggregate-count join, never a window sort), so pair
    // volume is O(matches), not O(corpus²) — boilerplate fingerprints
    // shared by everything can't detonate the join at lake scale.
    "text_winnow_overlap" -> { (s, d) =>
      // the fingerprint set feeds the cap filter, both pair sides and the
      // per-doc totals — pin it so the md5 gram hashing runs once
      // (released at the harness's per-query barrier)
      val fps = graft.core.CacheScope.pin(winnowFps(docsWide(s, d))
        .select(col("doc_id"), col("s.fp").as("fp")).distinct())
      val small = fps.groupBy("fp").agg(count(lit(1)).as("bn"))
        .filter(col("bn") <= 16)
      val capped = fps.join(broadcast(small.select("fp")), Seq("fp"))
      val perDoc = capped.groupBy("doc_id").agg(count(lit(1)).as("nfp"))
      val pairs = capped.as("a").join(capped.as("b"),
          col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("n_shared"))
        .filter(col("n_shared") >= 2)
      pairs
        .join(perDoc.withColumnRenamed("doc_id", "doc_a")
          .withColumnRenamed("nfp", "nfp_a"), Seq("doc_a"))
        .join(perDoc.withColumnRenamed("doc_id", "doc_b")
          .withColumnRenamed("nfp", "nfp_b"), Seq("doc_b"))
        .select(col("doc_a"), col("doc_b"), col("n_shared"),
          Exact.rnd4(col("n_shared").cast("double") /
            least(col("nfp_a"), col("nfp_b"))).as("containment"))
    }
  )

  /** Shared D66 fingerprint extraction: (doc_id, s{pos, fp}) rows. */
  private def winnowFps(d: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    d.select(col("doc_id"), gramHashes(shingles(toks, 3)).as("hs"))
      .select(col("doc_id"),
        explode(winnowFingerprints(col("hs"), 4)).as("s"))
  }

  private val stop7 = "('the', 'a', 'of', 'and', 'to', 'in', 'is')"

  /** Shared D66/D67 winnowing CTE chain: terminal CTE `wfp` exposes one
    * (doc_id, pos, fp) row per selected fingerprint. */
  private val winnowSqlCtes: String = {
    val fold8 =
      """CAST(list_sum(list_transform(generate_series(1, 8), fi ->
        |      (strpos('0123456789abcdef', substr(md5(g), fi, 1)) - 1)
        |      * power(16.0, 8 - fi))) AS BIGINT)""".stripMargin
    s"""wt AS (SELECT doc_id, string_split(text, ' ') AS tk
      |           FROM documents),
      |wg AS (
      |  SELECT doc_id, list_transform(generate_series(1, len(tk) - 2),
      |    i -> array_to_string(tk[i:i+2], ' ')) AS grams
      |  FROM wt WHERE len(tk) >= 3),
      |wh AS (
      |  SELECT doc_id, list_transform(grams, g -> $fold8) AS hs FROM wg),
      |ws AS (
      |  SELECT doc_id, hs,
      |    list_distinct(list_transform(generate_series(0, len(hs) - 4),
      |      i -> list_max(list_filter(generate_series(i, i + 3),
      |             p -> hs[CAST(p AS INTEGER) + 1] = list_min(hs[i+1:i+4])))))
      |      AS sel
      |  FROM wh WHERE len(hs) >= 4),
      |wfp AS (
      |  SELECT doc_id, CAST(p AS INTEGER) AS pos,
      |    hs[CAST(p AS INTEGER) + 1] AS fp
      |  FROM (SELECT doc_id, hs, unnest(sel) AS p FROM ws))""".stripMargin
  }

  /** Unrolled BPE iteration chain shared by both D59/D60 oracles: v0 =
    * the word-frequency table with spaced symbols, then for each rank k:
    * pair counts (pK) → argmax with the (count desc, pair asc) total
    * order (mK, columns renamed pK/cK so all K rows cross-join cleanly)
    * → vocab rewrite (vK) via the same double-replace the Column side
    * applies. Mirrors Bpe.scala expression for expression. */
  private def bpeChain(k: Int): String = {
    def rep(s: String, p: String): String = {
      val pat = s"' ' || $p || ' '"
      val r = s"' ' || replace($p, ' ', '') || ' '"
      s"replace(replace($s, $pat, $r), $pat, $r)"
    }
    val v0 =
      """v0 AS (
        |  SELECT wd, count(*) AS cnt,
        |    ' ' || array_to_string(list_transform(
        |      generate_series(1, length(wd)), i -> substring(wd, i, 1)),
        |      ' ') || ' ' AS sp
        |  FROM (SELECT unnest(string_split(text, ' ')) AS wd FROM documents)
        |  WHERE wd <> '' GROUP BY wd)""".stripMargin
    val steps = (1 to k).map { r =>
      s"""p$r AS (
        |  SELECT pr, sum(cnt) AS c FROM (
        |    SELECT unnest(list_transform(generate_series(1, len(sym) - 1),
        |      i -> sym[i] || ' ' || sym[i + 1])) AS pr, cnt
        |    FROM (SELECT string_split(trim(sp), ' ') AS sym, cnt
        |          FROM v${r - 1}))
        |  GROUP BY pr),
        |m$r AS (SELECT pr AS p$r, c AS c$r FROM p$r
        |  ORDER BY c DESC, pr ASC LIMIT 1),
        |v$r AS (SELECT wd, cnt, ${rep("sp", s"m$r.p$r")} AS sp
        |  FROM v${r - 1} CROSS JOIN m$r)""".stripMargin
    }
    (v0 +: steps).mkString(",\n")
  }

  private def bpeTrainSql(k: Int): String = {
    val rows = (1 to k).map { r =>
      s"SELECT CAST($r AS INT) AS merge_rank, p$r AS pair, " +
        s"replace(p$r, ' ', '') AS merged, CAST(c$r AS BIGINT) AS cnt FROM m$r"
    }
    s"WITH ${bpeChain(k)}\n${rows.mkString("\nUNION ALL\n")}"
  }

  private def bpeApplySql(k: Int): String = {
    def rep(s: String, p: String): String = {
      val pat = s"' ' || $p || ' '"
      val r = s"' ' || replace($p, ' ', '') || ' '"
      s"replace(replace($s, $pat, $r), $pat, $r)"
    }
    val spacedW = "' ' || array_to_string(list_transform(" +
      "generate_series(1, length(w)), i -> substring(w, i, 1)), ' ') || ' '"
    val chain = (1 to k).foldLeft(spacedW)((s, r) => rep(s, s"p$r"))
    s"""WITH ${bpeChain(k)}
      |SELECT doc_id, CAST(len(ws) AS INT) AS n_words,
      |  CAST(list_sum(list_transform(ws,
      |    w -> len(string_split(trim($chain), ' ')))) AS INT) AS n_subwords,
      |  floor((CAST(list_sum(list_transform(ws,
      |      w -> len(string_split(trim($chain), ' ')))) AS DOUBLE) / len(ws))
      |    * 10000 + 0.5) / 10000.0 AS subwords_per_word
      |FROM (SELECT doc_id,
      |        list_filter(string_split(text, ' '), w -> w <> '') AS ws
      |      FROM documents)
      |${(1 to k).map(r => s"CROSS JOIN m$r").mkString(" ")}
      |WHERE len(ws) > 0""".stripMargin
  }

  /** Shared WITH-body of the curation-chain oracles (`pipeline_curate`,
    * `pipeline_export`): language + quality filters (`f`) and the
    * first-wins near-dup verdicts (`dup`) over the filtered corpus. */
  private def curatePrefixSql: String = {
    val hits = langStopwords.map { case (lang, words) =>
      val inList = words.map(w => s"'$w'").mkString("(", ", ", ")")
      s"len(list_filter(string_split(text, ' '), w -> w IN $inList)) AS s_$lang"
    }.mkString(",\n    ")
    val bestExpr = langStopwords.map { case (l, _) => s"s_$l" }
      .mkString("greatest(", ", ", ")")
    val predExpr = "CASE " + langStopwords.map { case (l, _) =>
      s"WHEN s_$l = best AND best > 0 THEN '$l'"
    }.mkString(" ") + " ELSE 'und' END"
    s"""base AS (
       |  SELECT doc_id, source, text,
       |    len(string_split(text, ' ')) AS n_words,
       |    CAST(len(list_filter(string_split(text, ' '),
       |      w -> w IN $stop7)) AS DOUBLE) / len(string_split(text, ' ')) AS stop_ratio,
       |    CAST(length(replace(text, ' ', '')) AS DOUBLE)
       |      / len(string_split(text, ' ')) AS avg_word_len,
       |    $hits
       |  FROM documents),
       |b2 AS (SELECT *, $bestExpr AS best FROM base),
       |f AS (
       |  SELECT doc_id, source, text FROM b2
       |  WHERE 0.4 * least(stop_ratio * 5.0, 1.0)
       |      + 0.3 * least(avg_word_len / 8.0, 1.0)
       |      + 0.3 * (CASE WHEN n_words BETWEEN 20 AND 1000
       |               THEN 1.0 ELSE 0.0 END) >= 0.5
       |    AND ($predExpr) = 'en'),
       |${DedupQueries.sigOnlySql("corpus AS (SELECT doc_id, text FROM f)")},
       |s2 AS (SELECT doc_id, band, sig FROM sig WHERE sig IS NOT NULL),
       |owners AS (
       |  SELECT band, sig, min(doc_id) AS owner FROM s2 GROUP BY 1, 2),
       |dup AS (
       |  SELECT s2.doc_id,
       |    max(CASE WHEN s2.doc_id <> o.owner THEN 1 ELSE 0 END) AS d
       |  FROM s2 JOIN owners o ON s2.band = o.band AND s2.sig = o.sig
       |  GROUP BY s2.doc_id)""".stripMargin
  }

  /** Mirror of corpus_shards (and its streamed twin): the seeded-md5
    * order key (first 4 hex → int, mod 8), exact counts, xor of the
    * 8-hex content folds, and arg_min for the permutation's first doc —
    * all integers, so the manifest replays bit-for-bit. */
  private val shardsManifestSql: String =
    """WITH sa AS (
      |  SELECT doc_id,
      |    CAST(list_sum(list_transform(generate_series(1, 4), i ->
      |      (strpos('0123456789abcdef',
      |         substr(md5('s42:' || CAST(doc_id AS VARCHAR)), i, 1)) - 1)
      |      * power(16.0, 4 - i))) AS INT) % 8 AS shard,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS nt,
      |    CAST(list_sum(list_transform(generate_series(1, 8), i ->
      |      (strpos('0123456789abcdef', substr(md5(text), i, 1)) - 1)
      |      * power(16.0, 8 - i))) AS BIGINT) AS ch,
      |    md5('s42:' || CAST(doc_id AS VARCHAR)) AS k
      |  FROM documents)
      |SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(nt) AS BIGINT) AS n_tokens,
      |  bit_xor(ch) AS checksum,
      |  arg_min(doc_id, k) AS first_doc
      |FROM sa GROUP BY shard ORDER BY shard""".stripMargin

  /** Shared by `text_quality_fit` and its streamed twin
    * `text_quality_stream`: feature + Gopher-label CTE, then the
    * RidgeProbe-generated moment/Cramer/score SQL — the double DAG is the
    * SAME Cramer expansion the Column side evaluates, so the trained
    * weights hash-match bit for bit. */
  private val qualityFitSql: String = {
    val probe = graft.ml.RidgeProbe.oracleSql(
      featsCte = "f", idCol = "doc_id", k = 3,
      lambda = 0.001, threshold = 0.5)
    s"""WITH ${graft.ml.RidgeProbe.qualityFeatsSqlCtes},
      |$probe
      |SELECT doc_id, x1, x2, x3, y, w0, w1, w2, w3, score,
      |  score >= 0.5 AS kept
      |FROM scored""".stripMargin
  }

  val oracle: Map[String, String] = Map(

    "text_bpe_train" -> bpeTrainSql(8),
    "text_bpe_apply" -> bpeApplySql(8),

    "text_tokens" ->
      """SELECT doc_id,
        |  len(string_split(text, ' ')) AS ws_tokens,
        |  len(regexp_extract_all(text, '[A-Za-z]{1,4}|[0-9]|[^A-Za-z0-9 ]')) AS bpe_tokens,
        |  (length(text) + 3) // 4 AS est_tokens
        |FROM documents""".stripMargin,

    "text_corpus_stats" ->
      """WITH t AS (
        |  SELECT source, len(string_split(text, ' ')) AS n_words
        |  FROM documents)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(n_words) AS BIGINT) AS total_words,
        |  floor((quantile_cont(n_words, 0.5)) * 10000 + 0.5) / 10000.0 AS p50_words,
        |  floor((quantile_cont(n_words, 0.9)) * 10000 + 0.5) / 10000.0 AS p90_words
        |FROM t GROUP BY 1""".stripMargin,

    // the full curation chain, each stage the same SQL its standalone
    // oracle uses: quality + langid filters → minhash sig chain over the
    // SURVIVOR corpus → first-wins verdict (left join: no signature =
    // kept) → per-source pack window
    "pipeline_curate" ->
      (s"WITH $curatePrefixSql,\n" +
        """k AS (
         |  SELECT f.doc_id, f.source,
         |    CAST(len(string_split(f.text, ' ')) AS BIGINT) AS n_tokens
         |  FROM f LEFT JOIN dup USING (doc_id)
         |  WHERE dup.d IS NULL OR dup.d = 0),
         |c AS (
         |  SELECT doc_id, source, n_tokens,
         |    CAST(COALESCE(sum(n_tokens) OVER (
         |      PARTITION BY source ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS BIGINT) AS before
         |  FROM k)
         |SELECT doc_id, source, n_tokens,
         |  CAST(before // 1024 AS BIGINT) AS pack_id
         |FROM c""".stripMargin),

    // Mirror of pipeline_export: the shared curation prefix (filters +
    // first-wins verdicts) feeding the corpus_shards manifest aggregate
    // over the kept documents.
    "pipeline_export" ->
      (s"WITH $curatePrefixSql,\n" +
        """kept AS (
         |  SELECT f.doc_id, f.text FROM f LEFT JOIN dup USING (doc_id)
         |  WHERE dup.d IS NULL OR dup.d = 0),
         |sa AS (
         |  SELECT doc_id,
         |    CAST(list_sum(list_transform(generate_series(1, 4), i ->
         |      (strpos('0123456789abcdef',
         |         substr(md5('s42:' || CAST(doc_id AS VARCHAR)), i, 1)) - 1)
         |      * power(16.0, 4 - i))) AS INT) % 8 AS shard,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS nt,
         |    CAST(list_sum(list_transform(generate_series(1, 8), i ->
         |      (strpos('0123456789abcdef', substr(md5(text), i, 1)) - 1)
         |      * power(16.0, 8 - i))) AS BIGINT) AS ch,
         |    md5('s42:' || CAST(doc_id AS VARCHAR)) AS k
         |  FROM kept)
         |SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(nt) AS BIGINT) AS n_tokens,
         |  bit_xor(ch) AS checksum,
         |  arg_min(doc_id, k) AS first_doc
         |FROM sa GROUP BY shard ORDER BY shard""".stripMargin),

    // n_chunks = ceil(max(n - width, 0) / step) + 1; start k*step,
    // window width 64, step 48 — mirrors TextFunctions.chunk
    // Mirrors pipeline_rag: the same 32/8 chunk grid, the same first-hex
    // bucket counts (integer-exact), and the pinned cosine fold shape of
    // the native expression (i-ascending double products, sqrt norms).
    "pipeline_rag" -> {
      // feats = unigrams ++ bigrams, then first-hex md5 bucket counts
      def emb(tk: String): String =
        s"""list_transform(generate_series(0, 15), j ->
           |  CAST(len(list_filter(
           |    list_concat($tk, list_transform(
           |      generate_series(1, len($tk) - 1),
           |      i -> array_to_string($tk[i:i+1], ' '))),
           |    tk -> strpos('0123456789abcdef', substr(md5(tk), 1, 1)) - 1 = j))
           |  AS DOUBLE))""".stripMargin
      def cos(a: String, b: String): String =
        s"""list_sum(list_transform(generate_series(1, 16),
           |  i -> $a[i] * $b[i]))
           |/ (sqrt(list_sum(list_transform(generate_series(1, 16),
           |     i -> $a[i] * $a[i])))
           | * sqrt(list_sum(list_transform(generate_series(1, 16),
           |     i -> $b[i] * $b[i]))))""".stripMargin
      s"""WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |n AS (
        |  SELECT doc_id, toks,
        |    CAST(ceil(greatest(len(toks) - 32, 0) / 24.0) AS INT) + 1
        |      AS n_chunks
        |  FROM t),
        |ch AS (
        |  SELECT doc_id, CAST(k AS INT) AS chunk_id,
        |    toks[k * 24 + 1 : k * 24 + 32] AS ctoks
        |  FROM n, LATERAL unnest(generate_series(0, n_chunks - 1)) AS g(k)
        |  WHERE len(toks[k * 24 + 1 : k * 24 + 32]) >= 2),
        |ce AS (
        |  SELECT doc_id, chunk_id, ${emb("ctoks")} AS cv FROM ch),
        |q AS (
        |  SELECT doc_id AS q_id, toks[9:32] AS qtoks FROM t
        |  WHERE doc_id < 3 AND len(toks) >= 9),
        |qe AS (SELECT q_id, ${emb("qtoks")} AS qv FROM q),
        |sims AS (
        |  SELECT q_id, doc_id, chunk_id, ${cos("qv", "cv")} AS sim
        |  FROM qe CROSS JOIN ce),
        |ranked AS (
        |  SELECT q_id, doc_id, chunk_id, sim,
        |    row_number() OVER (PARTITION BY q_id
        |      ORDER BY sim DESC, doc_id, chunk_id) AS rank
        |  FROM sims)
        |SELECT q_id, doc_id, chunk_id, rank,
        |  floor((sim) * 10000 + 0.5) / 10000.0 AS sim
        |FROM ranked WHERE rank <= 5""".stripMargin
    },

    "text_chunk" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |n AS (
        |  SELECT doc_id, toks,
        |    CAST(ceil(greatest(len(toks) - 64, 0) / 48.0) AS INT) + 1
        |      AS n_chunks
        |  FROM t)
        |SELECT doc_id, CAST(k AS INT) AS chunk_id, k * 48 AS start,
        |  array_to_string(toks[k * 48 + 1 : k * 48 + 64], ' ') AS chunk
        |FROM n, LATERAL unnest(generate_series(0, n_chunks - 1)) AS g(k)""".stripMargin,

    // window-sum of BIGINT is HUGEINT in DuckDB — CAST keeps the engines'
    // schemas aligned (the events_sessionize lesson)
    "text_pack" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, source, n_tokens,
        |    CAST(COALESCE(sum(n_tokens) OVER (
        |      PARTITION BY source ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS before
        |  FROM t)
        |SELECT doc_id, source, n_tokens,
        |  CAST(before // 2048 AS BIGINT) AS pack_id
        |FROM c""".stripMargin,

    "text_repetition" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |g AS (
        |  SELECT doc_id, toks,
        |    CASE WHEN len(toks) < 2 THEN []
        |         ELSE list_transform(generate_series(1, len(toks) - 1),
        |                i -> array_to_string(toks[i:i+1], ' ')) END AS grams
        |  FROM t)
        |SELECT doc_id, len(toks) AS n_words,
        |  floor((CAST(len(toks) - len(list_distinct(toks)) AS DOUBLE)
        |         / len(toks)) * 10000 + 0.5) / 10000.0 AS dup_word_frac,
        |  floor((CASE WHEN len(grams) > 0
        |    THEN CAST(list_max(list_transform(list_distinct(grams),
        |           x -> len(list_filter(grams, y -> y = x)))) AS DOUBLE)
        |         / len(grams)
        |    ELSE 0.0 END) * 10000 + 0.5) / 10000.0 AS top_bigram_frac
        |FROM g""".stripMargin,

    // Mirror of TextFunctions.gopherSignals: integer-exact counts, one
    // double division per ratio, verdict on the unrounded values.
    "text_gopher_rules" ->
      """WITH t AS (
        |  SELECT doc_id, text,
        |    string_split(text, ' ') AS toks,
        |    string_split(text, chr(10)) AS lines
        |  FROM documents),
        |s AS (
        |  SELECT doc_id,
        |    len(toks) AS n_words,
        |    CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(toks)
        |      AS mean_wlen,
        |    ((length(text) - length(replace(text, '#', ''))) +
        |     CAST(length(text) - length(replace(text, '...', '')) AS DOUBLE)
        |       / 3.0) / len(toks) AS symbol_ratio,
        |    CAST(len(list_filter(lines, l -> starts_with(l, '- ')
        |        OR starts_with(l, '* ') OR starts_with(l, '• '))) AS DOUBLE)
        |      / len(lines) AS bullet_frac,
        |    CAST(len(list_filter(lines, l -> ends_with(l, '...'))) AS DOUBLE)
        |      / len(lines) AS ellipsis_frac,
        |    CAST(len(list_filter(toks, w -> regexp_matches(w, '[A-Za-z]')))
        |        AS DOUBLE) / len(toks) AS alpha_frac,
        |    len(list_filter(list_distinct(toks), w -> w IN
        |      ('the', 'be', 'to', 'of', 'and', 'that', 'have', 'with')))
        |      AS stop_hits
        |  FROM t)
        |SELECT doc_id, n_words,
        |  floor((mean_wlen) * 10000 + 0.5) / 10000.0 AS mean_wlen,
        |  floor((symbol_ratio) * 10000 + 0.5) / 10000.0 AS symbol_ratio,
        |  floor((bullet_frac) * 10000 + 0.5) / 10000.0 AS bullet_frac,
        |  floor((ellipsis_frac) * 10000 + 0.5) / 10000.0 AS ellipsis_frac,
        |  floor((alpha_frac) * 10000 + 0.5) / 10000.0 AS alpha_frac,
        |  stop_hits,
        |  (n_words BETWEEN 50 AND 100000 AND mean_wlen BETWEEN 3.0 AND 10.0
        |   AND symbol_ratio <= 0.1 AND bullet_frac <= 0.9
        |   AND ellipsis_frac <= 0.3 AND alpha_frac >= 0.8
        |   AND stop_hits >= 2) AS pass
        |FROM s""".stripMargin,

    // Mirror of TextFunctions.mixToBudget over the mixWeights fixture:
    // identical floor(w×total) budget literals, identical md5 epoch
    // order, window-sum CAST to BIGINT (the HUGEINT lesson).
    "text_mix" -> {
      val cases = mixWeights.map { case (s, w) =>
        s"WHEN '$s' THEN ${math.floor(w * mixBudget).toLong}"
      }.mkString(" ")
      val dflt = math.floor(mixDefaultWeight * mixBudget).toLong
      s"""WITH t AS (
        |  SELECT doc_id, source,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, source, n_tokens,
        |    CAST(COALESCE(sum(n_tokens) OVER (PARTITION BY source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |      AS tokens_before
        |  FROM t)
        |SELECT doc_id, source, n_tokens, tokens_before FROM c
        |WHERE tokens_before < (CASE source $cases ELSE $dflt END)""".stripMargin
    },

    // Mirror of the bottom-64 KMV sketch: the k smallest distinct md5
    // hashes per source are a DETERMINISTIC set, so the k-th hash and
    // the (k−1)/unit estimate replay exactly (hex value via digit fold —
    // integer-exact in doubles, one division).
    // Mirror of Sketch.hll(p=8)/hllEstimate: register index = first 2
    // md5 hex chars, rank = 49 − bitlength of the next 48-bit field
    // (0 → 49), register = max(rank) — all integers; the estimate folds
    // 1/(1<<r) in register order (exact doubles, list_sum ≡ the Spark
    // aggregate() sequential fold) under the same alpha literal.
    "text_distinct_hll" ->
      """WITH t AS (SELECT source, string_split(text, ' ') AS tk
        |           FROM documents),
        |g0 AS (
        |  SELECT source, unnest(list_transform(
        |    generate_series(1, len(tk) - 3),
        |    i -> array_to_string(tk[i:i+3], ' '))) AS g
        |  FROM t WHERE len(tk) >= 4),
        |sh AS (SELECT source, g FROM g0
        |       UNION ALL SELECT '__ALL__' AS source, g FROM g0),
        |d AS (SELECT DISTINCT source, g FROM sh),
        |pr AS (
        |  SELECT source, md5(g) AS h FROM d),
        |rk AS (
        |  SELECT source,
        |    (strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 16
        |      + (strpos('0123456789abcdef', substr(h, 2, 1)) - 1) AS idx,
        |    CAST(list_sum(list_transform(generate_series(1, 12), i ->
        |      (strpos('0123456789abcdef', substr(h, 2 + i, 1)) - 1)
        |      * power(16.0, 12 - i))) AS BIGINT) AS w
        |  FROM pr),
        |reg AS (
        |  SELECT source, idx,
        |    max(CASE WHEN w = 0 THEN 49 ELSE 49 - len(bin(w)) END) AS r
        |  FROM rk GROUP BY source, idx),
        |allreg AS (
        |  SELECT s.source, gs.j AS idx, COALESCE(reg.r, 0) AS r
        |  FROM (SELECT DISTINCT source FROM sh) s
        |  CROSS JOIN (SELECT unnest(generate_series(0, 255)) AS j) gs
        |  LEFT JOIN reg ON reg.source = s.source AND reg.idx = gs.j),
        |est AS (
        |  SELECT source,
        |    (0.7213 / (1.0 + 1.079 / 256.0)) * (256.0 * 256.0)
        |      / list_sum(list(1.0 / CAST(1::BIGINT << r AS DOUBLE)
        |                      ORDER BY idx)) AS e,
        |    sum(CASE WHEN r = 0 THEN 1 ELSE 0 END) AS zero_regs
        |  FROM allreg GROUP BY source),
        |td AS (SELECT source, count(DISTINCT g) AS true_distinct
        |       FROM sh GROUP BY source)
        |SELECT td.source, true_distinct,
        |  CAST(zero_regs AS BIGINT) AS zero_regs,
        |  floor((e) * 10000 + 0.5) / 10000.0 AS est_distinct
        |FROM td JOIN est USING (source)""".stripMargin,

    "text_distinct_sketch" ->
      """WITH t AS (SELECT source, string_split(text, ' ') AS tk
        |           FROM documents),
        |g AS (
        |  SELECT source, unnest(list_transform(
        |    generate_series(1, len(tk) - 3),
        |    i -> array_to_string(tk[i:i+3], ' '))) AS g
        |  FROM t WHERE len(tk) >= 4),
        |d AS (SELECT DISTINCT source, md5(g) AS h FROM g),
        |r AS (
        |  SELECT source, h,
        |    row_number() OVER (PARTITION BY source ORDER BY h) AS rk
        |  FROM d),
        |agg AS (
        |  SELECT source, count(*) AS true_distinct,
        |    max(CASE WHEN rk = 64 THEN h END) AS kth_hash
        |  FROM r GROUP BY 1)
        |SELECT source, true_distinct, kth_hash,
        |  floor((CASE WHEN true_distinct < 64
        |    THEN CAST(true_distinct AS DOUBLE)
        |    ELSE (63.0 * 4294967296.0) / list_sum(list_transform(
        |      generate_series(1, 8), i ->
        |        (strpos('0123456789abcdef', substr(kth_hash, i, 1)) - 1)
        |        * power(16.0, 8 - i)))
        |    END) * 10000 + 0.5) / 10000.0 AS est_distinct
        |FROM agg""".stripMargin,

    // E10: the merged streaming sketch equals the one-pass batch sketch,
    // so the streamed lifecycle is checked against the same KMV math —
    // minus the exact-count companion, which is not mergeable state.
    "text_sketch_stream" ->
      """WITH t AS (SELECT source, string_split(text, ' ') AS tk
        |           FROM documents),
        |g AS (
        |  SELECT source, unnest(list_transform(
        |    generate_series(1, len(tk) - 3),
        |    i -> array_to_string(tk[i:i+3], ' '))) AS g
        |  FROM t WHERE len(tk) >= 4),
        |d AS (SELECT DISTINCT source, md5(g) AS h FROM g),
        |r AS (
        |  SELECT source, h,
        |    row_number() OVER (PARTITION BY source ORDER BY h) AS rk
        |  FROM d),
        |agg AS (
        |  SELECT source, count(*) AS cnt,
        |    max(CASE WHEN rk = 64 THEN h END) AS kth_hash
        |  FROM r GROUP BY 1)
        |SELECT source, kth_hash,
        |  floor((CASE WHEN cnt < 64
        |    THEN CAST(cnt AS DOUBLE)
        |    ELSE (63.0 * 4294967296.0) / list_sum(list_transform(
        |      generate_series(1, 8), i ->
        |        (strpos('0123456789abcdef', substr(kth_hash, i, 1)) - 1)
        |        * power(16.0, 8 - i)))
        |    END) * 10000 + 0.5) / 10000.0 AS est_distinct
        |FROM agg""".stripMargin,

    // Mirror of TextFunctions.hashedLinearScore: same feature order
    // (tokens then bigrams), same integer hex folds for bucket and
    // weight, same strict left-fold sum (DuckDB list_sum ≡ Spark
    // aggregate), so feat_score is bit-identical and the label threshold
    // is exact.
    "text_hashed_score" -> {
      def fold(expr: String, n: Int): String =
        (0 until n).map { i =>
          val p = Seq.fill(n - 1 - i)(16L).product
          s"(strpos('0123456789abcdef', substr($expr, ${i + 1}, 1)) - 1) * $p"
        }.mkString("(", " + ", ")")
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk
        |           FROM documents),
        |f AS (
        |  SELECT doc_id, list_concat(tk, list_transform(
        |    generate_series(1, len(tk) - 1),
        |    i -> array_to_string(tk[i:i+1], ' '))) AS feats
        |  FROM t),
        |w AS (
        |  SELECT doc_id, len(feats) AS n_feats,
        |    list_sum(list_transform(
        |      list_transform(
        |        list_transform(feats, f -> md5(f)),
        |        h -> md5('w:' || CAST(${fold("h", 4)} AS VARCHAR))),
        |      g -> CAST(${fold("g", 8)} AS DOUBLE)
        |        / 4294967296.0 - 0.5)) / len(feats) AS m
        |  FROM f)
        |SELECT doc_id, n_feats,
        |  floor((m) * 10000 + 0.5) / 10000.0 AS feat_score,
        |  floor((1.0 / (1.0 + exp(-20.0 * m))) * 10000 + 0.5) / 10000.0
        |    AS quality_prob,
        |  m > 0.0 AS label
        |FROM w""".stripMargin
    },

    // Mirror of TextFunctions.dsirScore(target='src0', k=5): identical
    // add-one smoothing over the joint vocabulary, decimal-exact
    // order-independent per-doc sum, (score DESC, doc_id ASC) tie-break.
    "text_dsir" ->
      """WITH tok AS (
        |  SELECT doc_id, source, toks[k] AS tok
        |  FROM (SELECT doc_id, source, string_split(text, ' ') AS toks
        |        FROM documents),
        |    LATERAL unnest(generate_series(1, len(toks))) AS g(k)),
        |cc AS (SELECT tok, count(*) AS c_cnt FROM tok GROUP BY tok),
        |tc AS (SELECT tok, count(*) AS t_cnt FROM tok
        |       WHERE source = 'src0' GROUP BY tok),
        |sc AS (SELECT count(*) AS v, sum(c_cnt) AS c_tot FROM cc),
        |st AS (SELECT COALESCE(sum(t_cnt), 0) AS t_tot FROM tc),
        |lp AS (
        |  SELECT doc_id, source,
        |    ln(CAST(COALESCE(t.t_cnt, 0) + 1 AS DOUBLE)
        |       / CAST(c.c_cnt + 1 AS DOUBLE)) AS lp
        |  FROM tok JOIN cc c USING (tok) LEFT JOIN tc t USING (tok)),
        |doc AS (
        |  SELECT doc_id, source, count(*) AS n_tokens,
        |    CAST(sum(CAST(lp AS DECIMAL(38,10))) AS DOUBLE) AS raw
        |  FROM lp GROUP BY 1, 2),
        |sco AS (
        |  SELECT doc_id, source, n_tokens,
        |    raw + n_tokens * ln(CAST(c_tot + v AS DOUBLE)
        |                        / CAST(t_tot + v AS DOUBLE)) AS score
        |  FROM doc CROSS JOIN sc CROSS JOIN st),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY source
        |    ORDER BY score DESC, doc_id ASC) AS rk FROM sco)
        |SELECT source, doc_id, n_tokens,
        |  floor((score) * 10000 + 0.5) / 10000.0 AS dsir_score,
        |  rk, rk <= 5 AS selected
        |FROM r""".stripMargin,

    // Mirror of TextFunctions.tfidfTopTerms(k=3): identical smoothed-idf
    // arithmetic order, (score DESC, term ASC) tie-break.
    "text_tfidf" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
        |           FROM documents),
        |tok AS (
        |  SELECT doc_id, len(toks) AS n, toks[k] AS term
        |  FROM t, LATERAL unnest(generate_series(1, len(toks))) AS g(k)),
        |tc AS (
        |  SELECT doc_id, n, term, count(*) AS cnt FROM tok GROUP BY 1, 2, 3),
        |df AS (SELECT term, count(*) AS df FROM tc GROUP BY 1),
        |nd AS (SELECT count(*) AS n_docs FROM documents),
        |sc AS (
        |  SELECT doc_id, term,
        |    (CAST(cnt AS DOUBLE) / n) *
        |    (ln((CAST(n_docs AS DOUBLE) + 1.0) / (CAST(df AS DOUBLE) + 1.0))
        |     + 1.0) AS score
        |  FROM tc JOIN df USING (term) CROSS JOIN nd),
        |r AS (
        |  SELECT doc_id, term, score,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY score DESC, term ASC) AS rank
        |  FROM sc)
        |SELECT doc_id, rank, term,
        |  floor((score) * 10000 + 0.5) / 10000.0 AS score
        |FROM r WHERE rank <= 3""".stripMargin,

    // Mirror of TextFunctions.unigramLmScore(minCount=2): same unigram
    // training, OOV floor at 1/total, decimal-exact order-independent mean.
    "text_lm_score" ->
      """WITH tok AS (
        |  SELECT doc_id, toks[k] AS tok
        |  FROM (SELECT doc_id, string_split(text, ' ') AS toks
        |        FROM documents),
        |    LATERAL unnest(generate_series(1, len(toks))) AS g(k)),
        |counted AS (SELECT tok, count(*) AS cnt FROM tok GROUP BY tok),
        |tot AS (SELECT sum(cnt) AS total FROM counted),
        |vocab AS (SELECT tok, cnt FROM counted WHERE cnt >= 2),
        |lp AS (
        |  SELECT doc_id,
        |    -ln(CAST(COALESCE(v.cnt, 1) AS DOUBLE) / CAST(total AS DOUBLE))
        |      AS lp,
        |    v.cnt IS NULL AS oov
        |  FROM tok LEFT JOIN vocab v USING (tok) CROSS JOIN tot)
        |SELECT doc_id, count(*) AS n_tokens,
        |  floor((CAST(sum(CAST(oov AS INT)) AS DOUBLE) / count(*))
        |    * 10000 + 0.5) / 10000.0 AS oov_rate,
        |  floor((CAST(sum(CAST(lp AS DECIMAL(38,10))) AS DOUBLE) / count(*))
        |    * 10000 + 0.5) / 10000.0 AS lm_score
        |FROM lp GROUP BY doc_id""".stripMargin,

    // Mirror of TextFunctions.sourceDrift: identical count tables, pinned
    // p/q/m ratios and the same half-KL row terms, decimal-exact sums.
    "text_source_drift" ->
      """WITH tok AS (
        |  SELECT source AS src, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |cs AS (SELECT src, tok, count(*) AS c FROM tok GROUP BY 1, 2),
        |tots AS (SELECT src, sum(c) AS ns FROM cs GROUP BY 1),
        |ct AS (SELECT tok, sum(c) AS ctot FROM cs GROUP BY 1),
        |nall AS (SELECT sum(ctot) AS n FROM ct),
        |grid AS (
        |  SELECT tots.src, ct.tok, tots.ns, ct.ctot, cs.c
        |  FROM ct CROSS JOIN tots
        |  LEFT JOIN cs ON cs.src = tots.src AND cs.tok = ct.tok),
        |terms AS (
        |  SELECT src, ns,
        |    (CASE WHEN CAST(COALESCE(c, 0) AS DOUBLE) / CAST(ns AS DOUBLE) > 0.0
        |      THEN 0.5 * ((CAST(COALESCE(c, 0) AS DOUBLE) / CAST(ns AS DOUBLE))
        |        * ln((CAST(COALESCE(c, 0) AS DOUBLE) / CAST(ns AS DOUBLE))
        |          / ((CAST(COALESCE(c, 0) AS DOUBLE) / CAST(ns AS DOUBLE)
        |              + CAST(ctot AS DOUBLE) / CAST(nall.n AS DOUBLE)) / 2.0)))
        |      ELSE 0.0 END)
        |    + 0.5 * ((CAST(ctot AS DOUBLE) / CAST(nall.n AS DOUBLE))
        |        * ln((CAST(ctot AS DOUBLE) / CAST(nall.n AS DOUBLE))
        |          / ((CAST(COALESCE(c, 0) AS DOUBLE) / CAST(ns AS DOUBLE)
        |              + CAST(ctot AS DOUBLE) / CAST(nall.n AS DOUBLE)) / 2.0)))
        |    AS term
        |  FROM grid CROSS JOIN nall)
        |SELECT src AS source, CAST(max(ns) AS BIGINT) AS n_tokens,
        |  floor((CAST(sum(CAST(term AS DECIMAL(38,10))) AS DOUBLE))
        |    * 10000 + 0.5) / 10000.0 AS js_div
        |FROM terms GROUP BY 1""".stripMargin,

    // Mirror of TextFunctions.bigramLmScore(minCount=2, lambda=0.75):
    // identical vocab/bigram cuts, backoff CASE and interpolation DAG.
    "text_lm_bigram" ->
      """WITH tok AS (
        |  SELECT doc_id, toks[k] AS cur,
        |    CASE WHEN k > 1 THEN toks[k-1] END AS prev
        |  FROM (SELECT doc_id, string_split(text, ' ') AS toks
        |        FROM documents),
        |    LATERAL unnest(generate_series(1, len(toks))) AS g(k)),
        |uni AS (SELECT cur AS w, count(*) AS cu FROM tok GROUP BY 1),
        |tot AS (SELECT sum(cu) AS total FROM uni),
        |voc AS (SELECT w, cu FROM uni WHERE cu >= 2),
        |bg AS (
        |  SELECT prev, cur, count(*) AS cb FROM tok
        |  WHERE prev IS NOT NULL GROUP BY 1, 2 HAVING count(*) >= 2),
        |lp AS (
        |  SELECT t.doc_id, v.cu IS NULL AS oov,
        |    -ln(CASE WHEN t.prev IS NULL
        |      THEN CAST(COALESCE(v.cu, 1) AS DOUBLE) / CAST(total AS DOUBLE)
        |      ELSE 0.75 * (CASE WHEN b.cb IS NOT NULL AND c.cu IS NOT NULL
        |          THEN CAST(b.cb AS DOUBLE) / CAST(c.cu AS DOUBLE)
        |          ELSE 0.0 END)
        |        + 0.25 * (CAST(COALESCE(v.cu, 1) AS DOUBLE)
        |                  / CAST(total AS DOUBLE)) END) AS lp
        |  FROM tok t
        |  LEFT JOIN voc v ON t.cur = v.w
        |  LEFT JOIN voc c ON t.prev = c.w
        |  LEFT JOIN bg b ON t.prev = b.prev AND t.cur = b.cur
        |  CROSS JOIN tot)
        |SELECT doc_id, count(*) AS n_tokens,
        |  floor((CAST(sum(CAST(oov AS INT)) AS DOUBLE) / count(*))
        |    * 10000 + 0.5) / 10000.0 AS oov_rate,
        |  floor((CAST(sum(CAST(lp AS DECIMAL(38,10))) AS DOUBLE) / count(*))
        |    * 10000 + 0.5) / 10000.0 AS lm_score
        |FROM lp GROUP BY doc_id""".stripMargin,

    "text_quality" ->
      s"""WITH t AS (
        |  SELECT doc_id,
        |    len(string_split(text, ' ')) AS n_words,
        |    CAST(len(list_filter(string_split(text, ' '),
        |      w -> w IN $stop7)) AS DOUBLE) / len(string_split(text, ' ')) AS stop_ratio,
        |    CAST(length(replace(text, ' ', '')) AS DOUBLE)
        |      / len(string_split(text, ' ')) AS avg_word_len
        |  FROM documents)
        |SELECT doc_id, n_words,
        |  floor((stop_ratio) * 10000 + 0.5) / 10000.0 AS stop_ratio,
        |  floor((avg_word_len) * 10000 + 0.5) / 10000.0 AS avg_word_len,
        |  floor((0.4 * least(stop_ratio * 5.0, 1.0)
        |       + 0.3 * least(avg_word_len / 8.0, 1.0)
        |       + 0.3 * (CASE WHEN n_words BETWEEN 20 AND 1000 THEN 1.0 ELSE 0.0 END))
        |    * 10000 + 0.5) / 10000.0 AS quality
        |FROM t""".stripMargin,

    // Mirror of text_quality_fit: feature + Gopher-label CTE, then the
    // RidgeProbe-generated moment/Cramer/score SQL — the double DAG is the
    // SAME Cramer expansion the Column side evaluates, so the trained
    // weights hash-match bit for bit.
    "text_quality_fit" -> qualityFitSql,

    // E13: weights as plan literals + the identical scoring DAG make the
    // streamed verdicts bit-equal to fit-time scoring, so the streamed
    // lifecycle is checked against the SAME oracle verbatim.
    "text_quality_stream" -> qualityFitSql,

    // Mirror of text_logistic_fit: the same feature CTE, then the
    // LogisticProbe-generated unrolled-GD replay — iteration t's gradient
    // aggregates under iteration t−1's weight CTE, identical double DAG.
    "text_logistic_fit" -> {
      val gd = graft.ml.LogisticProbe.oracleSql(
        featsCte = "f", idCol = "doc_id", k = 3,
        lr = 4.0, iters = 12, threshold = 0.5)
      s"""WITH ${graft.ml.RidgeProbe.qualityFeatsSqlCtes},
        |$gd
        |SELECT doc_id, x1, x2, x3, y, w0, w1, w2, w3, score,
        |  score >= 0.5 AS kept
        |FROM lscored""".stripMargin
    },

    // E16: the same generator, but iteration t's gradient aggregates over
    // CHUNK t−1 only (doc_id % 3) — the unrolled SQL replay of the
    // stream's per-micro-batch training steps.
    "text_gd_stream" -> {
      val gd = graft.ml.LogisticProbe.oracleSql(
        featsCte = "f", idCol = "doc_id", k = 3,
        lr = 4.0, iters = 3, threshold = 0.5,
        iterWhere = t => s"WHERE (f.doc_id % 3) = ${t - 1}")
      s"""WITH ${graft.ml.RidgeProbe.qualityFeatsSqlCtes},
        |$gd
        |SELECT doc_id, x1, x2, x3, y, w0, w1, w2, w3, score,
        |  score >= 0.5 AS kept
        |FROM lscored""".stripMargin
    },

    // Mirror of text_quality_calibrated: same quality replay, percent_rank
    // over the rnd4 grid per source ((rank−1)/(n−1) in both engines),
    // keep-verdict on the raw rank fraction.
    "text_quality_calibrated" ->
      s"""WITH q AS (
        |  SELECT doc_id, source,
        |    floor((0.4 * least(
        |        CAST(len(list_filter(string_split(text, ' '),
        |          w -> w IN $stop7)) AS DOUBLE)
        |          / len(string_split(text, ' ')) * 5.0, 1.0)
        |      + 0.3 * least(CAST(length(replace(text, ' ', '')) AS DOUBLE)
        |          / len(string_split(text, ' ')) / 8.0, 1.0)
        |      + 0.3 * (CASE WHEN len(string_split(text, ' '))
        |          BETWEEN 20 AND 1000 THEN 1.0 ELSE 0.0 END))
        |      * 10000 + 0.5) / 10000.0 AS quality
        |  FROM documents),
        |p AS (
        |  SELECT doc_id, source, quality,
        |    percent_rank() OVER (PARTITION BY source ORDER BY quality) AS pr
        |  FROM q)
        |SELECT doc_id, source, quality,
        |  floor((pr) * 10000 + 0.5) / 10000.0 AS pct_in_source,
        |  pr >= 0.2 AS kept
        |FROM p""".stripMargin,

    "text_langid" -> {
      val hits = langStopwords.map { case (lang, words) =>
        val inList = words.map(w => s"'$w'").mkString("(", ", ", ")")
        s"len(list_filter(string_split(text, ' '), w -> w IN $inList)) AS s_$lang"
      }.mkString(",\n    ")
      val bestExpr = langStopwords.map { case (l, _) => s"s_$l" }
        .mkString("greatest(", ", ", ")")
      val caseExpr = langStopwords.map { case (l, _) =>
        s"WHEN s_$l = best AND best > 0 THEN '$l'"
      }.mkString("CASE ", " ", " ELSE 'und' END")
      s"""WITH t AS (
        |  SELECT doc_id,
        |    $hits
        |  FROM documents),
        |b AS (SELECT *, $bestExpr AS best FROM t)
        |SELECT doc_id, ${langStopwords.map { case (l, _) => s"s_$l" }.mkString(", ")},
        |  $caseExpr AS lang_pred
        |FROM b""".stripMargin
    },

    // md5-prefix thresholds: 0.5 → 80000000, 0.1 → 19999999 (floor(r·16⁸))
    "text_sample" ->
      """SELECT doc_id, lang FROM documents
        |WHERE CASE WHEN lang = 'en'
        |  THEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '80000000'
        |  ELSE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '19999999'
        |END""".stripMargin,

    "text_topngrams" ->
      """WITH sh AS (
        |  SELECT unnest(list_transform(generate_series(1, len(t) - 1),
        |    i -> array_to_string(t[i:i+1], ' '))) AS ngram
        |  FROM (SELECT string_split(text, ' ') AS t FROM documents))
        |SELECT ngram, count(*) AS cnt FROM sh GROUP BY 1
        |ORDER BY cnt DESC, ngram ASC LIMIT 50""".stripMargin,

    // Mirror of temperatureSample(budget=200): sqrt weights (IEEE ≡),
    // source-ordered normalizer fold, left-assoc multiply-then-divide,
    // coordinated md5 selection rank.
    "text_temperature_mix" ->
      """WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY 1),
        |w AS (SELECT source, sqrt(CAST(n AS DOUBLE)) AS w FROM c),
        |t AS (SELECT list_sum(list(w ORDER BY source)) AS tot FROM w),
        |q AS (
        |  SELECT w.source,
        |    greatest(CAST(1 AS BIGINT),
        |      CAST(floor(200.0 * w.w / t.tot) AS BIGINT)) AS quota
        |  FROM w CROSS JOIN t),
        |r AS (
        |  SELECT doc_id, source,
        |    CAST(row_number() OVER (PARTITION BY source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT)
        |      AS samp_rank
        |  FROM documents)
        |SELECT r.doc_id, r.source, r.samp_rank, q.quota
        |FROM r JOIN q USING (source) WHERE r.samp_rank <= q.quota""".stripMargin,

    // Mirror of the bottom-k coordinated sample: same "md5(id):value"
    // keys, same binary string order (ASCII ≡ UTF-16 code units for hex),
    // same ceil-rank order statistics — all integers.
    "text_sampled_quantiles" ->
      """WITH d AS (
        |  SELECT source, n_chars,
        |    md5(CAST(doc_id AS VARCHAR)) || ':' || CAST(n_chars AS VARCHAR)
        |      AS key
        |  FROM documents),
        |r AS (
        |  SELECT source, key,
        |    row_number() OVER (PARTITION BY source ORDER BY key) AS rk
        |  FROM d),
        |sv AS (
        |  SELECT source, list_sort(list_transform(list(key),
        |    s -> CAST(string_split(s, ':')[2] AS BIGINT))) AS vals
        |  FROM r WHERE rk <= 64 GROUP BY source),
        |tv AS (
        |  SELECT source, list(n_chars ORDER BY n_chars) AS allv
        |  FROM d GROUP BY source)
        |SELECT sv.source, CAST(len(vals) AS BIGINT) AS sample_n,
        |  vals[CAST(ceil(0.5 * len(vals)) AS INT)] AS est_p50,
        |  vals[CAST(ceil(0.9 * len(vals)) AS INT)] AS est_p90,
        |  allv[CAST(ceil(0.5 * len(allv)) AS INT)] AS true_p50,
        |  allv[CAST(ceil(0.9 * len(allv)) AS INT)] AS true_p90
        |FROM sv JOIN tv USING (source)""".stripMargin,

    // Mirror of Sketch.countMin/cmsEstimate: per-row bucket = first-8-hex
    // of md5('r:'||token) mod width (integer-exact via the digit fold —
    // the double holds ≤ 2³² exactly); the sketch cells are sums of true
    // token counts per (row, bucket) — identical to streaming increments —
    // and the estimate is the min cell across rows. All integers.
    "text_heavy_hitters" -> {
      def hexFold(expr: String): String =
        s"""CAST(list_sum(list_transform(generate_series(1, 8), i ->
           |    (strpos('0123456789abcdef', substr(md5($expr), i, 1)) - 1)
           |    * power(16.0, 8 - i))) AS BIGINT)""".stripMargin
      s"""WITH tok AS (
         |  SELECT unnest(string_split(text, ' ')) AS t FROM documents),
         |cnt AS (SELECT t, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY t),
         |rs AS (SELECT unnest(generate_series(0, 3)) AS r),
         |hb AS (
         |  SELECT cnt.t, cnt.c, rs.r,
         |    ${hexFold("CAST(rs.r AS VARCHAR) || ':' || cnt.t")} % 1024 AS b
         |  FROM cnt CROSS JOIN rs),
         |cms AS (
         |  SELECT r, b, CAST(sum(c) AS BIGINT) AS cell FROM hb GROUP BY r, b),
         |top AS (SELECT t, c FROM cnt ORDER BY c DESC, t ASC LIMIT 20)
         |SELECT top.t AS token, top.c AS true_cnt,
         |  CAST(min(cms.cell) AS BIGINT) AS est_cnt
         |FROM top JOIN hb ON hb.t = top.t
         |JOIN cms ON cms.r = hb.r AND cms.b = hb.b
         |GROUP BY top.t, top.c""".stripMargin
    },

    // Mirror of text_search_lexical: integer tf/df/dl counts, the
    // rational idf and the pinned saturation/normalization arithmetic,
    // fixed-order 3-term sum, (raw score DESC, doc_id) top-20.
    "text_search_lexical" ->
      """WITH base AS (
        |  SELECT doc_id, len(string_split(text, ' ')) AS dl,
        |    string_split(text, ' ') AS t
        |  FROM documents),
        |st AS (SELECT count(*) AS n, sum(dl) AS total_len FROM base),
        |po AS (
        |  SELECT doc_id, dl, w AS term, count(*) AS tf FROM (
        |    SELECT doc_id, dl, unnest(t) AS w FROM base)
        |  WHERE w IN ('hash', 'merge', 'window')
        |  GROUP BY doc_id, dl, w),
        |df AS (SELECT term, count(*) AS df FROM po GROUP BY term),
        |comp AS (
        |  SELECT doc_id, term,
        |    ((CAST(n AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
        |      / (CAST(df AS DOUBLE) + 0.5))
        |    * (CAST(tf AS DOUBLE) * 2.2
        |       / (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75
        |          * (CAST(dl AS DOUBLE)
        |             / (CAST(total_len AS DOUBLE) / CAST(n AS DOUBLE))))))
        |      AS c
        |  FROM po JOIN df USING (term) CROSS JOIN st),
        |sc AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms,
        |    COALESCE(sum(CASE WHEN term = 'hash' THEN c END), 0.0)
        |    + COALESCE(sum(CASE WHEN term = 'merge' THEN c END), 0.0)
        |    + COALESCE(sum(CASE WHEN term = 'window' THEN c END), 0.0)
        |      AS score
        |  FROM comp GROUP BY doc_id)
        |SELECT doc_id, n_terms,
        |  floor((sc.score) * 10000 + 0.5) / 10000.0 AS score
        |FROM sc ORDER BY sc.score DESC, doc_id ASC LIMIT 20""".stripMargin,

    // Mirror of Sketch.bloom/bloomContains: a shingle is a bloom hit when
    // ALL 3 md5 positions (same first-8-hex fold as the CMS buckets,
    // mod 2^18) land in the set-bit set of the even-doc_id reference
    // shingles — replaying positions replays the filter bit-for-bit.
    // All integers; the exact-membership twin is a plain semi-join.
    "text_bloom_overlap" -> {
      def hexFold(expr: String): String =
        s"""CAST(list_sum(list_transform(generate_series(1, 8), i ->
           |    (strpos('0123456789abcdef', substr(md5($expr), i, 1)) - 1)
           |    * power(16.0, 8 - i))) AS BIGINT)""".stripMargin
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
         |           FROM documents),
         |sh AS (
         |  SELECT doc_id, unnest(list_transform(generate_series(1,
         |      len(toks) - 7), i -> array_to_string(toks[i:i+7], ' ')))
         |    AS g
         |  FROM t WHERE len(toks) >= 8),
         |ref AS (SELECT DISTINCT g FROM sh WHERE doc_id % 2 = 0),
         |pos AS (
         |  SELECT DISTINCT
         |    ${hexFold("CAST(r AS VARCHAR) || ':' || g")} % 262144 AS p
         |  FROM ref CROSS JOIN (SELECT unnest(generate_series(0, 2)) AS r)),
         |ck AS (
         |  SELECT doc_id,
         |    (${hexFold("'0:' || g")} % 262144 IN (SELECT p FROM pos))
         |    AND (${hexFold("'1:' || g")} % 262144 IN (SELECT p FROM pos))
         |    AND (${hexFold("'2:' || g")} % 262144 IN (SELECT p FROM pos))
         |      AS bh,
         |    g IN (SELECT g FROM ref) AS th
         |  FROM sh WHERE doc_id % 2 = 1)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
         |  CAST(count(*) FILTER (WHERE bh) AS BIGINT) AS bloom_hits,
         |  CAST(count(*) FILTER (WHERE th) AS BIGINT) AS true_hits
         |FROM ck GROUP BY doc_id""".stripMargin
    },

    // Mirror of text_chi2_terms: same distinct-presence contingency,
    // same double χ² DAG, same (chi2 DESC, term ASC) rank.
    "text_chi2_terms" ->
      """WITH base AS (
        |  SELECT doc_id, CAST(lang = 'en' AS BIGINT) AS en,
        |    unnest(list_distinct(string_split(text, ' '))) AS term
        |  FROM documents),
        |tot AS (
        |  SELECT count(*) AS n,
        |    sum(CAST(lang = 'en' AS BIGINT)) AS n_en
        |  FROM documents),
        |bt AS (
        |  -- CAST: DuckDB sums BIGINT to HUGEINT (int128); the gate's typed
        |  -- hasher would see int128 vs Spark's int64 on en_docs/other_docs.
        |  SELECT term, count(*) AS ab, CAST(sum(en) AS BIGINT) AS a
        |  FROM base GROUP BY term HAVING count(*) >= 5),
        |sc AS (
        |  SELECT term, a, ab - a AS other_docs,
        |    floor((CAST(n AS DOUBLE)
        |      * (CAST(a AS DOUBLE) * CAST(n - n_en - (ab - a) AS DOUBLE)
        |         - CAST(ab - a AS DOUBLE) * CAST(n_en - a AS DOUBLE))
        |      * (CAST(a AS DOUBLE) * CAST(n - n_en - (ab - a) AS DOUBLE)
        |         - CAST(ab - a AS DOUBLE) * CAST(n_en - a AS DOUBLE))
        |      / ((CAST(a AS DOUBLE) + CAST(ab - a AS DOUBLE))
        |         * (CAST(n_en - a AS DOUBLE) + CAST(n - n_en - (ab - a) AS DOUBLE))
        |         * (CAST(a AS DOUBLE) + CAST(n_en - a AS DOUBLE))
        |         * (CAST(ab - a AS DOUBLE) + CAST(n - n_en - (ab - a) AS DOUBLE))))
        |      * 10000 + 0.5) / 10000.0 AS chi2
        |  FROM bt CROSS JOIN tot)
        |SELECT rank, term, en_docs, other_docs, chi2 FROM (
        |  SELECT term, a AS en_docs, other_docs, chi2,
        |    row_number() OVER (ORDER BY chi2 DESC, term ASC) AS rank
        |  FROM sc) WHERE rank <= 32""".stripMargin,

    // Mirror of text_zipf: same rank, ln pairs, decimal moments, and the
    // identical slope/intercept/r² double DAG.
    "text_zipf" ->
      """WITH zc AS (
        |  SELECT term, count(*) AS cnt FROM (
        |    SELECT unnest(string_split(text, ' ')) AS term FROM documents)
        |  GROUP BY 1),
        |zr AS (
        |  SELECT ln(CAST(rank AS DOUBLE)) AS x, ln(CAST(cnt AS DOUBLE)) AS y
        |  FROM (SELECT cnt,
        |          row_number() OVER (ORDER BY cnt DESC, term ASC) AS rank
        |        FROM zc)
        |  WHERE rank <= 1000),
        |zm AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CAST(x AS DECIMAL(38,10))) AS DOUBLE) AS sx,
        |    CAST(sum(CAST(y AS DECIMAL(38,10))) AS DOUBLE) AS sy,
        |    CAST(sum(CAST(x * x AS DECIMAL(38,10))) AS DOUBLE) AS sxx,
        |    CAST(sum(CAST(y * y AS DECIMAL(38,10))) AS DOUBLE) AS syy,
        |    CAST(sum(CAST(x * y AS DECIMAL(38,10))) AS DOUBLE) AS sxy
        |  FROM zr)
        |SELECT n AS n_terms,
        |  floor(((sxy - sx * sy / CAST(n AS DOUBLE))
        |    / (sxx - sx * sx / CAST(n AS DOUBLE))) * 10000 + 0.5)
        |    / 10000.0 AS slope,
        |  floor(((sy - ((sxy - sx * sy / CAST(n AS DOUBLE))
        |    / (sxx - sx * sx / CAST(n AS DOUBLE))) * sx)
        |    / CAST(n AS DOUBLE)) * 10000 + 0.5) / 10000.0 AS intercept,
        |  floor((CASE WHEN n <= 1
        |      OR (CAST(n AS DOUBLE) * sxx - sx * sx)
        |         * (CAST(n AS DOUBLE) * syy - sy * sy) = 0.0 THEN 0.0
        |    ELSE (CAST(n AS DOUBLE) * sxy - sx * sy)
        |         * (CAST(n AS DOUBLE) * sxy - sx * sy)
        |         / ((CAST(n AS DOUBLE) * sxx - sx * sx)
        |            * (CAST(n AS DOUBLE) * syy - sy * sy))
        |    END) * 10000 + 0.5) / 10000.0 AS r2
        |FROM zm""".stripMargin,

    // Mirror of Shards.manifest: the same seeded-md5 shard fold (first 4
    // hex → int, mod 8), exact counts, xor of the 8-hex content folds,
    // and arg_min for the permutation's first doc — all integers, so the
    // manifest replays bit-for-bit.
    "corpus_shards" -> shardsManifestSql,

    // E21's gate twin: the streamed complete-mode manifest must merge to
    // the identical data card — corpus_shards' oracle verbatim.
    "corpus_shards_stream" -> shardsManifestSql,

    // Mirror of text_entropy: same per-term counts, the same ln DAG and
    // decimal k·ln(k) sum, redundancy from the unrounded entropy.
    "text_entropy" ->
      """WITH etk AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |  FROM documents),
        |edt AS (SELECT doc_id, term, count(*) AS k FROM etk GROUP BY 1, 2),
        |eag AS (
        |  SELECT doc_id, CAST(sum(k) AS BIGINT) AS n_tokens,
        |    CAST(count(*) AS BIGINT) AS n_distinct,
        |    CAST(sum(CAST(CAST(k AS DOUBLE) * ln(CAST(k AS DOUBLE))
        |      AS DECIMAL(38,10))) AS DOUBLE) AS s
        |  FROM edt GROUP BY 1)
        |SELECT doc_id, n_tokens, n_distinct,
        |  floor((ln(CAST(n_tokens AS DOUBLE)) - s / CAST(n_tokens AS DOUBLE))
        |    * 10000 + 0.5) / 10000.0 AS entropy,
        |  floor((CASE WHEN n_tokens <= 1 THEN 0.0
        |    ELSE 1.0 - (ln(CAST(n_tokens AS DOUBLE))
        |                - s / CAST(n_tokens AS DOUBLE))
        |               / ln(CAST(n_tokens AS DOUBLE)) END)
        |    * 10000 + 0.5) / 10000.0 AS redundancy
        |FROM eag""".stripMargin,

    // Mirror of text_collocations: same counts, the same multiply/divide
    // DAG for the lift, the same (lift DESC, bigram ASC) rank.
    "text_collocations" ->
      """WITH toks AS (SELECT string_split(text, ' ') AS t FROM documents),
        |uni AS (
        |  SELECT w, count(*) AS cw FROM (
        |    SELECT unnest(t) AS w FROM toks) GROUP BY 1),
        |bi AS (
        |  SELECT bigram, count(*) AS cab FROM (
        |    SELECT unnest(list_transform(generate_series(1, len(t) - 1),
        |      i -> array_to_string(t[i:i+1], ' '))) AS bigram
        |    FROM toks) GROUP BY 1 HAVING count(*) >= 5),
        |tot AS (
        |  SELECT CAST(sum(len(t)) AS BIGINT) AS tt,
        |    CAST(sum(CASE WHEN len(t) >= 2 THEN len(t) - 1 ELSE 0 END)
        |      AS BIGINT) AS bt
        |  FROM toks),
        |j AS (
        |  SELECT bi.bigram, bi.cab, a.cw AS ca, b.cw AS cb,
        |    floor((CAST(bi.cab AS DOUBLE) * CAST(tot.tt AS DOUBLE)
        |      * CAST(tot.tt AS DOUBLE)
        |      / (CAST(tot.bt AS DOUBLE) * CAST(a.cw AS DOUBLE)
        |         * CAST(b.cw AS DOUBLE))) * 10000 + 0.5) / 10000.0 AS lift
        |  FROM bi
        |  JOIN uni a ON a.w = string_split(bi.bigram, ' ')[1]
        |  JOIN uni b ON b.w = string_split(bi.bigram, ' ')[2]
        |  CROSS JOIN tot)
        |SELECT rank, bigram, cab, ca, cb, lift FROM (
        |  SELECT bigram, cab, ca, cb, lift,
        |    row_number() OVER (ORDER BY lift DESC, bigram ASC) AS rank
        |  FROM j) WHERE rank <= 32""".stripMargin,

    // Mirror of text_winnow: same 3-gram hash sequence (8-hex md5 fold),
    // same rightmost-window-minimum selection over window starts, same
    // distinct-position set — list math in both engines.
    "text_winnow" ->
      s"""WITH $winnowSqlCtes
        |SELECT doc_id, pos, fp FROM wfp""".stripMargin,

    // Mirror of text_winnow_overlap: distinct (doc, fp), ≤16-doc buckets,
    // pair counts and min-side containment on the rnd4 grid.
    "text_winnow_overlap" ->
      s"""WITH $winnowSqlCtes,
        |dfp AS (SELECT DISTINCT doc_id, fp FROM wfp),
        |small AS (SELECT fp FROM dfp GROUP BY fp HAVING count(*) <= 16),
        |capped AS (SELECT d.doc_id, d.fp FROM dfp d JOIN small USING (fp)),
        |perdoc AS (SELECT doc_id, count(*) AS nfp FROM capped GROUP BY doc_id),
        |pairs AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    CAST(count(*) AS BIGINT) AS n_shared
        |  FROM capped a JOIN capped b
        |    ON a.fp = b.fp AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id
        |  HAVING count(*) >= 2)
        |SELECT p.doc_a, p.doc_b, p.n_shared,
        |  floor((CAST(p.n_shared AS DOUBLE) / least(na.nfp, nb.nfp))
        |    * 10000 + 0.5) / 10000.0 AS containment
        |FROM pairs p
        |JOIN perdoc na ON p.doc_a = na.doc_id
        |JOIN perdoc nb ON p.doc_b = nb.doc_id""".stripMargin,

    "text_redact" ->
      """WITH p AS (
        |  SELECT doc_id, CASE WHEN doc_id % 5 = 0
        |    THEN text || ' contact user123@example.com or call 12345678 now'
        |    ELSE text END AS t FROM documents),
        |r AS (SELECT doc_id, t, regexp_replace(regexp_replace(t,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+', '<EMAIL>', 'g'),
        |    '[0-9]{6,}', '<NUM>', 'g') AS clean FROM p)
        |SELECT doc_id, clean, clean <> t AS had_pii FROM r""".stripMargin,

    "text_fingerprint" ->
      """WITH n AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
        |         ' +', ' ', 'g')) AS norm
        |  FROM documents),
        |t AS (SELECT doc_id, norm, string_split(norm, ' ') AS toks FROM n)
        |SELECT doc_id, md5(norm) AS fp,
        |  list_aggregate(list_transform(generate_series(1, len(toks) - 2),
        |    i -> md5(array_to_string(toks[i:i+2], ' '))), 'min') AS winnow_fp
        |FROM t""".stripMargin
  )
}
