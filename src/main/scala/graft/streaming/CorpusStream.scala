package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Streaming corpus hygiene: the continuous-ingestion twin of
  * [[graft.ops.CorpusOps]] — documents arrive as a stream and are screened
  * against a STATIC benchmark set before landing in the corpus.
  */
object CorpusStream {

  private val ngramN = 8

  /** The benchmark 8-gram set for a testdata dir (the static side of the
    * screen): distinct grams of the doc_id ≡ 0 (mod 37) slice, exactly the
    * split [[graft.ops.CorpusOps.decontaminateNgram]] uses.
    */
  def benchGrams(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.functions.WordNgrams.word_ngrams
    Tables.documents(spark, dir)
      .filter($"doc_id" % 37 === 0)
      .select(explode(word_ngrams(lower(trim($"text")), ngramN)).as("ng"))
      .distinct()
  }

  /** Stream-static decontamination screen: every incoming document's
    * 8-grams are probed against the static benchmark gram set; the output
    * stream carries one row per (doc_id, matching gram) — the audit log of
    * leaked spans. Contaminated docs are `SELECT DISTINCT doc_id` at the
    * sink; clean docs pass by never appearing.
    *
    * Scale shape: the gram explode is map-side per micro-batch; the probe
    * is a stream-static LEFT SEMI join whose static side (benchmark grams —
    * MBs for real benchmark suites) is broadcast, so the stream never
    * shuffles and no streaming state accumulates (no watermark needed: a
    * semi join against a static side is stateless). When even the gram set
    * outgrows a broadcast, the production refinement is a Bloom filter
    * literal probed per gram via the native BloomFilterMightContain
    * expression (as in EventsPipeline.antiJoinFresh), with the exact semi
    * join run only on the flagged remainder.
    *
    * `docs` must be a streaming DataFrame with (doc_id, text).
    */
  def decontaminateStream(docs: DataFrame, bench: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    import graft.functions.WordNgrams.word_ngrams
    docs
      .select($"doc_id", explode(word_ngrams(lower(trim($"text")), ngramN)).as("ng"))
      .join(broadcast(bench), Seq("ng"), "left_semi")
      .select($"doc_id", $"ng")
  }

  /** Streaming quality-classifier screen: the model-based filter applied
    * at ingest time — one stateless map-side inference pass per
    * micro-batch (classifier inference is THE streaming-friendly curation
    * op: no state, no watermark, no shuffle). The scoring core is shared
    * with the batch [[graft.ops.LlmQueries.qualityClassifier]], so a doc
    * gets the identical margin and label whether it arrives in a backfill
    * or on the stream (StreamingSpec pins the parity).
    *
    * `docs` must be a streaming DataFrame with (doc_id, text).
    */
  def classifyStream(docs: DataFrame): DataFrame =
    graft.ops.LlmQueries.qualityClassifierOn(docs)

  /** Ingest-time text normalization: the NFC/control/whitespace cleaning
    * pass on the document stream — stateless map-side projection per
    * micro-batch, core SHARED verbatim with batch text_normalize so a doc
    * normalizes identically in backfill and stream (parity spec-pinned).
    * Running it AT INGEST is the production shape: everything downstream
    * (fingerprints, band indexes, tokenizers) sees only normalized bytes.
    */
  def normalizeStream(docs: DataFrame): DataFrame =
    graft.ops.CorpusOps.textNormalizeOn(docs)

  /** Trained-model streaming quality screen: the LR classifier fit by
    * [[graft.ops.QualityTrain]] applied to an unbounded document stream.
    * Train on the landed corpus (batch, once), serve on the stream —
    * weights are plan literals, the projection is stateless, and the
    * inference core is the batch entry's own [[graft.ops.QualityTrain
    * .scoreLrOn]], so a replayed batch can never score differently
    * (StreamingCorpusSpec pins exact parity).
    */
  def classifyLrStream(docs: DataFrame, w: Array[Double]): DataFrame =
    graft.ops.QualityTrain.scoreLrOn(docs, w)

  /** The per-source keep-threshold table for a testdata dir — the STATIC
    * side of the domain-mix screen, computed once from the corpus's
    * source counts by the shared [[graft.ops.CorpusOps.domainMixThresholds]]
    * core (the same rows the batch rollup aggregates over).
    */
  def domainMixThresholds(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.ops.CorpusOps.domainMixThresholds(
      Tables.documents(spark, dir).select($"doc_id", $"source", $"n_chars"))
  }

  /** Stream-static domain-mixing screen — the continuous-ingestion twin of
    * [[graft.ops.CorpusOps.sampleDomainMix]]: the α=0.5 temperature
    * thresholds come from the STATIC corpus's source statistics (the
    * mixture being rebalanced toward), broadcast as one bounded row-set;
    * each incoming document's keep decision is then map-side per
    * micro-batch — deterministic Knuth-hash bucket < per-source threshold,
    * the identical rule (identical code) the batch operator applies, so a
    * doc is kept on the stream iff the batch resample would keep it
    * (StreamingSpec pins the keep-set parity on replayed batches).
    *
    * Stateless: no watermark, no streaming state, no shuffle — a
    * stream-static broadcast equi-join on `source` plus a map-side filter,
    * exactly like [[decontaminateStream]]'s screen shape.
    *
    * Unknown-source policy: on a live stream, sources can appear AFTER
    * the thresholds were computed. The join is LEFT so such docs are a
    * visible decision, not a silent inner-join drop: they are KEPT
    * (threshold defaults to the keep-everything 1.0) — a brand-new
    * domain has no over-representation to rebalance away, and dropping
    * it would silently blind the mixture to new domains until the next
    * threshold refresh. Callers wanting drop-unknown semantics pass
    * `keepUnknown = false` (threshold defaults to 0). Thresholds are in
    * bucket units (buckets span [0, 1e6)), so keep-everything is 1e6.
    *
    * `docs` must be a streaming DataFrame with (doc_id, source, n_chars).
    */
  def sampleDomainMixStream(docs: DataFrame, thresholds: DataFrame,
      keepUnknown: Boolean = true): DataFrame = {
    import docs.sparkSession.implicits._
    val default = if (keepUnknown) 1000000L else 0L
    docs
      .withColumn("bucket", graft.ops.CorpusOps.domainMixBucket($"doc_id"))
      .join(broadcast(thresholds.select($"source", $"threshold")), Seq("source"), "left")
      .filter($"bucket" < coalesce($"threshold", lit(default)))
      .select($"doc_id", $"source", $"n_chars")
  }

  /** Streaming PII screen: redaction applied at ingest time — like
    * [[classifyStream]], a stateless map-side pass per micro-batch (regex
    * scrubbing has no state, no watermark, no shuffle). The scrub core is
    * shared verbatim with the batch
    * [[graft.ops.CorpusOps.textPiiScrub]], so a document is scrubbed and
    * audit-counted identically in a backfill and on the stream
    * (StreamingSpec pins the parity).
    *
    * `docs` must be a streaming DataFrame with (doc_id, text).
    */
  def piiScrubStream(docs: DataFrame): DataFrame =
    graft.ops.CorpusOps.textPiiScrubCore(docs)

  /** Stream-static near-duplicate screen against the PERSISTED MinHash
    * band index ([[graft.ops.ScaleDedup.saveBandIndex]]) — ingest-time
    * near-dedup, the streaming twin of `dedup_incremental_banded_persisted`
    * and the third screen in this file's decontaminate / classify family:
    * each incoming document is MinHash-banded in-flight (map-side), its
    * band rows probe the loaded (band, band_key) bucket table, and
    * candidates are verified with the SAME exact unigram Jaccard ≥ 0.9
    * (same lang block) against the loaded word-set table. Output is the
    * audit-log shape the other screens use: one row per verified
    * (doc_id, corpus_doc_id, jaccard) match, possibly repeated per shared
    * band — duplicate docs are `SELECT DISTINCT doc_id` at the sink,
    * clean docs pass by never appearing. (The batch twin's
    * best-match-per-doc window cannot run on a stream; distinct-at-sink
    * replaces it, as in decontaminateStream.)
    *
    * Plan shape: banding is stateless and map-side; both probe joins are
    * stream-STATIC (the index tables are the static side), so no
    * streaming state accumulates and no watermark is needed. The doc's
    * (lang, word set) ride the band rows via `bandRows(_, carry)` —
    * re-joining them from the same stream would be a stream-stream join.
    * At scale the static side is the persisted index a cluster already
    * serves batch dedup from; candidate work per micro-batch is bucket
    * occupancy, independent of corpus size.
    *
    * `docs` must be a streaming DataFrame with (doc_id, lang, text).
    */
  def nearDedupStream(docs: DataFrame, indexPath: String): DataFrame = {
    import docs.sparkSession.implicits._
    val spark = docs.sparkSession
    val corpusIndex = spark.read.parquet(s"$indexPath/bands")
      .select($"band", $"band_key", $"doc_id".as("corpus_doc_id"))
    val corpusW = spark.read.parquet(s"$indexPath/wordsets")
      .select($"doc_id".as("corpus_doc_id"), $"lang".as("c_lang"), $"w".as("wc"))
    graft.ops.ScaleDedup.bandRows(
        docs.select($"doc_id", $"lang", $"text",
          graft.ops.ScaleDedup.wordSet($"text").as("w")),
        carry = Seq("lang", "w"))
      .join(corpusIndex, Seq("band", "band_key"))
      .join(corpusW, Seq("corpus_doc_id"))
      .filter($"lang" === $"c_lang")
      .withColumn("inter", size(array_intersect($"w", $"wc")))
      .withColumn("uni", size(array_union($"w", $"wc")))
      .withColumn("jaccard", $"inter".cast("double") / $"uni".cast("double"))
      .filter($"jaccard" >= 0.9)
      .select($"doc_id", $"corpus_doc_id", $"jaccard")
  }

  /** Streaming training-shard writer — the continuous-ingestion twin of
    * [[graft.ops.Curation.writeShards]]: each micro-batch of curated
    * documents lands in the SAME deterministic shard layout
    * (`shard=<id>/` dirs, [[graft.ops.Curation.withShardKeys]] keys), so
    * a trainer reads one layout whether the corpus arrived as a backfill
    * or on the stream.
    *
    * Idempotent under redelivery, the [[EventsPipeline.upsertWarehouseSink]]
    * discipline verbatim: the batch is deduped on doc_id and anti-joined
    * (Bloom-prefiltered) against the doc_ids already landed, so a
    * foreachBatch retry or at-least-once upstream appends nothing twice
    * (StreamingSpec replays a batch and pins parity with writeShards).
    *
    * Appends cost O(batch) — one file per (batch, shard), the
    * appendBucketedSink trade. Within-shard global order is recovered by
    * sorting on the persisted order_key at read time (or by a
    * compactBuckets-style rewrite); a streaming writer cannot keep a
    * total order inside a file set it only appends to — the keys, not
    * file order, are the contract (the manifest [[graft.ops.Curation.corpusShard]]
    * is identical either way).
    *
    * `docs` must be a streaming DataFrame with (doc_id, lang, text).
    */
  def shardSink(docs: DataFrame, path: String,
      shards: Int = 16): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val fresh = EventsPipeline.freshRows(
          batch.select(col("doc_id"), col("lang"), col("text")), path, "doc_id")
        graft.ops.Curation.withShardKeys(fresh, shards)
          .repartition(col("shard"))
          .sortWithinPartitions(col("shard"), col("order_key"), col("doc_id"))
          .write.mode("append").partitionBy("shard").parquet(path)
        ()
      }

  /** Streaming maintenance of the persisted inverted index — the
    * continuous-ingestion twin of
    * [[graft.ops.LlmQueries.appendToPostingIndex]]: each micro-batch of
    * landed documents is tokenized and appended to the bucketed posting
    * layout, so [[graft.ops.LlmQueries.textSearchFromIndex]] serves one
    * index whether the corpus arrived as a backfill or on the stream.
    *
    * Idempotent under redelivery, the [[EventsPipeline]] sink discipline:
    * the batch is deduped on doc_id and Bloom-anti-joined against the
    * doc_ids already in the posting table (a doc_id-column-pruned probe
    * scan, the zorderSink contract), so a foreachBatch retry or
    * at-least-once upstream appends no posting twice and the meta ledger
    * gains no phantom batch row. Appends cost O(batch) — one file per
    * (batch, touched bucket); oversized buckets fold back via
    * [[graft.ops.LlmQueries.compactPostingBuckets]].
    *
    * `docs` must be a streaming DataFrame with (doc_id, text).
    */
  def postingIndexSink(docs: DataFrame, indexPath: String): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) => postingFold(batch, indexPath) }

  /** The per-batch body of [[postingIndexSink]], factored out for direct
    * tests.
    */
  private[graft] def postingFold(batch: DataFrame, indexPath: String): Unit =
    if (!batch.isEmpty) {
      val fresh = EventsPipeline.freshRows(
        batch.select(col("doc_id"), col("text")), s"$indexPath/postings", "doc_id")
      if (!fresh.isEmpty) graft.ops.LlmQueries.appendToPostingIndex(fresh, indexPath)
    }

  /** Streaming CLIP-score screen: crawled caption–image pairs scored at
    * ingest time — like [[classifyStream]] a stateless map-side pass per
    * micro-batch (dual-encoder agreement has no state, no watermark, no
    * shuffle: both tower embeddings arrive in one row). The scoring core
    * is shared verbatim with the batch
    * [[graft.ops.Multimodal.multimodalClipFilter]], so a pair keeps or
    * drops identically in a backfill and on the stream (StreamingSpec
    * pins the parity on replayed batches).
    *
    * `pairs` must be a streaming DataFrame with
    * (pair_id, caption_id, image_id, va, na, vb, nb) — quantized tower
    * vectors and their squared norms.
    */
  def clipFilterStream(pairs: DataFrame): DataFrame =
    graft.ops.Multimodal.clipScreenOn(pairs)
}
