package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Training-data curation operators: chunking, packing, sampling.
  *
  * All three are the per-document / windowed shapes that dominate corpus
  * preparation: chunking is a per-row explode (no shuffle), packing is one
  * sort-once window pass, sampling is a stateless hash filter — each
  * embarrassingly parallel at 100 TB.
  */
object Curation {

  private val chunkTokens = 100
  private val stride = 80 // 20-token overlap

  /** Split documents into fixed-token-window chunks with overlap. The chunk
    * starts are a per-row generated sequence → explode; chunk text is a
    * slice of the token array. Purely map-side.
    */
  def textChunking(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = split(lower(trim($"text")), " +")
    Tables.documents(spark, dir)
      .select($"doc_id", w.as("w"))
      .select($"doc_id", $"w",
        posexplode(sequence(lit(1), greatest(size($"w") - (chunkTokens - stride), lit(1)), lit(stride))))
      .select(
        $"doc_id",
        $"pos".cast("long").as("chunk_seq"),
        $"col".cast("long").as("token_start"),
        size(slice($"w", $"col", lit(chunkTokens))).cast("long").as("chunk_tokens"),
        md5(concat_ws(" ", slice($"w", $"col", lit(chunkTokens)))).as("chunk_md5"))
      .orderBy($"doc_id", $"chunk_seq")
  }

  val textChunkingSql: String =
    s"""WITH t AS (
       |  SELECT doc_id, string_split_regex(lower(trim(text)), ' +') AS w FROM documents
       |), starts AS (
       |  SELECT doc_id, w, u AS token_start,
       |    row_number() OVER (PARTITION BY doc_id ORDER BY u) - 1 AS chunk_seq
       |  FROM t, UNNEST(range(1, greatest(len(w) - ${chunkTokens - stride}, 1) + 1, $stride)) AS r(u)
       |)
       |SELECT doc_id, CAST(chunk_seq AS BIGINT) AS chunk_seq,
       |  CAST(token_start AS BIGINT) AS token_start,
       |  CAST(len(list_slice(w, token_start, token_start + ${chunkTokens - 1})) AS BIGINT) AS chunk_tokens,
       |  md5(array_to_string(list_slice(w, token_start, token_start + ${chunkTokens - 1}), ' ')) AS chunk_md5
       |FROM starts
       |ORDER BY doc_id, chunk_seq""".stripMargin

  /** Greedy sequence packing: documents in doc_id order are packed into
    * 2048-token context windows by a running token count.
    *
    * The global prefix sum is computed as a distributed two-level scan —
    * never a single-partition window over the corpus:
    *   1. shard documents by `doc_id div shardDocs` (order-preserving);
    *   2. per-shard token totals (one partial-agg shuffle of #shards rows);
    *   3. exclusive cumulative offsets over the tiny shard-totals table;
    *   4. broadcast the offsets back and run the running sum per shard
    *      (Window.partitionBy(shard) — fully parallel).
    * The result is the exact global running total for ANY shard size, so
    * `shardDocs` is purely an execution knob: 128 exercises multiple shards
    * at test scale; at 100 TB set it so #shards stays small (e.g. 1M docs
    * per shard) or recurse the same two-level scan over the offsets table.
    */
  def textPacking(spark: SparkSession, dir: String): DataFrame =
    textPackingSharded(spark, dir, shardDocs = 128L)

  def textPackingSharded(spark: SparkSession, dir: String, shardDocs: Long): DataFrame = {
    import spark.implicits._
    val toks = Tables.documents(spark, dir)
      .select($"doc_id", size(split(lower(trim($"text")), " +")).cast("long").as("n_tokens"))
      .withColumn("shard", ($"doc_id" / shardDocs).cast("long")) // doc_id >= 0: truncation = floor
    // exclusive prefix over per-shard totals: #shards rows, not #docs.
    // partition key = pmod(shard, 1) — constant-valued but non-foldable, so
    // the optimizer keeps the spec (a literal column is folded away, turning
    // this into an "undefined partition" global window)
    val oneGroup = Window.partitionBy(pmod($"shard", lit(1))).orderBy($"shard")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = toks.groupBy($"shard")
      .agg(sum($"n_tokens").as("shard_tokens"))
      .withColumn("shard_offset", coalesce(sum($"shard_tokens").over(oneGroup), lit(0L)))
      .select($"shard", $"shard_offset")
    val perShard = Window.partitionBy($"shard").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    toks.join(broadcast(offsets), Seq("shard"))
      .withColumn("running_tokens", $"shard_offset" + sum($"n_tokens").over(perShard))
      .withColumn("bin", (($"running_tokens" - $"n_tokens") / 2048L).cast("long"))
      .withColumn("offset_in_bin", $"running_tokens" - $"n_tokens" - $"bin" * 2048L)
      .select($"doc_id", $"n_tokens", $"running_tokens", $"bin", $"offset_in_bin")
      .orderBy($"doc_id")
  }

  val textPackingSql: String =
    """WITH t AS (
      |  SELECT doc_id,
      |    CAST(len(string_split_regex(lower(trim(text)), ' +')) AS BIGINT) AS n_tokens
      |  FROM documents
      |), r AS (
      |  SELECT doc_id, n_tokens,
      |    CAST(SUM(n_tokens) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_tokens
      |  FROM t
      |)
      |SELECT doc_id, n_tokens, running_tokens,
      |  (running_tokens - n_tokens) // 2048 AS bin,
      |  running_tokens - n_tokens - ((running_tokens - n_tokens) // 2048) * 2048 AS offset_in_bin
      |FROM r
      |ORDER BY doc_id""".stripMargin

  /** Deterministic stratified sampling: ~20% per (lang, source) stratum via
    * a multiplicative hash of the key — reproducible across runs/engines
    * (no RNG), stateless, filter-only.
    */
  def sampleStratified(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bucket = pmod($"doc_id" * 2654435761L % 1000000007L, lit(100))
    Tables.documents(spark, dir)
      .withColumn("sample_bucket", bucket)
      .filter($"sample_bucket" < 20)
      .groupBy($"lang", $"source")
      .agg(count(lit(1)).as("sampled_docs"), sum($"n_chars").as("sampled_chars"))
      .orderBy($"lang", $"source")
  }

  val sampleStratifiedSql: String =
    """SELECT lang, source,
      |  COUNT(*) AS sampled_docs, CAST(SUM(n_chars) AS BIGINT) AS sampled_chars
      |FROM documents
      |WHERE ((doc_id * 2654435761) % 1000000007 % 100 + 100) % 100 < 20
      |GROUP BY lang, source
      |ORDER BY lang, source""".stripMargin


  /** Corpus vocabulary: token frequencies + document frequencies — the
    * tokenizer/BPE-training input. One explode + one groupBy: partial
    * aggregation does the heavy combining map-side, the shuffle carries
    * only distinct tokens.
    */
  def textVocab(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // top-100 via orderBy+limit → TakeOrderedAndProject (parallel partial
    // top-N, no global window); rank assigned over the ≤100 survivors only.
    // pmod(n_tokens, 1): constant-valued non-foldable partition key — the
    // window stays partition-defined and bounded by the limit.
    val top = Tables.documents(spark, dir)
      .select($"doc_id", explode(split(lower(trim($"text")), " +")).as("token"))
      .groupBy($"token")
      .agg(count(lit(1)).as("n_tokens"), countDistinct($"doc_id").as("doc_freq"))
      .orderBy($"n_tokens".desc, $"token")
      .limit(100)
    val w = Window.partitionBy(pmod($"n_tokens", lit(1))).orderBy($"n_tokens".desc, $"token")
    top.withColumn("rank", row_number().over(w))
      .orderBy($"rank")
  }

  val textVocabSql: String =
    """WITH toks AS (
      |  SELECT doc_id, u AS token
      |  FROM (SELECT doc_id, string_split_regex(lower(trim(text)), ' +') AS w FROM documents),
      |    UNNEST(w) AS r(u)
      |), vocab AS (
      |  SELECT token, COUNT(*) AS n_tokens, COUNT(DISTINCT doc_id) AS doc_freq
      |  FROM toks GROUP BY token
      |)
      |SELECT token, n_tokens, doc_freq,
      |  row_number() OVER (ORDER BY n_tokens DESC, token) AS rank
      |FROM vocab
      |ORDER BY rank
      |LIMIT 100""".stripMargin

  /** Adjacent-bigram co-occurrence counts (skip-gram window 1) — the
    * embedding-training pair stream. Bigram extraction is the native
    * codegen `functions.AdjacentBigrams` — one pass over the UTF-8 bytes
    * per row (the previous zip_with-over-shifted-slice form ran
    * interpreted and re-evaluated the regex split per use site).
    */
  def textCooccurrence(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(explode(
        graft.functions.AdjacentBigrams.adjacent_bigrams(lower(trim($"text")))).as("bigram"))
      .groupBy($"bigram")
      .agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"bigram")
      .limit(50) // TakeOrderedAndProject: parallel partial top-N
      .withColumn("rank", row_number().over(
        Window.partitionBy(pmod($"n", lit(1))).orderBy($"n".desc, $"bigram")))
      .orderBy($"rank")
  }

  val textCooccurrenceSql: String =
    """WITH t AS (
      |  SELECT string_split_regex(lower(trim(text)), ' +') AS w FROM documents
      |), bi AS (
      |  SELECT w[u] || ' ' || w[u+1] AS bigram
      |  FROM t, UNNEST(range(1, len(w))) AS r(u)
      |), counted AS (
      |  SELECT bigram, COUNT(*) AS n FROM bi GROUP BY bigram
      |)
      |SELECT bigram, n, row_number() OVER (ORDER BY n DESC, bigram) AS rank
      |FROM counted
      |ORDER BY rank
      |LIMIT 50""".stripMargin

  /** Repetition-based quality filter (Gopher-style rules): per-doc
    * top-token fraction, top-adjacent-bigram fraction and unique-token
    * fraction, cascaded into a first-matching-rule verdict. The document
    * axis is the partition key throughout — two explode→partial-agg passes
    * (tokens, bigrams) and one doc-keyed join, so the shape scales with
    * corpus size, no global state. Thresholds sit inside the testdata
    * metric distributions so every branch is exercised (spec-pinned).
    */
  def textRepetitionFilter(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    val tokAgg = docs
      .select($"doc_id", explode(split(lower(trim($"text")), " +")).as("token"))
      .groupBy($"doc_id", $"token").agg(count(lit(1)).as("c"))
      .groupBy($"doc_id")
      .agg(sum($"c").as("n_tokens"), max($"c").as("top_cnt"), count(lit(1)).as("n_unique"))
    val biAgg = docs
      .select($"doc_id", explode(
        graft.functions.AdjacentBigrams.adjacent_bigrams(lower(trim($"text")))).as("bigram"))
      .groupBy($"doc_id", $"bigram").agg(count(lit(1)).as("c"))
      .groupBy($"doc_id").agg(sum($"c").as("n_bigrams"), max($"c").as("top_bi"))
    tokAgg.join(biAgg, Seq("doc_id"), "left")
      .select($"doc_id", $"n_tokens", $"n_unique",
        ($"top_cnt".cast("double") / $"n_tokens".cast("double")).as("top_token_frac"),
        coalesce($"top_bi".cast("double") / $"n_bigrams".cast("double"), lit(0.0))
          .as("top_bigram_frac"),
        ($"n_unique".cast("double") / $"n_tokens".cast("double")).as("unique_frac"))
      .withColumn("verdict",
        when($"top_token_frac" > 0.12, lit("repeated_token"))
          .when($"top_bigram_frac" > 0.08, lit("repeated_bigram"))
          .when($"unique_frac" < 0.35, lit("low_diversity"))
          .otherwise(lit("keep")))
      .orderBy($"doc_id")
  }

  val textRepetitionFilterSql: String =
    """WITH toks AS (
      |  SELECT doc_id, u AS token
      |  FROM (SELECT doc_id, string_split_regex(lower(trim(text)), ' +') AS w FROM documents),
      |    UNNEST(w) AS r(u)
      |), tc AS (
      |  SELECT doc_id, token, COUNT(*) AS c FROM toks GROUP BY 1, 2
      |), ta AS (
      |  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens, MAX(c) AS top_cnt,
      |    CAST(COUNT(*) AS BIGINT) AS n_unique
      |  FROM tc GROUP BY 1
      |), t2 AS (
      |  SELECT doc_id, string_split_regex(lower(trim(text)), ' +') AS w FROM documents
      |), bi AS (
      |  SELECT doc_id, w[u] || ' ' || w[u+1] AS bigram
      |  FROM t2, UNNEST(range(1, len(w))) AS r(u)
      |), bc AS (
      |  SELECT doc_id, bigram, COUNT(*) AS c FROM bi GROUP BY 1, 2
      |), ba AS (
      |  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams, MAX(c) AS top_bi FROM bc GROUP BY 1
      |), m AS (
      |  SELECT ta.doc_id, n_tokens, n_unique,
      |    CAST(top_cnt AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS top_token_frac,
      |    COALESCE(CAST(top_bi AS DOUBLE) / CAST(n_bigrams AS DOUBLE), 0.0) AS top_bigram_frac,
      |    CAST(n_unique AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS unique_frac
      |  FROM ta LEFT JOIN ba ON ta.doc_id = ba.doc_id
      |)
      |SELECT doc_id, n_tokens, n_unique, top_token_frac, top_bigram_frac, unique_frac,
      |  CASE WHEN top_token_frac > 0.12 THEN 'repeated_token'
      |       WHEN top_bigram_frac > 0.08 THEN 'repeated_bigram'
      |       WHEN unique_frac < 0.35 THEN 'low_diversity'
      |       ELSE 'keep' END AS verdict
      |FROM m
      |ORDER BY doc_id""".stripMargin

  /** Deterministic training-shard assignment — the OUTPUT side of the
    * pipeline: the curated corpus lands in `shards` fixed buckets in
    * pseudo-random order, so a trainer reading shard files sequentially
    * sees a reproducible global shuffle with no shuffle step of its own.
    *
    * Both keys are Knuth/xxhash-style multiplicative hashes mod 2³²
    * (portable integer arithmetic, so the assignment is oracle-exact
    * across engines; doc_id · PRIME stays far below 2⁶³ for ids < 2³¹ —
    * same documented bound as etl_retry_quarantine's outcome hash, and at
    * web scale you'd swap in xxhash64 exactly like split_train_holdout).
    * Different primes decorrelate the shard choice from the within-shard
    * order. Everything is map-side; the output `ORDER BY shard, order_key`
    * mirrors the writer's exchange-on-shard + sort-within-partitions plan
    * ([[writeShards]]). No per-shard row_number is materialized — with
    * thousands of shards at real scale that would be one sequential pass
    * per shard; a doc's position is implicit in the sorted file order.
    *
    * The entry's trailing global ORDER BY is ORACLE GATE ONLY (pinned row
    * order for the driver's hash). The production path never runs it:
    * [[writeShards]] exchanges on shard and sorts WITHIN partitions —
    * the global sort here exists because the gate returns the manifest
    * as one DataFrame.
    */
  def corpusShard(spark: SparkSession, dir: String, shards: Int = 16): DataFrame = {
    import spark.implicits._
    withShardKeys(Tables.documents(spark, dir).select($"doc_id", $"lang", $"n_chars"), shards)
      .select($"shard", $"order_key", $"doc_id", $"lang", $"n_chars")
      .orderBy($"shard", $"order_key", $"doc_id")
  }

  /** The ONE definition of the shard assignment + within-shard order keys,
    * shared by the manifest ([[corpusShard]]), the batch writer
    * ([[writeShards]]), and the streaming writer
    * ([[graft.streaming.CorpusStream.shardSink]]) — a doc lands in the
    * same shard at the same position whether it arrives in a backfill or
    * on the stream.
    */
  private[graft] def withShardKeys(docs: DataFrame, shards: Int): DataFrame = {
    import docs.sparkSession.implicits._
    docs
      .withColumn("order_key", ($"doc_id" * 2654435761L) % 4294967296L)
      .withColumn("shard", ((($"doc_id" * 2246822519L) % 4294967296L) % shards).cast("long"))
  }

  val corpusShardSql: String =
    """SELECT CAST(((doc_id * 2246822519) % 4294967296) % 16 AS BIGINT) AS shard,
      |  (doc_id * 2654435761) % 4294967296 AS order_key,
      |  doc_id, lang, n_chars
      |FROM documents
      |ORDER BY shard, order_key, doc_id""".stripMargin

  /** Deterministic WEIGHTED sampling without replacement, k per stratum —
    * Efraimidis–Spirakis (2006): each doc draws u ∈ (0,1) and competes
    * with key u^(1/w); the top-k keys per stratum are exactly a weighted
    * sample without replacement. Here w = n_chars (longer docs
    * proportionally likelier — the usual byte-budget sampling), u is the
    * portable multiplicative hash of (doc_id, crc32(source)) — a pure
    * function of the corpus, reproducible across runs and engines. The
    * stratum salt matters for composition: an unsalted u(doc_id) would
    * give the same doc the same race draw in every stratum it appears
    * in, correlating per-stratum samples that should be independent.
    *
    * Scale shape: u and the key are map-side; the per-stratum top-k runs
    * through the bounded-heap [[graft.functions.PartialTopK]] aggregate,
    * so each map task forwards ≤ k rows per stratum — the exchange
    * carries strata×k rows, never the corpus. Rows-only (the key is
    * Math.pow — selection near the k-th threshold could differ between
    * engines in the last ulp), pinned instead by OpsSpec against a
    * single-threaded reference implementation of the same race, which is
    * JVM-exact.
    */
  def sampleWeighted(spark: SparkSession, dir: String, k: Int = 20): DataFrame = {
    import spark.implicits._
    import graft.functions.PartialTopK.partial_topk
    Tables.documents(spark, dir)
      .select($"source", $"doc_id", $"n_chars")
      .withColumn("u",
        ((($"doc_id" * 2654435761L + crc32($"source".cast("binary"))) % 4294967296L) + 1L)
          .cast("double") / 4294967297.0)
      .withColumn("es_key", pow($"u", lit(1.0) / $"n_chars".cast("double")))
      .groupBy($"source")
      .agg(partial_topk(
        struct((-$"es_key").as("neg_key"), $"doc_id".as("doc_id"), $"n_chars".as("weight")),
        k).as("s"))
      .select($"source", posexplode($"s").as(Seq("pos", "r")))
      .select($"source", ($"pos" + 1).cast("int").as("rank"),
        $"r.doc_id".as("doc_id"), $"r.weight".as("weight"),
        (-$"r.neg_key").as("es_key"))
      .orderBy($"source", $"rank")
  }

  /** The physical writer for [[corpusShard]]: one exchange on the shard
    * key, sort within partitions by the order key, one file per shard
    * (`partitionBy` keeps shard a directory key so a trainer can address
    * shards individually). Re-running over the same corpus produces
    * byte-identical shard contents — OpsSpec pins determinism and
    * read-back parity with the manifest.
    */
  def writeShards(docs: DataFrame, path: String, shards: Int = 16): Unit = {
    import docs.sparkSession.implicits._
    withShardKeys(docs.select($"doc_id", $"lang", $"text"), shards)
      .repartition(shards, $"shard")
      .sortWithinPartitions($"shard", $"order_key", $"doc_id")
      .write.mode("overwrite").partitionBy("shard").parquet(path)
  }

  /** Length-based curriculum phases — the "short sequences first"
    * training schedule: every document gets its GLOBAL rank under
    * (score = n_chars, doc_id) and an NTILE(4) epoch assignment, without
    * ever planning a global single-task sort of the corpus.
    *
    * The global rank is the two-level bucketed selection the repo uses
    * for agg_median_exact / text_packing: docs land in one of 32
    * order-preserving doc_id range-shards; per-(score, shard) counts
    * aggregate (bounded: distinct-scores × 32 rows); the exclusive
    * running offset runs over that AGGREGATED table (the accepted
    * window-over-aggregate shape); offsets broadcast back and the
    * within-(score, shard) row_number closes the rank. No task ranks
    * more than one shard of one score group. The NTILE epoch is then
    * pure arithmetic on the rank (⌈n/T⌉-sized leading tiles — the
    * standard SQL semantics, matched exactly by the oracle's NTILE), so
    * the whole assignment is integer-exact and oracle hash-exact.
    */
  def sampleCurriculum(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val tiles = 4; val shards = 32
    val docs = Tables.documents(spark, dir)
      .select($"doc_id", $"n_chars".cast("long").as("score"))
    val bounds = docs.agg(max($"doc_id").as("max_id"), count(lit(1)).as("n"))
    val sharded = docs.crossJoin(broadcast(bounds))
      .withColumn("shard", ($"doc_id" * shards / ($"max_id" + 1)).cast("long"))
    val cnt = sharded.groupBy($"score", $"shard").agg(count(lit(1)).as("c"))
    // exclusive prefix over the AGGREGATED (score, shard) table — bounded
    // rows; partition key pmod(shard, 1) is constant but non-foldable so
    // the spec survives the optimizer (the textPackingSharded device)
    val wOff = Window.partitionBy(pmod($"shard", lit(1))).orderBy($"score", $"shard")
      .rowsBetween(Window.unboundedPreceding, -1)
    val off = cnt.withColumn("off", coalesce(sum($"c").over(wOff), lit(0L)))
      .select($"score", $"shard", $"off")
    val wr = Window.partitionBy($"score", $"shard").orderBy($"doc_id")
    sharded.join(broadcast(off), Seq("score", "shard"))
      .withColumn("global_rank", ($"off" + row_number().over(wr)).cast("long"))
      .withColumn("k", expr(s"n DIV $tiles"))
      .withColumn("m", $"n" % tiles)
      .withColumn("epoch",
        when($"k" === 0, $"global_rank")
          .when($"global_rank" <= ($"k" + 1) * $"m",
            expr("(global_rank - 1) DIV (k + 1) + 1"))
          .otherwise(expr("m + (global_rank - 1 - (k + 1) * m) DIV k + 1")))
      .select($"doc_id", $"score", $"global_rank", $"epoch".cast("long").as("epoch"))
      .orderBy($"doc_id")
  }

  val sampleCurriculumSql: String =
    """SELECT doc_id, CAST(n_chars AS BIGINT) AS score,
      |  CAST(ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) AS BIGINT) AS global_rank,
      |  CAST(NTILE(4) OVER (ORDER BY n_chars, doc_id) AS BIGINT) AS epoch
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  /** k-center (farthest-point-first) diverse sampling — facility-location
    * curation: pick k corpus vectors so every vector is close to some pick
    * (the classic 2-approximation to the k-center optimum, and the
    * standard diverse-seed / coreset selector for embedding-space data
    * pruning). Greedy: seed with the min vec_id, then k−1 rounds of "take
    * the vector farthest from everything picked so far" (max min-distance,
    * min-id tie-break — fully deterministic, no RNG).
    *
    * Distributed shape: the picked set lives on the driver (≤ k·d longs —
    * the k-means bounded-model-pull contract) and enters each round as
    * plan literals; a round is ONE map-side pass computing every vector's
    * min distance to the picks (k fused integer dot products via
    * LongVectorDot) + a (dist, vec_id) max-aggregate — no shuffle of
    * corpus rows, ever; k rounds total, like Lloyd. At 100 TB you run it
    * on the IVF-cell centroid table or a uniform pre-sample rather than
    * raw rows — composition, not a new operator.
    *
    * Output: (rank, vec_id, d2_at_pick) — d2_at_pick is the squared
    * distance to the nearest EARLIER pick (the coverage radius sequence;
    * non-increasing is the greedy invariant KcenterSpec re-derives
    * driver-side). HASH-GATED since r11-cont: distances are exact
    * integers (nrm_a + nrm_b − 2·dot on the ×1000 grid), so the greedy
    * trace unrolls into k−1 MATERIALIZED DuckDB rounds
    * ([[sampleKcenterSql]] — the kcore-oracle unrolling device applied
    * to a sequential-by-definition greedy).
    */
  def sampleKcenter(spark: SparkSession, dir: String, k: Int = 12): DataFrame = {
    import spark.implicits._
    import graft.functions.LongVectorDot.vector_dot
    val q = VectorAgg.quantized(spark, dir)
      .withColumn("nrm", vector_dot($"v", $"v"))
      .localCheckpoint() // quantize once, not once per round
    val first = q.orderBy($"vec_id").select($"vec_id", $"v").head()
    var picks = Vector[(Long, Array[Long], Long)](
      (first.getLong(0), first.getSeq[Long](1).toArray, 0L))
    (2 to k).foreach { _ =>
      // min distance to the current picks: k literal-array dots, map-side
      val minD = picks.map { case (_, pv, _) =>
        val pl = typedLit(pv.toSeq)
        $"nrm" + lit(pv.map(x => x * x).sum) - lit(2L) * vector_dot($"v", pl)
      }.reduce((a, b) => least(a, b))
      val next = q
        .select($"vec_id", $"v", minD.as("d2"))
        .filter(!$"vec_id".isInCollection(picks.map(_._1)))
        .orderBy($"d2".desc, $"vec_id".asc)
        .head()
      picks = picks :+ ((next.getLong(0), next.getSeq[Long](1).toArray, next.getLong(2)))
    }
    picks.zipWithIndex
      .map { case ((id, _, d2), i) => (i + 1, id, d2) }
      .toDF("rank", "vec_id", "d2_at_pick")
      .orderBy($"rank")
  }

  /** §2 entry `sample_reservoir`: uniform k-row sampling WITHOUT a full
    * sort or a sequential reservoir — bottom-k by hash priority (each row
    * gets priority xxhash64(doc_id, seed); the sample is the k smallest),
    * the distributed equivalent of reservoir sampling: TakeOrdered keeps
    * k rows per partition map-side, the exchange carries ≤ k·partitions
    * rows, and the result is (a) uniform over the hash's permutation of
    * rows, (b) DETERMINISTIC given (corpus, seed, k) under any
    * partitioning — a re-run or a speculative retry draws the identical
    * sample, which `rand()`-based sampling cannot promise — and
    * (c) MERGEABLE: bottomK(A ∪ B) = bottomK(bottomK(A) ∪ bottomK(B)),
    * so per-shard samples compose (spec-pinned). Rows-only (no xxhash64
    * in DuckDB); OpsSpec pins size, determinism, seed-sensitivity, and
    * the merge law.
    */
  def sampleReservoir(spark: SparkSession, dir: String, k: Int = 100, seed: Long = 42L): DataFrame =
    sampleReservoirOn(Tables.documents(spark, dir), k, seed)

  private[graft] def sampleReservoirOn(docs: DataFrame, k: Int, seed: Long): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select($"doc_id", $"lang",
        xxhash64($"doc_id", lit(seed)).as("priority"))
      .orderBy($"priority", $"doc_id")
      .limit(k)
  }

  /** NEYMAN-allocation stratified sampling — the statistically optimal
    * budget split (n_h ∝ N_h·σ_h: big variable strata get more of the
    * sample; uniform-rate stratification wastes budget on homogeneous
    * strata): per-stratum σ from ONE exact sufficient-statistics pass
    * (the events_value_corr discipline — decimal sums, fixed IEEE
    * tree), allocations floor(budget·share) from the broadcast totals
    * row, then the sample itself is the DETERMINISTIC Knuth-hash rank
    * within each stratum (the sample_stratified device, made exact-n
    * by a per-stratum rank) — so both engines select the IDENTICAL
    * rows and the verification sums hash-match. The per-type rank
    * window composes to the two-level rank at a scale where one
    * stratum outgrows a task (the user_rfm_segments contract).
    */
  def sampleNeyman(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val budget = 1000L
    val ev = Tables.events(spark, dir)
      .select($"event_type", $"event_id", $"value".cast("decimal(10,2)").as("y"))
    val stats = ev.groupBy($"event_type").agg(
      count(lit(1)).as("n_h"),
      sum($"y").cast("double").as("sy"),
      sum($"y" * $"y").cast("double").as("syy"))
      .withColumn("sigma",
        sqrt(($"n_h".cast("double") * $"syy" - $"sy" * $"sy") /
          ($"n_h".cast("double") * ($"n_h".cast("double") - 1.0))))
      .withColumn("weight", $"n_h".cast("double") * $"sigma")
    val tot = stats.agg(sum($"weight").as("w_total"))
    val alloc = stats.crossJoin(broadcast(tot))
      .withColumn("alloc_n", floor(lit(budget.toDouble) * $"weight" / $"w_total").cast("long"))
      .select($"event_type", $"n_h", $"sigma", $"alloc_n")
    val ranked = ev
      .withColumn("hb", pmod($"event_id" * 2654435761L % 1000000007L, lit(1000000)))
      .withColumn("rnk", row_number().over(
        Window.partitionBy($"event_type").orderBy($"hb", $"event_id")).cast("long"))
    ranked.join(broadcast(alloc), Seq("event_type"))
      .filter($"rnk" <= $"alloc_n")
      .groupBy($"event_type")
      .agg(count(lit(1)).as("sampled_rows"),
        sum($"y").cast("double").as("sampled_value_sum"))
      .join(broadcast(alloc), Seq("event_type"))
      .select($"event_type", $"n_h", $"sigma", $"alloc_n",
        $"sampled_rows", $"sampled_value_sum")
      .orderBy($"event_type")
  }

  val sampleNeymanSql: String =
    """WITH ev AS (
      |  SELECT event_type, event_id, CAST(value AS DECIMAL(10,2)) AS y FROM events
      |), stats AS (
      |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_h,
      |    CAST(SUM(y) AS DOUBLE) AS sy, CAST(SUM(y * y) AS DOUBLE) AS syy
      |  FROM ev GROUP BY event_type
      |), sig AS (
      |  SELECT event_type, n_h,
      |    sqrt((CAST(n_h AS DOUBLE) * syy - sy * sy)
      |      / (CAST(n_h AS DOUBLE) * (CAST(n_h AS DOUBLE) - 1.0))) AS sigma
      |  FROM stats
      |), alloc AS (
      |  SELECT event_type, n_h, sigma,
      |    CAST(floor(1000.0 * (CAST(n_h AS DOUBLE) * sigma)
      |      / (SELECT SUM(CAST(n_h AS DOUBLE) * sigma) FROM sig)) AS BIGINT) AS alloc_n
      |  FROM sig
      |), ranked AS (
      |  SELECT event_type, y,
      |    row_number() OVER (PARTITION BY event_type
      |      ORDER BY ((event_id * 2654435761) % 1000000007 % 1000000 + 1000000) % 1000000, event_id)
      |      AS rnk
      |  FROM ev
      |)
      |SELECT r.event_type, n_h, sigma, alloc_n,
      |  CAST(COUNT(*) AS BIGINT) AS sampled_rows,
      |  CAST(SUM(y) AS DOUBLE) AS sampled_value_sum
      |FROM ranked r JOIN alloc a ON r.event_type = a.event_type
      |WHERE rnk <= alloc_n
      |GROUP BY r.event_type, n_h, sigma, alloc_n
      |ORDER BY r.event_type""".stripMargin

  /** §2 entry `sample_token_budget` (round 10): TOKEN-BUDGET mixture
    * sampling — "take up to B tokens per source", the practical knob in
    * LLM data mixing (domain-mix rebalances DOC counts by a temperature;
    * training budgets are set in TOKENS). Per source, docs are ordered
    * by the deterministic Knuth hash (then doc_id — no RNG, reproducible
    * across engines and runs) and kept while the INCLUSIVE running token
    * total stays ≤ B — a greedy prefix cap, not a knapsack (a doc that
    * would cross the budget ends the source's intake; documented, not
    * hidden).
    *
    * Scale shape — the [[textPacking]] two-level prefix-sum discipline,
    * per source: the hash order is decomposed into contiguous hash-range
    * shards, per-(source, shard) token totals (≤ sources×shards rows)
    * take an exclusive prefix on the bounded offsets table, and the
    * within-shard running sum windows over (source, shard) partitions —
    * bounded by the shard width, never the corpus. The budget then
    * PRUNES: any shard whose offset already meets B cannot contribute a
    * kept row (cum ≥ offset + 1), so the corpus-wide window work
    * collapses to the shards that can still fit — O(budget) rows at any
    * corpus size, after one map-side totals pass.
    */
  def sampleTokenBudget(spark: SparkSession, dir: String): DataFrame =
    sampleTokenBudgetOn(Tables.documents(spark, dir), budget = 1000L)

  private[graft] def sampleTokenBudgetOn(docs: DataFrame, budget: Long,
      hashShardWidth: Long = 1L << 23): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val t = docs
      .select($"source", $"doc_id",
        size(split(lower(trim($"text")), " +")).cast("long").as("n_tokens"))
      .withColumn("h", $"doc_id" * 2654435761L % 1000000007L)
      .withColumn("hshard", ($"h" / hashShardWidth).cast("long"))
    // exclusive prefix over per-(source, shard) totals — bounded rows;
    // pmod keeps the per-source spec non-foldable (the textPacking trick)
    val oneGroup = Window.partitionBy($"source", pmod($"hshard", lit(1)))
      .orderBy($"hshard")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = t.groupBy($"source", $"hshard")
      .agg(sum($"n_tokens").as("shard_tokens"))
      .withColumn("shard_offset", coalesce(sum($"shard_tokens").over(oneGroup), lit(0L)))
      .select($"source", $"hshard", $"shard_offset")
    val perShard = Window.partitionBy($"source", $"hshard")
      .orderBy($"h", $"doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t.join(broadcast(offsets), Seq("source", "hshard"))
      .filter($"shard_offset" < budget) // budget prune: cum ≥ offset + 1 past here
      .withColumn("cum_tokens", $"shard_offset" + sum($"n_tokens").over(perShard))
      .filter($"cum_tokens" <= budget)
      .select($"source", $"doc_id", $"n_tokens", $"cum_tokens")
      .orderBy($"source", $"cum_tokens")
  }

  val sampleTokenBudgetSql: String =
    """WITH t AS (
      |  SELECT source, doc_id,
      |    CAST(len(string_split_regex(lower(trim(text)), ' +')) AS BIGINT) AS n_tokens,
      |    (doc_id * 2654435761) % 1000000007 AS h
      |  FROM documents
      |), r AS (
      |  SELECT source, doc_id, n_tokens,
      |    CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
      |  FROM t
      |)
      |SELECT source, doc_id, n_tokens, cum_tokens
      |FROM r WHERE cum_tokens <= 1000
      |ORDER BY source, cum_tokens""".stripMargin

  /** §2 `sample_temperature`: temperature-scaled mixture sampling — the
    * T5/mT5 mixing rule p_s ∝ n_s^α with α = 1/2: big sources are
    * downweighted toward the root of their size, so a 100× larger
    * source gets only 10× the budget (uniform mixing starves small
    * domains; proportional mixing drowns them — α ∈ (0,1) is the dial,
    * and 1/2 is the published default). Completes the mixing-family
    * triptych: domain-mix (inverse-size thresholds), Neyman
    * (σ-allocation), temperature (power law).
    *
    * Exactness: n_s^(1/2) is ONE IEEE sqrt per source, immediately
    * floored to an integer at 10⁶ scale — so the weight SUM is an exact
    * BIGINT (summing raw sqrt doubles would be float-order-dependent
    * across engines), and each allocation is `budget·w_s div W` integer
    * division. Selection inside each source is the deterministic
    * Knuth-hash rank (the sample_stratified device) cut at the
    * allocation, so both engines pick the IDENTICAL documents and the
    * verification sums hash-match. One groupBy for counts (broadcast
    * dim), one per-source rank window (composes to the two-level rank at
    * a scale where one source outgrows a task — the user_rfm contract).
    */
  def sampleTemperature(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val budget = 1000L
    val docs = Tables.documents(spark, dir).select($"doc_id", $"source", $"n_chars")
    val counts = docs.groupBy($"source").agg(count(lit(1)).as("n_docs"))
      .withColumn("weight_scaled",
        floor(sqrt($"n_docs".cast("double")) * 1000000.0).cast("long"))
    val tot = counts.agg(sum($"weight_scaled").as("w_total"))
    val alloc = counts.crossJoin(broadcast(tot))
      .withColumn("alloc_n", expr(s"($budget * weight_scaled) div w_total"))
      .select($"source", $"n_docs", $"weight_scaled", $"alloc_n")
    val ranked = docs
      .withColumn("h", $"doc_id" * 2654435761L % 1000000007L)
      .withColumn("r", row_number().over(
        Window.partitionBy($"source").orderBy($"h", $"doc_id")))
    val sampled = ranked.join(broadcast(alloc.select($"source", $"alloc_n")), Seq("source"))
      .filter($"r" <= $"alloc_n")
      .groupBy($"source")
      .agg(count(lit(1)).as("sampled_docs"), sum($"n_chars").as("sampled_chars"))
    alloc.join(sampled, Seq("source"), "left")
      .na.fill(0L, Seq("sampled_docs", "sampled_chars"))
      .select($"source", $"n_docs", $"weight_scaled", $"alloc_n",
        $"sampled_docs", $"sampled_chars")
      .orderBy($"source")
  }

  val sampleTemperatureSql: String =
    """WITH counts AS (
      |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |    CAST(floor(sqrt(CAST(COUNT(*) AS DOUBLE)) * 1000000.0) AS BIGINT) AS weight_scaled
      |  FROM documents GROUP BY source
      |), tot AS (SELECT CAST(SUM(weight_scaled) AS BIGINT) AS w_total FROM counts),
      |alloc AS (
      |  SELECT source, n_docs, weight_scaled,
      |    (1000 * weight_scaled) // w_total AS alloc_n
      |  FROM counts CROSS JOIN tot
      |), ranked AS (
      |  SELECT source, doc_id, n_chars,
      |    row_number() OVER (PARTITION BY source
      |      ORDER BY (doc_id * 2654435761) % 1000000007, doc_id) AS r
      |  FROM documents
      |), sampled AS (
      |  SELECT ranked.source, CAST(COUNT(*) AS BIGINT) AS sampled_docs,
      |    CAST(SUM(n_chars) AS BIGINT) AS sampled_chars
      |  FROM ranked JOIN alloc ON ranked.source = alloc.source
      |  WHERE r <= alloc_n
      |  GROUP BY ranked.source
      |)
      |SELECT alloc.source, n_docs, weight_scaled, CAST(alloc_n AS BIGINT) AS alloc_n,
      |  COALESCE(sampled_docs, 0) AS sampled_docs,
      |  COALESCE(sampled_chars, 0) AS sampled_chars
      |FROM alloc LEFT JOIN sampled ON alloc.source = sampled.source
      |ORDER BY alloc.source""".stripMargin

  /** §2 `sample_importance`: DSIR-shaped importance selection (Xie et
    * al. 2023, "Data Selection for Language Models via Importance
    * Resampling") — pick from the raw pool the documents whose
    * hashed-feature distribution looks most like a TARGET domain. Target
    * here: the `en` slice; features: unigram document frequencies (the
    * paper's hashed n-grams, with the corpus vocabulary standing in for
    * the hash buckets at test scale — at web scale the token join key
    * becomes `xxhash64(token) % 2^20` with no other change).
    *
    * The paper's per-feature weight is log((tgt_f+1)/(raw_f+1)); exact
    * cross-engine logs don't exist, so the documented surrogate is the
    * INTEGER-SCALED ratio `(tgt_df+1)·10⁶ div (raw_df+1)` — order-
    * equivalent to the likelihood ratio feature-wise, summed exactly as
    * BIGINTs (never a float sum). A doc's score is the ratio sum over
    * its token OCCURRENCES, length-normalized by integer division into
    * `avg_ratio` so long documents don't win by volume alone. Top-100 by
    * (avg_ratio desc, doc_id) — orderBy+limit TakeOrdered, rank window
    * over the survivors only.
    *
    * Scale shape: two groupBys on token (map-side combine; vocab-bounded
    * shuffle), one token-keyed join of the exploded stream against the
    * ratio dim (the tf-idf join shape), one per-doc aggregate. No
    * windows over the corpus, no driver pulls.
    */
  def sampleImportance(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    val toks = docs.select($"doc_id", $"lang",
      explode(split(lower(trim($"text")), " +")).as("token"))
    val rawDf = toks.groupBy($"token").agg(countDistinct($"doc_id").as("raw_df"))
    val tgtDf = toks.filter($"lang" === "en")
      .groupBy($"token").agg(countDistinct($"doc_id").as("tgt_df"))
    val ratio = rawDf.join(tgtDf, Seq("token"), "left")
      .na.fill(0L, Seq("tgt_df"))
      .withColumn("ratio_scaled", expr("((tgt_df + 1) * 1000000) div (raw_df + 1)"))
      .select($"token", $"ratio_scaled")
    val scored = toks.join(ratio, Seq("token"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum($"ratio_scaled").as("sum_ratio"))
      .withColumn("avg_ratio", expr("sum_ratio div n_tokens"))
    val top = scored
      .join(docs.select($"doc_id", $"lang", $"source"), Seq("doc_id"))
      .orderBy($"avg_ratio".desc, $"doc_id")
      .limit(100)
    top.withColumn("rank", row_number().over(
        Window.partitionBy(pmod($"n_tokens", lit(1)))
          .orderBy($"avg_ratio".desc, $"doc_id")).cast("long"))
      .select($"doc_id", $"lang", $"source", $"n_tokens", $"sum_ratio",
        $"avg_ratio", $"rank")
      .orderBy($"rank")
  }

  val sampleImportanceSql: String =
    """WITH toks AS (
      |  SELECT doc_id, lang, u AS token
      |  FROM (SELECT doc_id, lang, string_split_regex(lower(trim(text)), ' +') AS w FROM documents),
      |    UNNEST(w) AS r(u)
      |), raw_df AS (
      |  SELECT token, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS raw_df FROM toks GROUP BY token
      |), tgt_df AS (
      |  SELECT token, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS tgt_df
      |  FROM toks WHERE lang = 'en' GROUP BY token
      |), ratio AS (
      |  SELECT r.token,
      |    ((COALESCE(tgt_df, 0) + 1) * 1000000) // (raw_df + 1) AS ratio_scaled
      |  FROM raw_df r LEFT JOIN tgt_df t ON r.token = t.token
      |), scored AS (
      |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
      |    CAST(SUM(ratio_scaled) AS BIGINT) AS sum_ratio
      |  FROM toks JOIN ratio ON toks.token = ratio.token
      |  GROUP BY doc_id
      |), avg_scored AS (
      |  SELECT doc_id, n_tokens, sum_ratio,
      |    CAST(sum_ratio // n_tokens AS BIGINT) AS avg_ratio
      |  FROM scored
      |), top AS (
      |  SELECT s.doc_id, d.lang, d.source, s.n_tokens, s.sum_ratio, s.avg_ratio,
      |    row_number() OVER (ORDER BY s.avg_ratio DESC, s.doc_id) AS rank
      |  FROM avg_scored s JOIN documents d ON s.doc_id = d.doc_id
      |  ORDER BY s.avg_ratio DESC, s.doc_id
      |  LIMIT 100
      |)
      |SELECT doc_id, lang, source, n_tokens, sum_ratio, avg_ratio,
      |  CAST(rank AS BIGINT) AS rank
      |FROM top ORDER BY rank""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sample_temperature" -> (sampleTemperature _),
    "sample_importance" -> (sampleImportance _),
    "sample_token_budget" -> (sampleTokenBudget _),
    "sample_neyman" -> (sampleNeyman _),
    "sample_reservoir"  -> ((s, d) => sampleReservoir(s, d)),
    "sample_kcenter"    -> ((s, d) => sampleKcenter(s, d)),
    "sample_curriculum" -> (sampleCurriculum _),
    "corpus_shard"      -> ((s, d) => corpusShard(s, d)),
    "sample_weighted"   -> ((s, d) => sampleWeighted(s, d)),
    "text_chunking"     -> (textChunking _),
    "text_packing"      -> (textPacking _),
    "sample_stratified" -> (sampleStratified _),
    "text_vocab"        -> (textVocab _),
    "text_cooccurrence" -> (textCooccurrence _),
    "text_repetition_filter" -> (textRepetitionFilter _)
  )

  /** Oracle for `sample_kcenter` — the greedy is sequential but every
    * round is a deterministic integer argmax, so it unrolls: round i
    * materializes the running min-distance table m(i−1), picks the
    * (d2 DESC, vec_id ASC) top row, and folds the new pick's distances
    * in with LEAST. MATERIALIZED is load-bearing (each m is referenced
    * by the next pick and the next m — default inlining would double
    * the chain per round). k = 12 → 11 rounds; verified identical to
    * the Spark trace pick-for-pick.
    */
  val sampleKcenterSql: String = {
    val kK = 12
    def dot(a: String, b: String) =
      s"CAST(list_sum(list_transform(range(1, len($a) + 1), j -> $a[j] * $b[j])) AS BIGINT)"
    val rounds = (2 to kK).map { i =>
      s""", p$i AS MATERIALIZED (SELECT vec_id, v, nrm, d2 FROM m${i - 1} ORDER BY d2 DESC, vec_id LIMIT 1)
         |, m$i AS MATERIALIZED (
         |  SELECT m.vec_id, m.v, m.nrm,
         |    LEAST(m.d2, m.nrm + p.nrm - 2 * ${dot("m.v", "p.v")}) AS d2
         |  FROM m${i - 1} m, p$i p WHERE m.vec_id <> p.vec_id)""".stripMargin
    }.mkString("\n")
    val tail = (2 to kK).map(i =>
      s"  UNION ALL SELECT $i AS rank, vec_id, d2 AS d2_at_pick FROM p$i").mkString("\n")
    s"""${LlmQueries.quantizedCte}, p1 AS MATERIALIZED (
       |  SELECT vec_id, v, nrm FROM n ORDER BY vec_id LIMIT 1
       |), m1 AS MATERIALIZED (
       |  SELECT b.vec_id, b.v, b.nrm,
       |    b.nrm + p.nrm - 2 * ${dot("b.v", "p.v")} AS d2
       |  FROM n b, p1 p WHERE b.vec_id <> p.vec_id)
       |$rounds
       |SELECT * FROM (
       |  SELECT 1 AS rank, vec_id, 0::BIGINT AS d2_at_pick FROM p1
       |$tail
       |) ORDER BY rank""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    "sample_kcenter"    -> sampleKcenterSql,
    "sample_temperature" -> sampleTemperatureSql,
    "sample_importance" -> sampleImportanceSql,
    "sample_token_budget" -> sampleTokenBudgetSql,
    "sample_neyman"     -> sampleNeymanSql,
    "sample_curriculum" -> sampleCurriculumSql,
    "corpus_shard"      -> corpusShardSql,
    "text_chunking"     -> textChunkingSql,
    "text_packing"      -> textPackingSql,
    "sample_stratified" -> sampleStratifiedSql,
    "text_vocab"        -> textVocabSql,
    "text_cooccurrence" -> textCooccurrenceSql,
    "text_repetition_filter" -> textRepetitionFilterSql
  )
}
