package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal column plumbing: media as opaque binary + typed metadata.
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked deterministic stub ([[decodeStub]]); everything around
  * it — the binary column representation, the typed record schema, the
  * per-partition batch shape a real decoder needs (load model/codec once
  * per partition, stream records through it), and the downstream feature
  * aggregation — is real Spark and runs in tests and Verify.
  *
  * At scale: media bytes stay columnar in parquet, decode is
  * mapPartitions (one codec init per partition, no per-row setup),
  * features are small fixed-width vectors so downstream aggregation
  * shuffles features, never raw media.
  */
object Multimodal {

  /** A media record: opaque payload + typed metadata. */
  case class MediaRecord(media_id: Long, format: String, byte_size: Long, payload: Array[Byte])

  /** Extracted features (what a real image/audio model would emit). */
  case class MediaFeatures(media_id: Long, format: String, byte_size: Long,
      checksum: Long, brightness: Double, n_frames: Int)

  /** The decode/feature-extract stub: deterministic byte statistics standing
    * in for a real codec. A production build replaces ONLY this function
    * (e.g. JNI to ffmpeg/libjpeg); the pipeline shape does not change.
    */
  def decodeStub(r: MediaRecord): MediaFeatures = {
    var sum = 0L
    var i = 0
    while (i < r.payload.length) { sum = sum * 31 + (r.payload(i) & 0xff); i += 1 }
    MediaFeatures(
      media_id = r.media_id,
      format = r.format,
      byte_size = r.byte_size,
      checksum = sum,
      brightness = if (r.payload.isEmpty) 0.0
        else r.payload.map(b => (b & 0xff).toDouble).sum / r.payload.length / 255.0,
      n_frames = 1 + (r.media_id % 30).toInt)
  }

  /** Documents recast as a media table: payload = utf8 bytes (stand-in for
    * image/audio bytes), format from source, size from n_chars.
    */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(
        $"doc_id".as("media_id"),
        concat(lit("fmt_"), pmod($"doc_id", lit(3))).as("format"),
        $"n_chars".cast("long").as("byte_size"),
        encode($"text", "UTF-8").as("payload"))
      .as[MediaRecord]
  }

  /** Full pipeline: media scan → per-partition decode (stub) → per-format
    * feature rollup. mapPartitions is the mapInPandas-equivalent batch
    * boundary: a real codec initializes once per iterator.
    */
  def multimodalPipeline(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val features = mediaTable(spark, dir)
      .mapPartitions { it => it.map(decodeStub) } // codec plug point
    features.toDF()
      .groupBy($"format")
      .agg(
        count(lit(1)).as("n_media"),
        sum($"byte_size").as("total_bytes"),
        avg($"brightness").as("avg_brightness"),
        sum($"n_frames").as("total_frames"),
        countDistinct($"checksum").as("distinct_payloads"))
      .orderBy($"format")
  }

  /** Frame sampling + resize planning over decoded media: every 4th frame
    * index is kept (stride sampling — the "sample N frames per video" step
    * of a vision-training pipeline), each sampled frame gets a
    * deterministic checksum and a per-format resize target; the rollup
    * counts sampled frames and estimated post-resize bytes per format.
    *
    * The frame stream is generated per row (sequence + explode — map-side,
    * no shuffle until the final rollup); a real build replaces the
    * checksum/resize stubs with the codec's frame grab + scaler inside the
    * same mapPartitions boundary as [[decodeStub]].
    */
  def multimodalFrameSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val stride = 4
    val features = mediaTable(spark, dir)
      .mapPartitions(_.map(decodeStub)) // codec plug point (once per partition)
      .toDF()
    val resizeTarget = when($"format" === "fmt_0", 224)
      .when($"format" === "fmt_1", 336)
      .otherwise(512) // per-format target edge length (stub policy table)
    features
      .select($"media_id", $"format", $"byte_size",
        explode(sequence(lit(1), $"n_frames")).as("frame_idx"))
      .filter(pmod($"frame_idx", lit(stride)) === 1)
      .withColumn("frame_checksum", xxhash64($"media_id", $"frame_idx"))
      .withColumn("resize_edge", resizeTarget)
      .withColumn("resized_bytes", ($"resize_edge" * $"resize_edge" * 3).cast("long"))
      .groupBy($"format")
      .agg(
        countDistinct($"media_id").as("n_media"),
        count(lit(1)).as("n_sampled_frames"),
        countDistinct($"frame_checksum").as("distinct_frames"),
        max($"resize_edge").as("resize_edge"),
        sum($"resized_bytes").as("total_resized_bytes"))
      .orderBy($"format")
  }

  /** Audio–video temporal alignment — the cross-modal pairing step an AV
    * training pipeline runs before contrastive training: every video
    * frame is matched to the audio chunk whose interval contains its
    * timestamp. Frames tick at a fixed 25 fps; audio chunks have
    * VARIABLE deterministic durations (a hash of (media, chunk) — the
    * stand-in for real VAD segment boundaries), so the match is a genuine
    * interval-containment join, not a divisible-key lookup.
    *
    * Scale shape: the alignment runs through
    * [[RangeJoin.rangeJoinNumericKeyed]] — a hash equi-join on
    * (media_id, ms-bucket) with the exact BETWEEN as a post-filter,
    * never a nested loop (PlanSpec-guarded like range_join_intervals);
    * chunk-boundary running sums are per-media windows over ≤ 4 rows.
    * Timelines derive deterministically from the documents table, so the
    * DuckDB oracle generates the identical frames/chunks and the plain
    * BETWEEN join gates the bucketed plan hash-exactly.
    */
  def multimodalAvAlign(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val media = Tables.documents(spark, dir).select(
      $"doc_id".as("media_id"),
      concat(lit("fmt_"), pmod($"doc_id", lit(3))).as("format"),
      (lit(1) + pmod($"doc_id", lit(30))).cast("int").as("n_frames"))
    val frames = media
      .select($"media_id", $"format", explode(sequence(lit(1), $"n_frames")).as("frame_idx"))
      .withColumn("frame_ts_ms", (($"frame_idx" - 1) * 40).cast("long"))
    // 4 chunks cover the longest span (29 frames · 40 ms = 1160 ms < 4·300);
    // trailing chunks with no frames drop out of the inner join identically
    // in both engines
    val wc = Window.partitionBy($"media_id").orderBy($"chunk_idx")
      .rowsBetween(Window.unboundedPreceding, -1)
    val chunks = media
      .select($"media_id", explode(sequence(lit(1), lit(4))).as("chunk_idx"))
      .withColumn("dur_ms",
        (lit(300) + pmod($"media_id" * 31 + $"chunk_idx" * 17, lit(700))).cast("long"))
      .withColumn("start_ms", coalesce(sum($"dur_ms").over(wc), lit(0L)))
      .withColumn("end_ms", $"start_ms" + $"dur_ms" - 1)
      .select($"media_id", $"chunk_idx", $"start_ms", $"end_ms")
    RangeJoin.rangeJoinNumericKeyed(frames, "frame_ts_ms", chunks,
        "start_ms", "end_ms", bucketWidth = 1000L, keys = Seq("media_id"))
      .groupBy($"media_id", $"format", $"chunk_idx", $"start_ms", $"end_ms")
      .agg(
        count(lit(1)).as("n_frames_aligned"),
        min($"frame_idx").as("first_frame"),
        max($"frame_idx").as("last_frame"))
      .orderBy($"media_id", $"chunk_idx")
  }

  val multimodalAvAlignSql: String =
    """WITH media AS (
      |  SELECT doc_id AS media_id,
      |    'fmt_' || CAST(doc_id % 3 AS VARCHAR) AS format,
      |    1 + doc_id % 30 AS n_frames
      |  FROM documents
      |), frames AS (
      |  SELECT media_id, format, CAST(u AS BIGINT) AS frame_idx,
      |    CAST((u - 1) * 40 AS BIGINT) AS frame_ts_ms
      |  FROM media, UNNEST(range(1, n_frames + 1)) AS r(u)
      |), cr AS (
      |  SELECT media_id, CAST(u AS BIGINT) AS chunk_idx,
      |    CAST(300 + (media_id * 31 + u * 17) % 700 AS BIGINT) AS dur_ms
      |  FROM media, UNNEST(range(1, 5)) AS r(u)
      |), chunks AS (
      |  SELECT media_id, chunk_idx, dur_ms,
      |    CAST(COALESCE(SUM(dur_ms) OVER (PARTITION BY media_id ORDER BY chunk_idx
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_ms
      |  FROM cr
      |)
      |SELECT f.media_id, f.format, c.chunk_idx, c.start_ms,
      |  c.start_ms + c.dur_ms - 1 AS end_ms,
      |  COUNT(*) AS n_frames_aligned,
      |  MIN(f.frame_idx) AS first_frame,
      |  MAX(f.frame_idx) AS last_frame
      |FROM frames f JOIN chunks c
      |  ON f.media_id = c.media_id
      |  AND f.frame_ts_ms BETWEEN c.start_ms AND c.start_ms + c.dur_ms - 1
      |GROUP BY f.media_id, f.format, c.chunk_idx, c.start_ms, c.dur_ms
      |ORDER BY f.media_id, c.chunk_idx""".stripMargin

  /** Byte-budget shard packing for media — the webdataset step a vision
    * pipeline runs at landing: media files in deterministic (media_id)
    * order are packed into ~64 KB shards PER FORMAT by a running byte
    * total, so trainer workers stream fixed-size archives of one
    * modality. Same contract as text_packing's token bins, over bytes
    * with a per-format timeline.
    *
    * The per-format running sum is the SAME two-level sharded scan as
    * [[Curation.textPackingSharded]] (never a single-partition window):
    * coarse order-preserving shards of media_id, per-(format, shard)
    * totals, exclusive offsets over the tiny totals table (window over
    * #formats·#shards rows), broadcast back, running sum per (format,
    * shard) partition. No task scans more than one coarse shard of one
    * format.
    */
  def multimodalShardPack(spark: SparkSession, dir: String,
      budgetBytes: Long = 65536L, shardDocs: Long = 128L): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val media = Tables.documents(spark, dir).select(
      $"doc_id".as("media_id"),
      concat(lit("fmt_"), pmod($"doc_id", lit(3))).as("format"),
      $"n_chars".cast("long").as("byte_size"))
      .withColumn("shard", ($"media_id" / shardDocs).cast("long"))
    val oneGroupPerFormat = Window.partitionBy($"format").orderBy($"shard")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = media.groupBy($"format", $"shard")
      .agg(sum($"byte_size").as("shard_bytes"))
      .withColumn("shard_offset", coalesce(sum($"shard_bytes").over(oneGroupPerFormat), lit(0L)))
      .select($"format", $"shard", $"shard_offset")
    val perShard = Window.partitionBy($"format", $"shard").orderBy($"media_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    media.join(broadcast(offsets), Seq("format", "shard"))
      .withColumn("running_bytes", $"shard_offset" + sum($"byte_size").over(perShard))
      .withColumn("pack_shard", (($"running_bytes" - $"byte_size") / budgetBytes).cast("long"))
      .withColumn("offset_in_shard", $"running_bytes" - $"byte_size" - $"pack_shard" * budgetBytes)
      .select($"media_id", $"format", $"byte_size", $"running_bytes",
        $"pack_shard", $"offset_in_shard")
      .orderBy($"media_id")
  }

  val multimodalShardPackSql: String =
    """WITH media AS (
      |  SELECT doc_id AS media_id,
      |    'fmt_' || CAST(doc_id % 3 AS VARCHAR) AS format,
      |    CAST(n_chars AS BIGINT) AS byte_size
      |  FROM documents
      |), r AS (
      |  SELECT media_id, format, byte_size,
      |    CAST(SUM(byte_size) OVER (PARTITION BY format ORDER BY media_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_bytes
      |  FROM media
      |)
      |SELECT media_id, format, byte_size, running_bytes,
      |  (running_bytes - byte_size) // 65536 AS pack_shard,
      |  running_bytes - byte_size - ((running_bytes - byte_size) // 65536) * 65536 AS offset_in_shard
      |FROM r
      |ORDER BY media_id""".stripMargin

  /** Average-hash (aHash) perceptual fingerprint: 64 equal blocks of the
    * decoded plane, bit k = 1 ⇔ block k's mean exceeds the global mean.
    * This is the classic perceptual-hash construction verbatim; payload
    * bytes stand in for the decoded grayscale pixels (the container has
    * no codecs — a real build decodes first at the same [[decodeStub]]
    * plug point, the hash arithmetic is unchanged). Small local edits
    * move a few block means → few bits flip, which is exactly the
    * near-dup-tolerance a byte-exact checksum lacks.
    */
  def phashStub(payload: Array[Byte]): Long = {
    val n = payload.length
    if (n == 0) return 0L
    var global = 0L
    var i = 0
    while (i < n) { global += (payload(i) & 0xff); i += 1 }
    var h = 0L
    var b = 0
    while (b < 64) {
      val lo = (b.toLong * n / 64).toInt
      val hi = ((b + 1).toLong * n / 64).toInt
      if (hi > lo) {
        var s = 0L
        var j = lo
        while (j < hi) { s += (payload(j) & 0xff); j += 1 }
        // block mean > global mean, in exact integer cross-multiplied form
        if (s * n > global * (hi - lo)) h |= (1L << b)
      }
      b += 1
    }
    h
  }

  /** Perceptual-hash near-duplicate detection over media — the image-dedup
    * step of a vision-data pipeline (byte-exact checksums miss re-encoded
    * / lightly-edited copies; pHash hamming distance catches them). Same
    * scale machinery as [[ScaleDedup.dedupSimhash]], pigeonhole-blocked
    * one level finer: the 64-bit fingerprint splits into 16 4-bit nibble
    * chunks, pigeonhole-COMPLETE for hamming ≤ 15 (a qualifying pair
    * cannot differ in all 16 nibbles — the radius matching this corpus's
    * proxy payloads, where an in-place pixel edit moves a handful of
    * block means). Candidates meet in a (format, chunk) hash equi-join,
    * the hamming verify is a register-op `bit_count(xor)` BEFORE the
    * dedup exchange, and only id pairs ever shuffle. Pairs are
    * within-format only (an image cannot near-dup an audio clip).
    * Rows-only: OpsSpec pins exact equality with brute force on a
    * planted-edit corpus and on the real corpus.
    */
  private[graft] def multimodalDedupPhashOn(media: Dataset[MediaRecord]): DataFrame = {
    import media.sparkSession.implicits._
    val nibbles = array((0 until 16).map { k =>
      struct(lit(k).as("chunk_idx"),
        shiftrightunsigned($"phash", k * 4).bitwiseAND(lit(15L)).as("chunk_val"))
    }: _*)
    val hashed = media
      .mapPartitions(_.map(r => (r.media_id, r.format, phashStub(r.payload))))
      .toDF("media_id", "format", "phash")
    val exploded = hashed.select($"media_id", $"format", $"phash",
      posexplode(nibbles).as(Seq("pos", "c")))
      .select($"media_id", $"format", $"c.chunk_idx", $"c.chunk_val", $"phash")
    val l = exploded.select($"format", $"chunk_idx", $"chunk_val",
      $"media_id".as("a"), $"phash".as("ph_a"))
    val r = exploded.select($"format", $"chunk_idx", $"chunk_val",
      $"media_id".as("b"), $"phash".as("ph_b"))
    l.join(r, Seq("format", "chunk_idx", "chunk_val"))
      .filter($"a" < $"b")
      .withColumn("hamming", bit_count($"ph_a".bitwiseXOR($"ph_b")))
      .filter($"hamming" <= 15)
      .select($"format", $"a", $"b", $"hamming")
      .dropDuplicates("format", "a", "b")
      .orderBy($"format", $"a", $"b")
  }

  def multimodalDedupPhash(spark: SparkSession, dir: String): DataFrame =
    multimodalDedupPhashOn(mediaTable(spark, dir))

  /** CLIP-score pair screening — the LAION-style caption–image filter: a
    * crawled (caption, image) pair survives only if the two modality
    * embeddings agree (cosine ≥ 0.28, the published LAION-400M cut).
    * Embeddings arrive as one table with interleaved ids (even = caption
    * tower, odd = image tower of the same crawl item, pair_id = id div 2)
    * — the shape a dual-encoder scorer emits.
    *
    * The screen itself is exact integer arithmetic on the shared ×1000
    * quantization ([[LlmQueries.quantized]]): keep ⇔ dot ≥ 0 ∧
    * dot²·10⁴ ≥ na·nb·784 (784 = 0.28²·10⁴) — no float compare in the
    * verdict, so Spark and the oracle cannot disagree on boundary pairs;
    * the reported cosine is two correctly-rounded IEEE ops (÷, √) over
    * exact integers, bit-identical cross-engine.
    *
    * Scale shape: one scan, the pair assembly is an equi-join on pair_id
    * (both sides shuffle once on the same key; in production the two
    * towers land pre-joined in one row and even this join disappears);
    * scoring is the codegen'd LongVectorDot map-side. Nothing all-pairs —
    * candidate volume is exactly n/2 crawl items.
    */
  /** The scoring/verdict core over assembled (pair_id, caption_id,
    * image_id, va, na, vb, nb) rows — stateless and map-side, shared
    * verbatim by the batch entry below and the streaming ingest screen
    * [[graft.streaming.CorpusStream.clipFilterStream]] so a pair gets
    * the identical verdict in a backfill and on the stream.
    */
  private[graft] def clipScreenOn(pairs: DataFrame): DataFrame = {
    import pairs.sparkSession.implicits._
    pairs
      .withColumn("dot", graft.functions.LongVectorDot.vector_dot($"va", $"vb"))
      .withColumn("cosine",
        $"dot".cast("double") / sqrt(($"na" * $"nb").cast("double")))
      .withColumn("verdict",
        when($"dot" >= 0 && $"dot" * $"dot" * lit(10000L) >= $"na" * $"nb" * lit(784L),
          "keep").otherwise("drop"))
      .select($"pair_id", $"caption_id", $"image_id", $"dot", $"na", $"nb",
        $"cosine", $"verdict")
  }

  /** The assembled caption–image pair table (both tower embeddings in one
    * row — the shape a dual-encoder scorer emits, and the stream's input).
    */
  private[graft] def pairedEmbeddings(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val q = LlmQueries.quantized(spark, dir)
    val captions = q.filter($"vec_id" % 2 === 0)
      .select(($"vec_id" / 2).cast("long").as("pair_id"),
        $"vec_id".as("caption_id"), $"v".as("va"), $"nrm".as("na"))
    val images = q.filter($"vec_id" % 2 === 1)
      .select((($"vec_id" - 1) / 2).cast("long").as("pair_id"),
        $"vec_id".as("image_id"), $"v".as("vb"), $"nrm".as("nb"))
    captions.join(images, Seq("pair_id"))
  }

  def multimodalClipFilter(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    clipScreenOn(pairedEmbeddings(spark, dir)).orderBy($"pair_id")
  }

  val multimodalClipFilterSql: String =
    LlmQueries.quantizedCte +
      """, p AS (
        |  SELECT a.vec_id // 2 AS pair_id, a.vec_id AS caption_id, b.vec_id AS image_id,
        |    CAST(list_sum(list_transform(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i])) AS BIGINT) AS dot,
        |    a.nrm AS na, b.nrm AS nb
        |  FROM n a JOIN n b ON b.vec_id = a.vec_id + 1
        |  WHERE a.vec_id % 2 = 0
        |)
        |SELECT pair_id, caption_id, image_id, dot, na, nb,
        |  CAST(dot AS DOUBLE) / sqrt(CAST(na * nb AS DOUBLE)) AS cosine,
        |  CASE WHEN dot >= 0 AND dot * dot * 10000 >= na * nb * 784
        |       THEN 'keep' ELSE 'drop' END AS verdict
        |FROM p
        |ORDER BY pair_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_pipeline"    -> (multimodalPipeline _),
    "multimodal_framesample" -> (multimodalFrameSample _),
    "multimodal_av_align"    -> (multimodalAvAlign _),
    "multimodal_shard_pack"  -> ((s, d) => multimodalShardPack(s, d)),
    "multimodal_clip_filter" -> (multimodalClipFilter _),
    "multimodal_dedup_phash" -> (multimodalDedupPhash _)
  )

  val oracleSql: Map[String, String] = Map(
    "multimodal_av_align"    -> multimodalAvAlignSql,
    "multimodal_shard_pack"  -> multimodalShardPackSql,
    "multimodal_clip_filter" -> multimodalClipFilterSql
  )
}
