package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** The reference's ETL as continuous Structured Streaming (reference:
  * scripts/main.py runs extract→transform as a batch loop; here the same
  * semantics are event-driven).
  *
  * Transforms are defined on unbounded DataFrames and are identical in
  * shape to their batch twins in core.CoreQueries, so streaming output can
  * be verified against batch results (StreamingSpec does exactly that).
  *
  * Scale notes: watermarks bound all state; the windowed agg state is
  * per (window, event_type); sessionization state is per user with an
  * inactivity timeout, so state size tracks active users, not history.
  */
object EventsPipeline {

  /** An event row (events table schema, µs timestamps). */
  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  /** A completed session (emitted when the gap closes it). */
  case class Session(user_id: Long, n_events: Long, session_start_sec: Long,
      session_end_sec: Long, session_value: Double)

  /** Open-session state (public: Janino-generated encoder code must be
    * able to reference it).
    */
  case class SessionState(nEvents: Long, startSec: Long, lastSec: Long, total: Double)

  /** Tumbling 1-hour window aggregation with a 10-minute watermark — the
    * streaming twin of CoreQueries.streamWindowedAgg (append mode: a window
    * emits once its watermark passes).
    */
  def windowedAgg(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "1 hour")("start").cast("timestamp").as("window_start"),
        $"event_type")
      .agg(
        count(lit(1)).as("n_events"),
        sum($"value".cast("decimal(10,2)")).cast("double").as("total_value"),
        approx_count_distinct($"user_id").as("approx_users"))
  }

  /** Gap-based sessionization (30-minute inactivity) via
    * flatMapGroupsWithState with EVENT-TIME timeouts — the streaming twin
    * of CoreQueries.sessionizeEvents. A session is emitted either when a
    * new event arrives past the gap, or when the watermark passes the
    * session's gap deadline (lastSec + gap) — so idle users' open sessions
    * are emitted AND their state evicted: state size tracks active users
    * within the watermark horizon, not total users ever seen.
    *
    * The timeout timestamp is always ≥ the newest event just processed
    * (which itself is ≥ the current watermark, late rows being dropped by
    * the watermark), so setTimeoutTimestamp never races the watermark.
    */
  val sessionGapSec = 1800L

  def sessionize(events: Dataset[Event], watermarkDelay: String = "10 minutes"): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (userId: Long, it: Iterator[Event], state: GroupState[SessionState]) => {
          if (state.hasTimedOut) {
            // watermark passed lastSec + gap: the session can never be
            // extended — emit it and evict the state
            val s = state.get
            state.remove()
            Iterator.single(Session(userId, s.nEvents, s.startSec, s.lastSec, s.total))
          } else {
            val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            val out = scala.collection.mutable.ArrayBuffer[Session]()
            var cur = state.getOption
            sorted.foreach { e =>
              val sec = e.ts.getTime / 1000
              cur match {
                case Some(s) if sec - s.lastSec > sessionGapSec =>
                  out += Session(userId, s.nEvents, s.startSec, s.lastSec, s.total)
                  cur = Some(SessionState(1, sec, sec, e.value))
                case Some(s) =>
                  cur = Some(SessionState(s.nEvents + 1, s.startSec, sec, s.total + e.value))
                case None =>
                  cur = Some(SessionState(1, sec, sec, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp((s.lastSec + sessionGapSec) * 1000L)
            }
            out.iterator
          }
        })
  }

  /** Gap sessionization via the BUILT-IN session_window aggregation — the
    * native-API twin of [[sessionize]] (flatMapGroupsWithState). Spark
    * merges events whose gap is under 30 minutes into one window and emits
    * the session when the watermark passes its end; state eviction comes
    * free from the window semantics. Boundary nuance vs the custom form:
    * session_window starts a new session at gap ≥ 30 min (exclusive end),
    * the custom/batch form at gap > 30 min — identical unless a gap is
    * exactly 1800.000000 s.
    */
  def sessionizeNative(events: DataFrame, watermarkDelay: String = "10 minutes"): DataFrame = {
    import events.sparkSession.implicits._
    // exact parity with the batch/custom forms, which sessionize on WHOLE
    // seconds with "same session iff gap <= 1800 s": floor the event time
    // to seconds, and since session_window merges on t_next < t_prev + gap
    // (strict), a gap of 1801 s over integer seconds is exactly gap <= 1800
    val tsSec = date_trunc("second", $"ts")
    events
      .withColumn("ts", tsSec)
      .withWatermark("ts", watermarkDelay)
      .groupBy($"user_id", session_window($"ts", "1801 seconds"))
      .agg(
        count(lit(1)).as("n_events"),
        min(unix_timestamp($"ts")).as("session_start_sec"),
        max(unix_timestamp($"ts")).as("session_end_sec"),
        sum($"value").as("session_value"))
      .select($"user_id", $"n_events", $"session_start_sec", $"session_end_sec", $"session_value")
  }

  /** Stream-static enrichment: the unbounded event stream joined with a
    * static dimension (the reference's per-batch metadata lookups, fused
    * into the stream). The static side is broadcast per micro-batch — no
    * stream-side shuffle.
    */
  def enrichStream(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(broadcast(dim), Seq(key), "left")

  /** Stream-stream interval join: purchases joined to the same user's
    * signups that happened in the preceding hour — both sides watermarked
    * so join state is evicted once the interval cannot match anymore
    * (state ∝ one hour of stream, not history).
    */
  def purchaseAttribution(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    val purchases = events.filter($"event_type" === "purchase")
      .select($"event_id".as("purchase_id"), $"user_id", $"ts".as("purchase_ts"), $"value")
      .withWatermark("purchase_ts", "10 minutes")
    val signups = events.filter($"event_type" === "signup")
      .select($"event_id".as("signup_id"), $"user_id".as("s_user_id"), $"ts".as("signup_ts"))
      .withWatermark("signup_ts", "10 minutes")
    purchases.join(signups,
      $"user_id" === $"s_user_id" &&
        $"signup_ts" <= $"purchase_ts" &&
        $"signup_ts" >= $"purchase_ts" - expr("INTERVAL 1 HOUR"))
      .select($"purchase_id", $"user_id", $"purchase_ts", $"signup_id", $"signup_ts", $"value")
  }

  /** Streaming exact-dedup: drop events already seen within the watermark
    * horizon (the reference's "re-runnable logic with deduplication" —
    * ON CONFLICT DO NOTHING — as continuous state). Watermark bounds the
    * dedup state: ids older than the horizon are evicted, so state size
    * tracks the stream rate, not history.
    */
  def streamingDedup(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")

  /** Micro-batch warehouse load — the reference's load-to-Postgres step
    * (db_manager.bulk_insert inside a transaction) as a foreachBatch sink:
    * each micro-batch is appended atomically-per-batch to the warehouse
    * path, partitioned by event_type (a JDBC upsert drops into the same
    * hook unchanged).
    */
  def warehouseSink(df: DataFrame, path: String): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.withColumn("_batch_id", lit(batchId))
          .write.mode("append").partitionBy("event_type").parquet(path)
      }

  /** Idempotent micro-batch warehouse load — the reference's
    * `ON CONFLICT DO NOTHING` bulk insert (db_manager.py bulk_insert runs
    * inside a transaction with a conflict-ignoring insert, so re-running a
    * batch never duplicates rows). Here: each micro-batch is deduped on the
    * natural key, anti-joined against the keys already in the warehouse,
    * and only genuinely-new rows are appended — re-delivering a batch
    * (at-least-once upstream, or a foreachBatch retry) is a no-op.
    *
    * Scale note: the anti-join probes the warehouse's key column only
    * (column-pruned parquet scan). At 100 TB the warehouse would be
    * key-bucketed so the anti-join co-partitions without a full shuffle, or
    * delegated to a transactional table format's MERGE — both drop into
    * this same foreachBatch hook.
    */
  def upsertWarehouseSink(df: DataFrame, path: String, key: String): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // persist the deduped batch: it is consumed three times (isEmpty,
        // bloom build, anti-join) and the dedup shuffle must run once
        val deduped = batch.filter(col(key).isNotNull).dropDuplicates(key)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try
          antiJoinFresh(deduped, path, key).withColumn("_batch_id", lit(batchId))
            .write.mode("append").parquet(path)
        finally deduped.unpersist()
      }

  /** The per-batch body of [[upsertWarehouseSink]], factored out so its
    * plan is testable: dedupe the batch on the natural key, then anti-join
    * against the warehouse keys to keep only genuinely-new rows.
    *
    * Null keys are quarantined (dropped) first: the anti-join's equi-key
    * never matches NULL, so a null-key row would be re-appended on every
    * re-delivered batch — ON CONFLICT semantics need a definite key, same
    * as the reference's PRIMARY KEY columns being NOT NULL.
    *
    * The warehouse scan is pre-filtered with a Bloom filter built over the
    * batch's keys: a warehouse key the filter rejects cannot match any
    * batch row, so dropping it early never changes the anti-join result
    * (false positives only add candidates). At 100 TB this turns "read the
    * whole warehouse key column per micro-batch" into "read it and discard
    * ~99% before the join", on top of the bucketed co-partitioning path
    * proven in EtlSourcesSpec.
    */
  private[graft] def freshRows(batch: DataFrame, path: String, key: String): DataFrame =
    antiJoinFresh(batch.filter(col(key).isNotNull).dropDuplicates(key), path, key)

  /** Bloom + anti-join over an already null-free, key-unique batch. */
  private def antiJoinFresh(deduped: DataFrame, path: String, key: String): DataFrame = {
    // stat.bloomFilter over ZERO rows yields a null sketch buffer (NPE on
    // readFrom) — and an empty batch has nothing to anti-join anyway
    if (deduped.isEmpty) deduped
    else try {
      val bf = deduped.stat.bloomFilter(col(key).cast("string"), 1000000L, 0.01)
      val bcBf = deduped.sparkSession.sparkContext.broadcast(bf)
      val batchMightContain = udf((k: String) => k != null && bcBf.value.mightContain(k))
      val existingKeys = deduped.sparkSession.read.parquet(path).select(key)
        .filter(batchMightContain(col(key).cast("string")))
      deduped.join(existingKeys, Seq(key), "left_anti")
    } catch {
      // first batch: warehouse path does not exist yet
      case e: org.apache.spark.sql.AnalysisException
        if e.getMessage != null && e.getMessage.contains("PATH_NOT_FOUND") =>
        deduped
      case _: java.io.FileNotFoundException =>
        deduped
    }
  }

  /** Merge-update micro-batch load — the reference's `ON CONFLICT DO
    * UPDATE SET ...` upsert (ts_version_mapping.py UPSERT_SQL updates an
    * existing mapping's payload in place): matched keys take the incoming
    * row's payload, unmatched warehouse rows are kept, new keys are
    * inserted. Implemented as anti-join (keep untouched rows) ∪ incoming
    * batch — the logical MERGE. Idempotent: re-delivering a batch rewrites
    * the same rows to the same values, so count and payload are stable
    * under retries.
    *
    * In-batch duplicate keys collapse to a DETERMINISTIC winner (greatest
    * payload struct per key): the reference applies rows sequentially so
    * its last write wins, but a shuffled micro-batch has no row order —
    * include an explicit sequence column in the payload to make
    * "greatest" mean "latest".
    *
    * Crash safety: the merge is written to a staging directory first, then
    * swapped in (delete + rename), so a crash mid-rewrite leaves either the
    * intact old warehouse or a complete staging copy — never a
    * half-deleted warehouse. The delete→rename pair is still two
    * operations; a transactional table format's MERGE (same logical plan)
    * closes that last gap at production scale, where the warehouse would
    * also be key-bucketed so only affected partitions rewrite. Null keys
    * are quarantined as in [[freshRows]].
    */
  def mergeWarehouseSink(df: DataFrame, path: String, key: String): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val payloadCols = batch.columns.filterNot(_ == key)
        val incoming = batch.filter(col(key).isNotNull)
          .groupBy(col(key))
          .agg(max(struct(payloadCols.map(col).toIndexedSeq: _*)).as("_p"))
          .select(col(key) +: payloadCols.map(n => col("_p").getField(n).as(n)): _*)
          .withColumn("_batch_id", lit(batchId))
        val merged =
          try {
            val existing = spark.read.parquet(path)
            existing.join(incoming.select(key), Seq(key), "left_anti")
              .unionByName(incoming)
          } catch {
            case e: org.apache.spark.sql.AnalysisException
              if e.getMessage != null && e.getMessage.contains("PATH_NOT_FOUND") =>
              incoming
            case _: java.io.FileNotFoundException =>
              incoming
          }
        // stage-then-swap: merged reads the live path and writes elsewhere,
        // so no self-overwrite race and no whole-warehouse checkpoint
        val staging = path + ".staging"
        merged.write.mode("overwrite").parquet(staging)
        val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(path), true)
        fs.rename(new org.apache.hadoop.fs.Path(staging), new org.apache.hadoop.fs.Path(path))
        ()
      }

  /** Streaming k-means — continuous IVF index maintenance over an
    * embedding stream (the streaming form of ops.VectorAgg.kmeansCells).
    * Each micro-batch applies the mini-batch k-means update: assign the
    * batch's vectors to their nearest current centroid MAP-SIDE (broadcast
    * 1-row centroid array + per-row argmin over the fused dot products —
    * no Exchange of the batch; see ops.VectorAgg.withCellRank), aggregate
    * per-cell batch sums/counts (k·d rows through the shuffle), and fold
    * them into the persisted (cell, sum-vector, count) state, so a cell's
    * centroid is always the exact mean of every vector ever assigned to it.
    *
    * State is k rows of index metadata — the one thing that legitimately
    * lives driver-side per batch (like MLlib's StreamingKMeans); the
    * per-vector work stays fully distributed. First non-empty batch seeds
    * the k cells from its lowest vec_ids.
    *
    * Retry-safe: the state file records the last applied batchId, and a
    * re-delivered batch (foreachBatch retries after a crash between the
    * state overwrite and the checkpoint commit) is skipped instead of
    * double-folded — the exact-mean invariant survives at-least-once
    * delivery.
    */
  def streamingKmeans(vectors: DataFrame, statePath: String, k: Int = 8): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    vectors.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        kmeansFold(batch, statePath, k, batchId)
      }

  /** The per-batch body of [[streamingKmeans]], factored out so the
    * retry-idempotence guard is directly testable.
    */
  private[graft] def kmeansFold(batch: DataFrame, statePath: String, k: Int, batchId: Long): Unit =
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          import spark.implicits._

          val q = batch.select($"vec_id",
            transform($"embedding", x => floor(x.cast("double") * 1000.0 + 0.5).cast("long")).as("v"))
          val prev: Seq[(Long, Seq[Long], Long, Long)] =
            try spark.read.parquet(statePath)
              .select($"cell", $"sums", $"n", $"last_batch_id")
              .as[(Long, Seq[Long], Long, Long)].collect().toSeq
            catch {
              case e: org.apache.spark.sql.AnalysisException
                if e.getMessage != null && e.getMessage.contains("PATH_NOT_FOUND") => Seq.empty
              case _: java.io.FileNotFoundException => Seq.empty
            }
          if (prev.nonEmpty && prev.head._4 == batchId) {
            // this exact batch is already folded into the state (the
            // foreachBatch retry signature: re-delivery of the LAST
            // committed batch) — applying it again would double-count
          } else if (prev.nonEmpty && prev.head._4 > batchId) {
            // batch ids restart at 0 under a FRESH checkpoint: silently
            // skipping (state wins) would drop data, silently folding
            // would double-count history — fail loudly instead
            throw new IllegalStateException(
              s"streamingKmeans state at $statePath was last written by batch ${prev.head._4} " +
                s"but received batch $batchId — restarting with a new checkpoint against " +
                "existing state is ambiguous; clear the state path or restore the checkpoint")
          } else {
          val centroids =
            if (prev.isEmpty) q.orderBy($"vec_id").limit(k).select($"vec_id".as("cell"), $"v".as("cv"))
            else prev.map(p => (p._1, p._2, p._3)).toDF("cell", "sums", "n")
              .select($"cell", transform($"sums", s =>
                floor(s.cast("double") / $"n".cast("double") + 0.5).cast("long")).as("cv"))

          val assigned = graft.ops.VectorAgg.withCellRank(q, centroids)
            .select($"vec_id", $"v", element_at($"cellRank", 1).getField("cell").as("cell"))
          val batchAgg = assigned
            .select($"cell", posexplode($"v").as(Seq("dim", "x")))
            .groupBy($"cell", $"dim")
            .agg(sum($"x").as("s"), count(lit(1)).as("cnt"))
            .groupBy($"cell")
            .agg(array_sort(collect_list(struct($"dim", $"s"))).as("ds"), max($"cnt").as("bn"))
            .select($"cell", transform($"ds", p => p.getField("s")).as("bsums"), $"bn")

          // prev comes from collected rows, so overwriting statePath is safe
          val prevDf = prev.map(p => (p._1, p._2, p._3)).toDF("cell", "sums", "n")
          prevDf.join(batchAgg, Seq("cell"), "full_outer")
            .select($"cell",
              when($"sums".isNull, $"bsums")
                .when($"bsums".isNull, $"sums")
                .otherwise(zip_with($"sums", $"bsums", (a, b) => a + b)).as("sums"),
              (coalesce($"n", lit(0L)) + coalesce($"bn", lit(0L))).as("n"),
              lit(batchId).as("last_batch_id"))
            .coalesce(1)
            .write.mode("overwrite").parquet(statePath)
          }
        }

  /** File-source incremental ingest — the streaming form of the reference's
    * delta load (extractor.py re-runs over a directory; here new files are
    * picked up per micro-batch, exactly-once).
    */
  def fileIngest(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType)))
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 4)
      .parquet(dir)
  }
}
