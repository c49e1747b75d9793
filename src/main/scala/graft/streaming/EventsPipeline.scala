package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
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

  /** The warehouse as Some(df), or None before the first batch ever
    * commits (missing path, or a path holding only a crashed write's
    * temporary files — both mean "no committed rows yet").
    */
  private def readWarehouse(spark: SparkSession, path: String): Option[DataFrame] =
    try Some(spark.read.parquet(path))
    catch {
      case e: org.apache.spark.sql.AnalysisException
        if e.getMessage != null && (e.getMessage.contains("PATH_NOT_FOUND") ||
          e.getMessage.contains("UNABLE_TO_INFER_SCHEMA")) => None
      case _: java.io.FileNotFoundException => None
    }

  /** Bloom + anti-join over an already null-free, key-unique batch.
    *
    * The probe is Catalyst's native `BloomFilterMightContain` (via the
    * graftshim Expression↔Column bridge), NOT a per-row Scala udf: it
    * codegens into the warehouse scan's stage, so the pre-filter keeps the
    * "no per-row UDF in a hot path" invariant. Both sides hash the key
    * through xxhash64 (build inserts longs, probe tests longs — the same
    * pairing Spark's own runtime row-level filtering uses).
    *
    * The warehouse is resolved FIRST: on the very first batch there is
    * nothing to anti-join, so the Bloom build (a batch-wide aggregation
    * pass) is skipped instead of computed and discarded.
    */
  private def antiJoinFresh(deduped: DataFrame, path: String, key: String): DataFrame =
    readWarehouse(deduped.sparkSession, path) match {
      case None => deduped // first batch: no warehouse yet, nothing to prune
      case Some(warehouse) =>
        // stat.bloomFilter over ZERO rows yields a null sketch buffer (NPE
        // on readFrom) — and an empty batch has nothing to anti-join anyway
        if (deduped.isEmpty) deduped
        else {
          val bf = deduped.stat.bloomFilter(xxhash64(col(key).cast("string")), 1000000L, 0.01)
          val bos = new java.io.ByteArrayOutputStream()
          bf.writeTo(bos)
          val probe = org.apache.spark.sql.graftshim.toColumn(
            org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
              org.apache.spark.sql.catalyst.expressions.Literal
                .create(bos.toByteArray, org.apache.spark.sql.types.BinaryType),
              org.apache.spark.sql.graftshim.toExpression(xxhash64(col(key).cast("string")))))
          val existingKeys = warehouse.select(key).filter(probe)
          deduped.join(existingKeys, Seq(key), "left_anti")
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
    * The warehouse is PARTITIONED BY a key-hash bucket and the merge
    * rewrites only the buckets the batch touches (dynamic partition
    * overwrite): per-batch I/O is O(affected buckets), not O(warehouse) —
    * a 1-key batch rewrites 1/`buckets` of the data, and at 100 TB the
    * bucket count scales with the warehouse so a micro-batch's rewrite
    * stays bounded. StreamingSpec asserts untouched buckets' files are
    * byte-identical (same path + mtime) across a merge.
    *
    * Crash safety: there is no delete-then-rename window — the root path
    * always holds a complete warehouse. Dynamic overwrite stages each
    * bucket's files and swaps them at commit; a crash mid-commit leaves a
    * mix of pre/post-merge BUCKETS, and the foreachBatch retry re-derives
    * the same deterministic merge from them (already-merged buckets
    * re-merge to identical rows — idempotent), converging on the committed
    * result. A transactional format's MERGE (same logical plan) is the
    * drop-in production upgrade. Null keys are quarantined as in
    * [[freshRows]].
    */
  def mergeWarehouseSink(df: DataFrame, path: String, key: String, buckets: Int = 16): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        mergeBatch(batch, path, key, buckets, batchId)
      }

  /** The per-batch body of [[mergeWarehouseSink]], factored out so bucket
    * isolation is directly testable.
    */
  private[graft] def mergeBatch(batch: DataFrame, path: String, key: String, buckets: Int, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val payloadCols = batch.columns.filterNot(_ == key)
    val incoming = batch.filter(col(key).isNotNull)
      .groupBy(col(key))
      .agg(max(struct(payloadCols.map(col).toIndexedSeq: _*)).as("_p"))
      .select(col(key) +: payloadCols.map(n => col("_p").getField(n).as(n)): _*)
      .withColumn("_batch_id", lit(batchId))
      .withColumn("_bucket", pmod(xxhash64(col(key).cast("string")), lit(buckets)).cast("int"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // ≤ `buckets` ints — bounded index metadata, like the k-means state
      val affected = incoming.select("_bucket").distinct().collect().map(_.getInt(0)).toSeq
      if (affected.nonEmpty) {
        val merged = readWarehouse(spark, path) match {
          case None => incoming
          case Some(wh) =>
            // partition pruning: only affected buckets are ever read
            wh.filter(col("_bucket").isin(affected: _*))
              .join(incoming.select(col(key)), Seq(key), "left_anti")
              .unionByName(incoming)
        }
        // materialize BEFORE overwriting: the merge reads the same buckets
        // it replaces, and the checkpoint is bounded by the affected
        // buckets' size, not the warehouse
        merged.localCheckpoint()
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("_bucket")
          .parquet(path)
      }
    } finally { incoming.unpersist(); () }
  }

  /** Bucketed APPEND sink — the cheap-write half of the append+compact
    * pattern: each micro-batch appends one file per touched key-hash
    * bucket (repartition on the bucket column first, so a batch never
    * sprays `shuffle.partitions` files into every bucket dir). Appends
    * cost O(batch) with no merge read, but small files accumulate — one
    * per (batch, bucket) — which is what [[compactBuckets]] bounds. Use
    * this layout when the stream is insert-only and reads can collapse
    * duplicates (vs the merge sink, which pays a bucket rewrite per batch
    * to keep the warehouse exactly-merged at all times).
    */
  def appendBucketedSink(df: DataFrame, path: String, key: String, buckets: Int = 16): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val withBucket = batch.filter(col(key).isNotNull)
          .withColumn("_bucket", pmod(xxhash64(col(key).cast("string")), lit(buckets)).cast("int"))
        withBucket
          .repartition(col("_bucket"))
          .write.mode("append")
          .partitionBy("_bucket")
          .parquet(path)
        ()
      }

  /** Small-file compaction over the bucketed warehouse layout (the
    * maintenance job every append-mode streaming warehouse schedules):
    * buckets holding more than `maxFiles` parquet files are read back and
    * rewritten as one file each via dynamic partition overwrite; buckets
    * at or under the ceiling are never read, never rewritten (StreamingSpec
    * pins both row preservation and untouched-bucket isolation by mtime).
    *
    * Scale shape: the file census is pure namenode/listing metadata (no
    * data read); compaction I/O is O(oversized buckets), so amortized cost
    * tracks the append rate, not the warehouse size — the same
    * only-affected-partitions contract as [[mergeBatch]]. The
    * `repartition(n, _bucket)` gives each oversized bucket exactly one
    * output file (all rows of a bucket hash to one partition). Crash-safe
    * the same way the merge sink is: dynamic overwrite swaps whole bucket
    * dirs at commit, and re-running compaction is idempotent.
    * Returns the compacted bucket ids.
    */
  def compactBuckets(spark: SparkSession, path: String, maxFiles: Int = 4): Seq[Int] = {
    import org.apache.hadoop.fs.Path
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Seq.empty
    val oversized = fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("_bucket="))
      .filter(d => fs.listStatus(d.getPath)
        .count(_.getPath.getName.endsWith(".parquet")) > maxFiles)
      .map(_.getPath.getName.stripPrefix("_bucket=").toInt)
      .sorted
    if (oversized.nonEmpty) {
      spark.read.parquet(path)
        .filter(col("_bucket").isin(oversized: _*)) // partition-pruned scan
        .repartition(oversized.length, col("_bucket"))
        // materialize before overwriting the same buckets being read
        .localCheckpoint()
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("_bucket")
        .parquet(path)
    }
    oversized
  }

  /** SCD2 dimension sink — [[graft.etl.EtlQueries.scd2History]]'s
    * versioning composed with the merge sink's bucketed layout: the
    * history-PRESERVING streaming upsert (the reference's
    * ts_version_mapping rewrites a mapping in place; this sink instead
    * closes the current version and appends a new one on every attribute
    * change). Per batch, per key:
    *
    *  - new key               → insert version 1, current, [ts, null)
    *  - attributes changed    → close the current version at the incoming
    *                            ts (half-open [from, to)) and append
    *                            version n+1, current, [ts, null)
    *  - attributes unchanged  → no-op, which is exactly what makes a
    *                            re-delivered batch idempotent: its rows
    *                            compare equal to the version they created
    *
    * In-batch duplicates collapse to the latest (max event time, greatest
    * payload tie-break) — intermediate same-batch states are not
    * versioned, matching the merge sink's winner rule. The dimension is
    * bucketed by key hash and only affected buckets rewrite (dynamic
    * partition overwrite), same shapes and crash story as [[mergeBatch]].
    */
  def scd2DimSink(df: DataFrame, path: String, key: String, tsCol: String, buckets: Int = 16): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        scd2Fold(batch, path, key, tsCol, buckets, batchId)
      }

  /** The per-batch body of [[scd2DimSink]], factored out for direct
    * testability of the versioning rules.
    */
  private[graft] def scd2Fold(batch: DataFrame, path: String, key: String, tsCol: String, buckets: Int, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val attrCols = batch.columns.filterNot(c => c == key || c == tsCol).toSeq
    val incoming = batch.filter(col(key).isNotNull)
      .groupBy(col(key))
      .agg(max(struct(unix_timestamp(col(tsCol)).as("ts_sec") +: attrCols.map(col): _*)).as("_p"))
      .select(col(key).as("_ik") +: col("_p").getField("ts_sec").as("_its") +:
        attrCols.map(n => col("_p").getField(n).as("_i_" + n)): _*)
      .withColumn("_ibucket", pmod(xxhash64(col("_ik").cast("string")), lit(buckets)).cast("int"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val affected = incoming.select("_ibucket").distinct().collect().map(_.getInt(0)).toSeq
      if (affected.nonEmpty) {
        def asNewVersion(df: DataFrame, version: Column): DataFrame =
          df.select(col("_ik").as(key) +: attrCols.map(n => col("_i_" + n).as(n)) ++: Seq(
            col("_its").as("valid_from_sec"),
            lit(null).cast("long").as("valid_to_sec"),
            lit(true).as("is_current"),
            version.as("version"),
            col("_ibucket").as("_bucket")): _*)
        val merged = readWarehouse(spark, path) match {
          case None => asNewVersion(incoming, lit(1L))
          case Some(dim) =>
            val dimAff = dim.filter(col("_bucket").isin(affected: _*))
            val history = dimAff.filter(!col("is_current")) // closed versions never change
            val cur = dimAff.filter(col("is_current"))
            val j = cur.join(incoming, cur(key) === incoming("_ik"), "full_outer")
            val attrsEqual = struct(attrCols.map(col): _*) <=> struct(attrCols.map(n => col("_i_" + n)): _*)
            val isChange = col("_ik").isNotNull && (col(key).isNull || !attrsEqual)
            // current rows: closed at the incoming ts if changed, kept verbatim otherwise
            val keptOrClosed = j.filter(col(key).isNotNull)
              .select(col(key) +: attrCols.map(col) ++: Seq(
                col("valid_from_sec"),
                when(isChange, col("_its")).otherwise(col("valid_to_sec")).as("valid_to_sec"),
                when(isChange, lit(false)).otherwise(col("is_current")).as("is_current"),
                col("version"),
                col("_bucket")): _*)
            val newVersions = asNewVersion(j.filter(isChange),
              coalesce(col("version"), lit(0L)) + lit(1L))
            history.unionByName(keptOrClosed).unionByName(newVersions)
        }
        merged.localCheckpoint()
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("_bucket")
          .parquet(path)
      }
    } finally { incoming.unpersist(); () }
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
    * Retry-safe: the state file records the last applied batchId AND the
    * caller's run tag (tie it to the checkpoint location — same checkpoint,
    * same tag). A re-delivered batch (foreachBatch retries after a crash
    * between the state overwrite and the checkpoint commit) presents the
    * same tag + same batchId and is skipped instead of double-folded — the
    * exact-mean invariant survives at-least-once delivery. A FRESH
    * checkpoint presents a different tag and fails loudly even at batch 0,
    * where batchId alone cannot distinguish "retry of the first batch"
    * (skip) from "new run against stale state" (data loss if skipped).
    */
  def streamingKmeans(vectors: DataFrame, statePath: String, k: Int = 8, runTag: String = "default"): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    vectors.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        kmeansFold(batch, statePath, k, batchId, runTag)
      }

  /** The per-batch body of [[streamingKmeans]], factored out so the
    * retry-idempotence guard is directly testable.
    */
  private[graft] def kmeansFold(batch: DataFrame, statePath: String, k: Int, batchId: Long, runTag: String = "default"): Unit =
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          import spark.implicits._

          val q = batch.select($"vec_id",
            transform($"embedding", x => floor(x.cast("double") * 1000.0 + 0.5).cast("long")).as("v"))
          val prev: Seq[(Long, Seq[Long], Long, Long, String)] =
            readWarehouse(spark, statePath) match {
              case None => Seq.empty
              case Some(st) => st.select($"cell", $"sums", $"n", $"last_batch_id", $"run_tag")
                .as[(Long, Seq[Long], Long, Long, String)].collect().toSeq
            }
          if (prev.nonEmpty && prev.head._5 == runTag && prev.head._4 == batchId) {
            // this exact batch is already folded into the state (the
            // foreachBatch retry signature: re-delivery of the LAST
            // committed batch by the SAME run) — applying it again would
            // double-count
          } else if (prev.nonEmpty && (prev.head._5 != runTag || prev.head._4 > batchId)) {
            // batch ids restart at 0 under a FRESH checkpoint, so batchId
            // alone cannot tell "retry of batch 0" from "new run against
            // stale state" — the run tag can. Silently skipping (state
            // wins) would drop data, silently folding would double-count
            // history — fail loudly instead
            throw new IllegalStateException(
              s"streamingKmeans state at $statePath was last written by run '${prev.head._5}' " +
                s"batch ${prev.head._4} but received batch $batchId from run '$runTag' — " +
                "restarting with a new checkpoint against existing state is ambiguous; " +
                "clear the state path or restore the checkpoint")
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
              lit(batchId).as("last_batch_id"),
              lit(runTag).as("run_tag"))
            .coalesce(1)
            .write.mode("overwrite").parquet(statePath)
          }
        }

  /** Streaming Z-order ingest — continuous-ingestion twin of
    * [[graft.ops.ZorderLayout.writeZorderLayout]]: each micro-batch routes
    * through the SAVED normalization grid (appendToZorderLayout — no
    * re-stats, landed cells never reshuffle) after the shardSink
    * idempotence discipline: in-batch dedup on event_id, then the
    * Bloom-prefiltered anti-join against landed ids, so a re-delivered or
    * partially-appended batch adds nothing twice. Appended I/O per batch
    * is O(batch): files land only in touched cell dirs.
    */
  def zorderSink(events: DataFrame, layoutPath: String): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    events.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) => zorderFold(batch, layoutPath) }

  /** The per-batch body of [[zorderSink]], factored out for direct tests. */
  private[graft] def zorderFold(batch: DataFrame, layoutPath: String): Unit =
    if (!batch.isEmpty) {
      import batch.sparkSession.implicits._
      val b = batch
        .select($"event_id", $"user_id", $"ts".cast("long").as("sec"))
        .dropDuplicates("event_id")
      val fresh = antiJoinFresh(b, layoutPath, "event_id")
      if (!fresh.isEmpty) graft.ops.ZorderLayout.appendToZorderLayout(fresh, layoutPath)
    }

  /** Streaming rate-anomaly screen — the streaming twin of
    * [[graft.core.BehaviorQueries.eventsAnomaly]], with honest no-lookahead
    * semantics: each (event_type, day) count is scored against the TRAILING
    * baseline (mean/std of the days already closed) instead of the batch
    * twin's global stats. A day closes when any strictly later day appears
    * in the stream (a global event-time high-watermark); the final day
    * stays open, exactly as an unbounded stream leaves "today" unscored.
    *
    * State per type is three numbers (n, Σ, Σ²) plus the open-day counts —
    * bounded by #types × (open days + 1), never by history; the per-batch
    * heavy work (counting events into (type, day)) is a distributed
    * partial-agg groupBy, and only that bounded state is pulled to the
    * driver (the [[kmeansFold]] contract). Retry-idempotent via the same
    * (run_tag, last_batch_id) guard; verdicts land in a batch-scoped
    * overwrite dir so a retried fold rewrites rather than duplicates.
    */
  def streamingAnomaly(events: DataFrame, statePath: String, runTag: String = "default"): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    events.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        anomalyFold(batch, statePath, batchId, runTag)
      }

  /** The per-batch body of [[streamingAnomaly]], factored out for direct
    * testing (replayed batches, retry guard, spike detection).
    */
  private[graft] def anomalyFold(batch: DataFrame, statePath: String, batchId: Long, runTag: String = "default"): Unit =
    if (!batch.isEmpty) {
      val spark = batch.sparkSession
      import spark.implicits._
      // distributed: this batch's (type, day) counts — the only pass that
      // touches event rows
      val batchCounts = batch
        .select($"event_type", to_date($"ts").as("d"))
        .groupBy($"event_type", $"d")
        .agg(count(lit(1)).as("n_events"))
        .select($"event_type", date_format($"d", "yyyy-MM-dd").as("day"), $"n_events")
        .as[(String, String, Long)].collect().toSeq

      // ONE state table (kind = 'stats' | 'open') through the shared
      // StateFold versioned commit (round 10) — the baseline and the
      // open-day counts commit atomically with the guard, so a crash can
      // neither leave the marker behind the data nor (as the old
      // delete-then-write overwrite could) lose the state wholesale
      StateFold.guarded(spark, statePath, batchId, runTag) { prev =>
        val prevState: Seq[(String, String, String, Long, Double, Double)] = prev
          .map(_.select($"kind", $"event_type", $"day", $"n", $"s", $"q")
            .as[(String, String, String, Long, Double, Double)].collect().toSeq)
          .getOrElse(Seq.empty)
        val prevStats = prevState.filter(_._1 == "stats").map(r => (r._2, r._4, r._5, r._6))
        val prevOpen: Seq[(String, String, Long)] =
          prevState.filter(_._1 == "open").map(r => (r._2, r._3, r._4))
        val merged = (prevOpen ++ batchCounts)
          .groupBy(r => (r._1, r._2))
          .map { case ((t, d), rs) => (t, d, rs.map(_._3).sum) }.toSeq
        val maxDay = merged.map(_._2).max
        val (toClose, stillOpen) = merged.partition(_._2 < maxDay)

        val stats = scala.collection.mutable.Map[String, (Long, Double, Double)]() ++
          prevStats.map(p => p._1 -> ((p._2, p._3, p._4)))
        // close in day order so a multi-day batch folds each day into the
        // baseline before the next is scored
        val verdicts = toClose.sortBy(r => (r._2, r._1)).map { case (t, d, n) =>
          val (cn, cs, cq) = stats.getOrElse(t, (0L, 0.0, 0.0))
          val z =
            if (cn == 0) 0.0
            else {
              val mean = cs / cn
              val variance = cq / cn - mean * mean
              if (variance <= 0.0) 0.0 else (n - mean) / math.sqrt(variance)
            }
          stats(t) = (cn + 1, cs + n, cq + n.toDouble * n)
          // warm-up floor: a 1–2 day baseline has no meaningful variance —
          // flagging against it is noise (a 2-point σ can make any third
          // day a 3σ event), so a type only starts flagging once 3 closed
          // days back its baseline
          (t, d, n, z, if (math.abs(z) > 2.0 && cn >= 3) "anomaly" else "normal")
        }

        // verdicts first, into a batch-scoped overwrite dir: a retried fold
        // rewrites the same dir, never appends duplicates; the StateFold
        // commit below lands after, so a crash in between redoes the whole
        // fold idempotently
        if (verdicts.nonEmpty)
          verdicts.toDF("event_type", "day", "n_events", "z_score", "verdict")
            .coalesce(1)
            .write.mode("overwrite").parquet(s"$statePath/verdicts/batch_id=$batchId")
        (stats.toSeq.map { case (t, (n, s, q)) =>
            ("stats", t, null: String, n, s, q) } ++
          stillOpen.map { case (t, d, n) =>
            ("open", t, d, n, 0.0, 0.0) })
          .toDF("kind", "event_type", "day", "n", "s", "q")
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
