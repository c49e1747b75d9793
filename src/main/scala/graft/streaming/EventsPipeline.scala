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
        val deduped = batch.dropDuplicates(key)
        val fresh =
          try {
            val existingKeys = batch.sparkSession.read.parquet(path).select(key)
            deduped.join(existingKeys, Seq(key), "left_anti")
          } catch {
            // first batch: warehouse path does not exist yet
            case e: org.apache.spark.sql.AnalysisException
              if e.getMessage != null && e.getMessage.contains("PATH_NOT_FOUND") =>
              deduped
            case _: java.io.FileNotFoundException =>
              deduped
          }
        fresh.withColumn("_batch_id", lit(batchId))
          .write.mode("append").parquet(path)
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
