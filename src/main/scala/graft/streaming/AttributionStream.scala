package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.types._

/** Streaming last-touch attribution — continuous form of
  * [[graft.core.AttributionQueries.eventsAttributionChannel]]: the
  * channel revenue rollup folds through [[StateFold.guarded]] state
  * while the per-user RECENT-TOUCH set (every touch still inside the
  * 7-day lookback of any future purchase) carries across batch
  * boundaries — the part a naive per-batch join silently drops (a
  * purchase early in batch k+1 whose last qualifying touch landed in
  * batch k would mis-attribute to `direct`).
  *
  * Delivery contract as [[MarkovStream]]: event-time-ordered per user
  * across batches (each batch's events at-or-after the user's carried
  * horizon) — the file-ingest / delta-load shape. Under it, a later
  * batch can never deliver a touch that qualifies for an
  * already-attributed purchase (its ts is ≥ the purchase's, and the
  * window is strict `t_ts < p_ts`), so attributing each purchase in
  * its arrival batch is exact.
  *
  * Scale design: recent touches grow with the user population, so they
  * live in a key-hash-BUCKETED table (`touches/`, the MarkovStream
  * `users/` layout), never on the driver. A batch joins its purchases
  * against the affected buckets ∪ its own touches — distributed — and
  * only the ≤ #channels rollup rows ever reach the StateFold commit.
  * Each batch rewrites only its users' buckets via dynamic partition
  * overwrite and prunes each user's touches to their own
  * (horizon − lookback) — bounded by touch rate × 7 days per user,
  * the same bound that keeps the batch twin's range join linear.
  *
  * Exactly-once WITHOUT the Markov batch-stamp trick: the touch table
  * is written ahead of the rollup commit, and a crash between the two
  * re-runs the fold with the batch's touches ALREADY resident — but
  * last-touch credit is an argmax over (t_ts_sec, touch_id), and an
  * argmax is invariant under duplication, so the retry derives
  * bit-identical credits; the table itself dedups on union. Retry of a
  * committed batch no-ops and a stale/foreign batch fails loudly via
  * the shared guard.
  */
object AttributionStream {

  val lookbackSec: Long = graft.core.AttributionQueries.lookbackSec

  /** Hash buckets for the recent-touch table; sized by user population
    * at deploy (16 at test scale — the layout is the contract, not the
    * constant).
    */
  val touchBuckets = 16

  private def bucketOf(c: Column): Column =
    pmod(xxhash64(c.cast("string")), lit(touchBuckets.toLong)).cast("int")

  private val touchesSchema = StructType(Seq(
    StructField("user_id", LongType), StructField("touch_id", LongType),
    StructField("touch_type", StringType), StructField("t_ts_sec", LongType),
    StructField("_bucket", IntegerType)))

  def attributionSink(events: DataFrame, statePath: String,
      runTag: String = "default"): DataStreamWriter[Row] =
    events.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        attributionFold(batch, statePath, batchId, runTag)
      }

  /** The per-batch body, factored out for direct testing. Expects raw
    * event rows (event_id, user_id, event_type, ts, value).
    */
  private[graft] def attributionFold(batch: DataFrame, statePath: String,
      batchId: Long, runTag: String = "default"): Unit =
    if (!batch.isEmpty) {
      val spark = batch.sparkSession
      import spark.implicits._
      StateFold.guarded(spark, statePath, batchId, runTag) { prev =>
        val ev = batch.select($"event_id", $"user_id", $"event_type",
            unix_timestamp($"ts").as("ts_sec"), $"value")
          .localCheckpoint() // probed by purchases, touches, and horizons
        val purchases = ev.filter($"event_type" === "purchase")
          .select($"event_id".as("purchase_id"), $"user_id",
            $"ts_sec".as("p_ts_sec"),
            ($"value".cast("decimal(10,2)") * 100).cast("long").as("value_cents"))
        val batchTouches = ev.filter($"event_type".isin("click", "view"))
          .select($"user_id", $"event_id".as("touch_id"),
            $"event_type".as("touch_type"), $"ts_sec".as("t_ts_sec"))
          .withColumn("_bucket", bucketOf($"user_id"))

        val touchesPath = s"$statePath/touches"
        val tp = new Path(touchesPath)
        val fs = tp.getFileSystem(spark.sparkContext.hadoopConfiguration)
        // affected buckets: every batch user's hash dir — ≤ touchBuckets ids
        val affected = ev.select(bucketOf($"user_id").as("_bucket")).distinct()
          .collect().map(_.getInt(0)).toSeq
        val prevTouches =
          if (graft.ops.AtomicRewrite.hasCommittedFiles(fs, tp))
            spark.read.parquet(touchesPath).filter($"_bucket".isin(affected: _*))
          else spark.createDataFrame(spark.sparkContext.emptyRDD[Row], touchesSchema)

        // candidate touch set for THIS batch's purchases: carried state ∪
        // in-batch; distinct makes the half-committed retry (batch
        // touches already resident) see the same multiset-free max
        val allTouches = prevTouches.select($"user_id", $"touch_id", $"touch_type", $"t_ts_sec")
          .unionByName(batchTouches.drop("_bucket"))
          .distinct()
          .localCheckpoint() // probed by the credit join AND the rewrite below

        // last-touch credit: argmax by (t_ts_sec, touch_id) — the batch
        // core's ORDER BY t_ts_sec DESC, touch_id DESC pick; zero-touch
        // purchases survive the left join as the 'direct' channel
        val credited = purchases.join(allTouches
            .select($"user_id", $"touch_id", $"touch_type", $"t_ts_sec"),
            purchases("user_id") === allTouches("user_id") &&
              $"t_ts_sec" < $"p_ts_sec" &&
              $"t_ts_sec" >= $"p_ts_sec" - lookbackSec,
            "left")
          .groupBy($"purchase_id", $"value_cents")
          .agg(max(struct($"t_ts_sec", $"touch_id", $"touch_type")).as("lt"))
          .select($"purchase_id", $"value_cents",
            coalesce($"lt.touch_type", lit("direct")).as("channel"))
        val lastDelta = credited.groupBy($"channel")
          .agg(count(lit(1)).as("n"), sum($"value_cents").as("cents"))
          .select(lit("last").as("model"), $"channel", $"n", $"cents")
        // position (U-shaped) credit through the SHARED batch core —
        // one touch store, two credit models: the model is a
        // deterministic function of each purchase's qualifying touch
        // SET, so it inherits the same crash-window invariance as the
        // argmax (the retry sees the identical deduped set)
        val positionDelta = graft.core.AttributionQueries
          .positionChannelRollupOn(purchases,
            allTouches.withColumnRenamed("user_id", "t_user_id"))
          .select(lit("position").as("model"), $"channel",
            $"n_credits".as("n"), $"attributed_cents".as("cents"))
        val delta = lastDelta.unionByName(positionDelta)

        // touches write-ahead: untouched residents ∪ (residents + batch
        // touches of batch users), pruned per USER to their batch MIN
        // event time − lookback. The floor must be the batch min, not
        // the max: future purchases have p_ts ≥ the user's max under
        // the delivery contract, but a RETRY re-delivers this batch's
        // own purchases with p_ts as old as the batch min — pruning by
        // the max dropped carried touches those purchases still needed
        // and shifted their credit to 'direct' on the crash-window
        // path. Retention stays bounded: batch span + 7 days per user.
        val horizons = ev.groupBy($"user_id").agg(min($"ts_sec").as("floor_ts"))
        val batchUsers = horizons.select($"user_id")
        val keep = prevTouches
          .join(batchUsers, Seq("user_id"), "left_anti")
          .select($"user_id", $"touch_id", $"touch_type", $"t_ts_sec", $"_bucket")
        val rewritten = allTouches
          .join(horizons, Seq("user_id"))
          .filter($"t_ts_sec" >= $"floor_ts" - lookbackSec)
          .select($"user_id", $"touch_id", $"touch_type", $"t_ts_sec",
            bucketOf($"user_id").as("_bucket"))
        val nextTouches = keep.unionByName(rewritten).localCheckpoint()
        nextTouches
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("_bucket")
          .parquet(touchesPath)
        // dynamic overwrite writes nothing for an affected bucket whose
        // rewrite came out EMPTY (every carried touch expired, no new
        // ones) — its stale rows would survive on disk and break the
        // retention bound, so emptied dirs are removed explicitly (the
        // deleteKeysFromPartitionedTable device)
        val liveBuckets = nextTouches.select($"_bucket").distinct()
          .collect().map(_.getInt(0)).toSet
        affected.filterNot(liveBuckets)
          .foreach(b => fs.delete(new Path(s"$touchesPath/_bucket=$b"), true))

        // rollup merge: exact BIGINT counts and cents are additive per
        // (model, channel) — each purchase is credited exactly once, in
        // its arrival batch, under both models
        prev.map(_.unionByName(delta)).getOrElse(delta)
          .groupBy($"model", $"channel")
          .agg(sum($"n").as("n"), sum($"cents").as("cents"))
      }
    }

  private def serveModel(spark: SparkSession, statePath: String, model: String): DataFrame = {
    import spark.implicits._
    StateFold.readState(spark, statePath)
      .getOrElse(throw new IllegalStateException(
        s"no committed attribution state at $statePath"))
      .filter($"model" === model)
      .select($"channel", $"n", $"cents")
  }

  /** The last-touch channel rollup from folded state — row-identical to
    * the batch entry when the stream has delivered the same events.
    */
  def serveChannels(spark: SparkSession, statePath: String): DataFrame = {
    import spark.implicits._
    serveModel(spark, statePath, "last")
      .select($"channel", $"n".as("n_purchases"), $"cents".as("attributed_cents"))
      .orderBy($"channel")
  }

  /** The position-model rollup from folded state — row-identical to
    * `events_attribution_position` (the batch entry's n_credits > 0
    * filter re-applied: a zero-credit channel row can only be an
    * all-zero direct row, which the batch entry drops too).
    */
  def servePositionChannels(spark: SparkSession, statePath: String): DataFrame = {
    import spark.implicits._
    serveModel(spark, statePath, "position")
      .select($"channel", $"n".as("n_credits"), $"cents".as("attributed_cents"))
      .filter($"n_credits" > 0)
      .orderBy($"channel")
  }
}
