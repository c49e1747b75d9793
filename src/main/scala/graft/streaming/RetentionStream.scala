package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.types._

/** Streaming retention bitmaps — continuous form of
  * [[graft.core.BehaviorQueries.eventsRetentionBitmap]]: the per-user
  * active-day SET folds through foreachBatch state, and serving collapses
  * the state to masks through the SAME shared core as the batch entry,
  * so serve-from-state == rescan bit-for-bit (the `_served` entry is
  * held to the batch twin's DuckDB oracle verbatim).
  *
  * Why this fold is the easy member of the bucketed-state family: the
  * state is a SET of (user_id, day_num) pairs and set union is
  * idempotent, commutative, and associative — a crash-window retry
  * re-unions the same pairs into a table that already holds them (no
  * Markov-style write-ahead stamp needed), and delivery order across
  * batches is irrelevant (late events for old days still land, as long
  * as their day is inside the retention window of the then-current
  * frontier — outside it they would be invisible to the batch twin's
  * rollup too, see the prune note).
  *
  * Scale design: per-user day rows grow with the user population, so
  * they live in a key-hash-BUCKETED table (`days/`, the
  * [[MarkovStream]] users/ layout); a batch rewrites only its affected
  * buckets via dynamic partition overwrite (cold buckets byte-stable),
  * merging `distinct` pre-aggregated batch days — ≤ users×63 ids-only
  * rows per bucket. The day-window PRUNE (day < frontier − 62) applies
  * at rewrite time to affected buckets and again at serve time
  * globally, so a stale cold bucket can never leak an out-of-window day
  * into the rollup; the frontier is MONOTONE (kept in the StateFold
  * row), so a pruned day can never become visible again — deleting it
  * is safe, which is what keeps per-user state bounded at 63 days
  * forever. Exactly-once: the 1-row (frontier, n_user_days) watermark
  * commits through [[StateFold.guarded]] AFTER the days write — the
  * crash window between them heals because the union is idempotent.
  */
object RetentionStream {

  val userBuckets = 16

  private def bucketOf(c: Column): Column =
    pmod(xxhash64(c.cast("string")), lit(userBuckets.toLong)).cast("int")

  private val daysSchema = StructType(Seq(
    StructField("user_id", LongType), StructField("day_num", LongType),
    StructField("_bucket", IntegerType)))

  def retentionSink(events: DataFrame, statePath: String, runTag: String = "default"): DataStreamWriter[Row] =
    events.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        retentionFold(batch, statePath, batchId, runTag)
      }

  /** The per-batch body, factored out for direct testing. */
  private[graft] def retentionFold(batch: DataFrame, statePath: String, batchId: Long,
      runTag: String = "default"): Unit =
    if (!batch.isEmpty) {
      val spark = batch.sparkSession
      import spark.implicits._
      StateFold.guarded(spark, statePath, batchId, runTag) { prev =>
        val batchDays = batch
          .select($"user_id", expr("unix_timestamp(ts) div 86400").as("day_num"))
          .distinct()
          .withColumn("_bucket", bucketOf($"user_id"))
          .localCheckpoint() // read for frontier, affected set, and merge
        val batchMax = batchDays.agg(max($"day_num")).head().getLong(0)
        val prevFrontier = prev.map(_.select($"frontier").head().getLong(0))
        val frontier = prevFrontier.fold(batchMax)(math.max(_, batchMax))

        val daysPath = s"$statePath/days"
        val dp = new Path(daysPath)
        val fs = dp.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val affected = batchDays.select($"_bucket").distinct()
          .collect().map(_.getInt(0)).toSeq
        val prevDays =
          if (graft.ops.AtomicRewrite.hasCommittedFiles(fs, dp))
            spark.read.parquet(daysPath).filter($"_bucket".isin(affected: _*))
          else spark.createDataFrame(spark.sparkContext.emptyRDD[Row], daysSchema)
        // set union + the monotone-frontier prune: idempotent under any
        // crash-window retry, bounded at 63 days per user forever
        prevDays.unionByName(batchDays).distinct()
          .filter($"day_num" >= frontier - 62L)
          .localCheckpoint()
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("_bucket")
          .parquet(daysPath)

        Seq((frontier, batchId)).toDF("frontier", "last_batch_id")
      }
    }

  /** The retention rollup SERVED from folded state — the shared
    * [[graft.core.BehaviorQueries.retentionBitmapOn]] core over the
    * state's (user_id, day_num) pairs, with the serve-time window
    * filter re-applied so stale cold-bucket days (written before the
    * frontier advanced past them) can never leak in.
    */
  def serveRetention(spark: SparkSession, statePath: String): DataFrame = {
    import spark.implicits._
    val frontier = StateFold.readState(spark, statePath)
      .map(_.select($"frontier").head().getLong(0))
      .getOrElse(throw new IllegalStateException(
        s"no committed retention state at $statePath"))
    val days = spark.read.parquet(s"$statePath/days")
      .filter($"day_num" >= frontier - 62L)
      .select($"user_id", $"day_num")
    graft.core.BehaviorQueries.retentionBitmapOn(days)
  }
}
