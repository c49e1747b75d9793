package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.types._

/** Streaming Markov transition matrix — continuous form of
  * [[graft.core.EngagementQueries.eventsMarkovTransitions]]: the
  * (prev → next) event-type counts fold through foreachBatch state, with
  * the per-user LAST EVENT carried across batch boundaries so the
  * transition that spans two micro-batches (user's last event of batch k
  * → first event of batch k+1) is counted exactly once — the part a
  * naive per-batch window silently drops.
  *
  * Requires event-time-ordered delivery per user across batches (each
  * batch's events at-or-after the carried last event) — the file-ingest /
  * delta-load shape; in-batch order is recovered by the (ts, event_id)
  * window regardless.
  *
  * Scale design (round 10 — this was the repo's last unbounded driver
  * pull): the per-user last-event rows grow with the USER POPULATION,
  * so they live in a key-hash-BUCKETED table (`users/`, the
  * [[CdcStream.cdcMergeBatch]] layout), never on the driver. Boundary
  * transitions come from JOINING the batch's per-user first events
  * against the affected buckets — distributed — and only ≤ #types²
  * aggregates are ever collected. A batch rewrites only its affected
  * buckets via dynamic partition overwrite; cold buckets stay
  * byte-identical (mtime-pinned in MarkovStreamSpec).
  *
  * Exactly-once: the ≤ #types² transition counts commit through
  * [[StateFold.guarded]] (versioned atomic commit; retry no-ops, stale
  * state fails loudly). The users table is written BEFORE that commit,
  * so a crash between the two leaves a half-applied batch — each user
  * row therefore carries (`prev_type`, `last_batch_id`): a retry of
  * batch B reads a row already stamped B through its `prev_type` (the
  * value before B applied), reproducing the identical boundary counts
  * and an idempotent users rewrite (the write-ahead trick that makes
  * the two-table commit safe without a cross-table transaction).
  */
object MarkovStream {

  /** Hash buckets for the per-user last-event table; sized by user
    * population at deploy (16 is plenty at test scale — the layout, not
    * the constant, is the contract).
    */
  val userBuckets = 16

  private def bucketOf(c: Column): Column =
    pmod(xxhash64(c.cast("string")), lit(userBuckets.toLong)).cast("int")

  private val usersSchema = StructType(Seq(
    StructField("user_id", LongType), StructField("last_type", StringType),
    StructField("prev_type", StringType), StructField("last_batch_id", LongType),
    StructField("_bucket", IntegerType)))

  def markovSink(events: DataFrame, statePath: String, runTag: String = "default"): DataStreamWriter[Row] =
    events.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        markovFold(batch, statePath, batchId, runTag)
      }

  /** The per-batch body, factored out for direct testing. */
  private[graft] def markovFold(batch: DataFrame, statePath: String, batchId: Long, runTag: String = "default"): Unit =
    if (!batch.isEmpty) {
      val spark = batch.sparkSession
      import spark.implicits._
      StateFold.guarded(spark, statePath, batchId, runTag) { prev =>
        val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        // ONE distributed pass shape over the batch: ordered pairs +
        // per-user first/last; only ≤ types² aggregates are collected
        val seq = batch.select($"user_id", $"ts", $"event_id", $"event_type")
          .withColumn("next_type", lead($"event_type", 1).over(w))
          .withColumn("rn", row_number().over(w))
          .withColumn("rmax", count(lit(1)).over(Window.partitionBy($"user_id")))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          val inBatch: Seq[((String, String), Long)] = seq
            .filter($"next_type".isNotNull)
            .groupBy($"event_type", $"next_type").agg(count(lit(1)).as("n"))
            .as[(String, String, Long)].collect().map(r => ((r._1, r._2), r._3)).toSeq
          val firsts = seq.filter($"rn" === 1)
            .select($"user_id", $"event_type".as("first_type"))
          val lasts = seq.filter($"rn" === $"rmax")
            .select($"user_id", $"event_type".as("last_type"))
            .withColumn("_bucket", bucketOf($"user_id"))

          val usersPath = s"$statePath/users"
          val up = new Path(usersPath)
          val fs = up.getFileSystem(spark.sparkContext.hadoopConfiguration)
          // affected buckets: the batch's users' hash dirs — ≤ userBuckets ids
          val affected = lasts.select($"_bucket").distinct()
            .collect().map(_.getInt(0)).toSeq
          val prevUsers =
            if (fs.exists(up) && fs.listStatus(up).nonEmpty)
              spark.read.parquet(usersPath).filter($"_bucket".isin(affected: _*))
            else spark.createDataFrame(
              spark.sparkContext.emptyRDD[Row], usersSchema)
          // carried last event, retry-aware: a row already stamped with
          // THIS batch id was written by a half-committed attempt — its
          // pre-batch value is prev_type
          val carried = prevUsers.select($"user_id",
            when($"last_batch_id" === batchId, $"prev_type")
              .otherwise($"last_type").as("carried"))
          // boundary transitions, DISTRIBUTED: carried last → batch first
          val boundary: Seq[((String, String), Long)] = firsts
            .join(carried, Seq("user_id"))
            .filter($"carried".isNotNull)
            .groupBy($"carried", $"first_type").agg(count(lit(1)).as("n"))
            .as[(String, String, Long)].collect().map(r => ((r._1, r._2), r._3)).toSeq

          // users write-ahead: affected buckets = untouched residents ∪
          // the batch's users (new last event, pre-batch value preserved)
          val newRows = lasts.join(carried, Seq("user_id"), "left")
            .select($"user_id", $"last_type", $"carried".as("prev_type"),
              lit(batchId).as("last_batch_id"), $"_bucket")
          val keep = prevUsers
            .join(lasts.select($"user_id"), Seq("user_id"), "left_anti")
            .select($"user_id", $"last_type", $"prev_type", $"last_batch_id", $"_bucket")
          keep.unionByName(newRows).localCheckpoint()
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_bucket")
            .parquet(usersPath)

          val prevCounts: Seq[((String, String), Long)] = prev
            .map(_.as[(String, String, Long)].collect()
              .map(r => ((r._1, r._2), r._3)).toSeq)
            .getOrElse(Seq.empty)
          (prevCounts ++ inBatch ++ boundary)
            .groupBy(_._1).map { case ((a, b), n) => (a, b, n.map(_._2).sum) }
            .toSeq.toDF("prev_type", "next_type", "n_transitions")
        } finally { seq.unpersist(); () }
      }
    }

  /** The transition matrix from folded state, through the shared
    * probability core — row-identical to the batch entry when the stream
    * has delivered the same events.
    */
  def serveTransitions(spark: SparkSession, statePath: String): DataFrame = {
    import spark.implicits._
    val counts = StateFold.readState(spark, statePath)
      .getOrElse(throw new IllegalStateException(s"no committed markov state at $statePath"))
      .select($"prev_type", $"next_type", $"n_transitions")
    graft.core.EngagementQueries.transitionProbs(counts)
  }
}
