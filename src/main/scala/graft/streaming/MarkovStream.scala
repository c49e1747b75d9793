package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

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
  * State discipline is [[EventsPipeline.anomalyFold]]'s: transition
  * counts (≤ #types² rows), per-user last-event rows, and the (batch id,
  * run tag) guard commit in ONE overwritten table — a retry of the
  * committed batch no-ops, stale state fails loudly. Per batch the only
  * event-row pass is the batch's own window + groupBy; state I/O is
  * O(users + types²) (at real scale the per-user rows bucketize like the
  * SCD2 sink's warehouse). Serving goes through the SHARED
  * transitionProbs core, so streamed == backfilled bit-for-bit.
  */
object MarkovStream {

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
      val statePq = s"$statePath/state"
      val p = new org.apache.hadoop.fs.Path(statePq)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val prev: Seq[(String, String, String, Long, Long, String, Long, String)] =
        if (fs.exists(p) && fs.listStatus(p).nonEmpty)
          spark.read.parquet(statePq)
            .select($"kind", $"k1", $"k2", $"n", $"uid", $"last_type",
              $"last_batch_id", $"run_tag")
            .as[(String, String, String, Long, Long, String, Long, String)]
            .collect().toSeq
        else Seq.empty
      val meta = prev.find(_._1 == "meta").map(m => (m._7, m._8))
      if (meta.exists(m => m._2 == runTag && m._1 == batchId)) {
        // retry of the last committed batch — already folded
      } else if (meta.exists(m => m._2 != runTag || m._1 > batchId)) {
        throw new IllegalStateException(
          s"markovFold state at $statePath was last written by run '${meta.get._2}' " +
            s"batch ${meta.get._1} but received batch $batchId from run '$runTag' — " +
            "clear the state path or restore the checkpoint")
      } else {
        val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        // one distributed pass over the batch: ordered pairs + per-user
        // first/last, then bounded pulls (≤ types² + 2·batch-users rows)
        val seq = batch.select($"user_id", $"ts", $"event_id", $"event_type")
          .withColumn("next_type", lead($"event_type", 1).over(w))
          .withColumn("rn", row_number().over(w))
          .withColumn("rmax", count(lit(1)).over(Window.partitionBy($"user_id")))
        val inBatch: Seq[((String, String), Long)] = seq
          .filter($"next_type".isNotNull)
          .groupBy($"event_type", $"next_type").agg(count(lit(1)).as("n"))
          .as[(String, String, Long)].collect().map(r => ((r._1, r._2), r._3)).toSeq
        val firsts: Map[Long, String] = seq.filter($"rn" === 1)
          .select($"user_id", $"event_type")
          .as[(Long, String)].collect().toMap
        val lasts: Map[Long, String] = seq.filter($"rn" === $"rmax")
          .select($"user_id", $"event_type")
          .as[(Long, String)].collect().toMap

        val prevLast = prev.filter(_._1 == "user").map(r => r._5 -> r._6).toMap
        // boundary transitions: carried last event → batch's first event
        val boundary = firsts.toSeq.flatMap { case (uid, first) =>
          prevLast.get(uid).map(lt => ((lt, first), 1L))
        }
        val mergedCounts = (prev.filter(_._1 == "count")
            .map(r => ((r._2, r._3), r._4)) ++ inBatch ++ boundary)
          .groupBy(_._1).map { case (k, rs) => (k, rs.map(_._2).sum) }.toSeq
        val mergedLast = prevLast ++ lasts
        val rows =
          mergedCounts.map { case ((a, b), n) => ("count", a, b, n, 0L, "", batchId, runTag) } ++
            mergedLast.map { case (uid, t) => ("user", "", "", 0L, uid, t, batchId, runTag) } :+
            (("meta", "", "", 0L, 0L, "", batchId, runTag))
        rows.toDF("kind", "k1", "k2", "n", "uid", "last_type", "last_batch_id", "run_tag")
          .coalesce(1).write.mode("overwrite").parquet(statePq)
      }
    }

  /** The transition matrix from folded state, through the shared
    * probability core — row-identical to the batch entry when the stream
    * has delivered the same events.
    */
  def serveTransitions(spark: SparkSession, statePath: String): DataFrame = {
    import spark.implicits._
    val counts = spark.read.parquet(s"$statePath/state")
      .filter($"kind" === "count")
      .select($"k1".as("prev_type"), $"k2".as("next_type"), $"n".as("n_transitions"))
    graft.core.EngagementQueries.transitionProbs(counts)
  }
}
