package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming distribution-drift screen — the continuous form of
  * [[graft.etl.DataQuality.dqDriftChi2]]: the event stream's cumulative
  * per-type counts fold into persisted state per micro-batch, and the
  * chi-squared verdict against the STATIC reference window's mix is
  * recomputed from that state on demand — through the SAME scoring core
  * ([[graft.etl.DataQuality.chi2On]]), so a streamed and a backfilled
  * current window can never disagree on a verdict.
  *
  * State discipline is [[StateFold.guarded]] (round 10: the shared
  * helper replaces the hand-rolled guard): per-type cumulative counts
  * commit atomically under a versioned dir — a retry of the committed
  * batch no-ops, a stale-state/run mismatch fails loudly, and a crash
  * mid-commit can no longer lose the previous state. State is
  * ≤ #event-types rows; the only distributed pass per batch is the
  * batch's own groupBy (the bounded-pull contract).
  */
object DriftStream {

  def driftSink(events: DataFrame, statePath: String, runTag: String = "default"): DataStreamWriter[Row] =
    events.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        driftFold(batch, statePath, batchId, runTag)
      }

  /** The per-batch body, factored out for direct testing. */
  private[graft] def driftFold(batch: DataFrame, statePath: String, batchId: Long, runTag: String = "default"): Unit =
    if (!batch.isEmpty) {
      val spark = batch.sparkSession
      import spark.implicits._
      val batchCounts = batch
        .groupBy($"event_type").agg(count(lit(1)).as("n"))
        .as[(String, Long)].collect().toSeq // ≤ #types rows — bounded pull
      StateFold.guarded(spark, statePath, batchId, runTag) { prev =>
        val prevCounts = prev
          .map(_.as[(String, Long)].collect().toSeq).getOrElse(Seq.empty)
        (prevCounts ++ batchCounts)
          .groupBy(_._1).map { case (t, rs) => (t, rs.map(_._2).sum) }
          .toSeq.toDF("event_type", "n")
      }
    }

  /** Current verdicts: the folded counts against a static reference mix,
    * through the shared scoring core.
    */
  def serveDrift(spark: SparkSession, statePath: String, refCounts: DataFrame): DataFrame = {
    import spark.implicits._
    val cur = StateFold.readState(spark, statePath)
      .getOrElse(throw new IllegalStateException(s"no committed drift state at $statePath"))
      .select($"event_type", $"n".as("cur_n"))
    graft.etl.DataQuality.chi2On(refCounts, cur)
  }

  // ---- Benford screen (the dq_benford twin on a streamed order feed) ----

  /** Streaming Benford first-digit screen — the continuous form of
    * [[graft.etl.DataQuality.dqBenford]]: each order micro-batch's digit
    * counts (≤ 9 rows, the bounded pull) fold additively into
    * [[StateFold.guarded]] state; the χ² table is recomputed on demand
    * from that state through the SHARED [[graft.etl.DataQuality.benfordOn]]
    * core, so a streamed and a backfilled feed can never disagree.
    */
  def benfordSink(orders: DataFrame, statePath: String, runTag: String = "default"): DataStreamWriter[Row] =
    orders.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        benfordFold(batch, statePath, batchId, runTag)
      }

  /** The per-batch body, factored out for direct testing. */
  private[graft] def benfordFold(batch: DataFrame, statePath: String, batchId: Long, runTag: String = "default"): Unit =
    if (!batch.isEmpty) {
      val spark = batch.sparkSession
      import spark.implicits._
      val batchCounts = graft.etl.DataQuality.orderDigitCountsOf(batch)
        .as[(Int, Long)].collect().toSeq // ≤ 9 rows — bounded pull
      StateFold.guarded(spark, statePath, batchId, runTag) { prev =>
        val prevCounts = prev
          .map(_.as[(Int, Long)].collect().toSeq).getOrElse(Seq.empty)
        (prevCounts ++ batchCounts)
          .groupBy(_._1).map { case (d, rs) => (d, rs.map(_._2).sum) }
          .toSeq.toDF("digit", "n_obs")
      }
    }

  /** Current screen table from the folded digit counts, shared core. */
  def serveBenford(spark: SparkSession, statePath: String): DataFrame = {
    import spark.implicits._
    val obs = StateFold.readState(spark, statePath)
      .getOrElse(throw new IllegalStateException(s"no committed benford state at $statePath"))
      .select($"digit", $"n_obs")
    graft.etl.DataQuality.benfordOn(obs)
  }
}
