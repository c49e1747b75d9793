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
  * State discipline is [[EventsPipeline.anomalyFold]]'s: the per-type
  * cumulative counts AND the (batch id, run tag) guard live in ONE
  * overwritten table — a retry of the last committed batch no-ops, a
  * stale-state/run mismatch fails loudly, and the guard can never commit
  * separately from the counts it guards. State is ≤ #event-types rows +
  * one meta row; the only distributed pass per batch is the batch's own
  * groupBy (the bounded-pull contract).
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
      val statePq = s"$statePath/state"
      val p = new org.apache.hadoop.fs.Path(statePq)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val prev: Seq[(String, String, Long, Long, String)] =
        if (fs.exists(p) && fs.listStatus(p).nonEmpty)
          spark.read.parquet(statePq)
            .select($"kind", $"event_type", $"n", $"last_batch_id", $"run_tag")
            .as[(String, String, Long, Long, String)].collect().toSeq
        else Seq.empty
      val meta = prev.find(_._1 == "meta").map(m => (m._4, m._5))
      if (meta.exists(m => m._2 == runTag && m._1 == batchId)) {
        // retry of the last committed batch — already folded
      } else if (meta.exists(m => m._2 != runTag || m._1 > batchId)) {
        throw new IllegalStateException(
          s"driftFold state at $statePath was last written by run '${meta.get._2}' " +
            s"batch ${meta.get._1} but received batch $batchId from run '$runTag' — " +
            "clear the state path or restore the checkpoint")
      } else {
        val merged = (prev.filter(_._1 == "count").map(r => (r._2, r._3)) ++ batchCounts)
          .groupBy(_._1).map { case (t, rs) => (t, rs.map(_._2).sum) }.toSeq
        val rows = merged.map { case (t, n) => ("count", t, n, batchId, runTag) } :+
          (("meta", "", 0L, batchId, runTag))
        rows.toDF("kind", "event_type", "n", "last_batch_id", "run_tag")
          .coalesce(1).write.mode("overwrite").parquet(statePq)
      }
    }

  /** Current verdicts: the folded counts against a static reference mix,
    * through the shared scoring core.
    */
  def serveDrift(spark: SparkSession, statePath: String, refCounts: DataFrame): DataFrame = {
    import spark.implicits._
    val cur = spark.read.parquet(s"$statePath/state")
      .filter($"kind" === "count")
      .select($"event_type", $"n".as("cur_n"))
    graft.etl.DataQuality.chi2On(refCounts, cur)
  }
}
