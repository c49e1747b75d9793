package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming time-series state — the continuous form of the forecast /
  * periodicity trio ([[graft.core.StatsQueries.eventsForecastSes]],
  * [[graft.core.HoltForecast.eventsForecastHolt]],
  * [[graft.core.StatsQueries.eventsAutocorr]]): each micro-batch's
  * per-(type, day) event counts fold into persisted state by PLAIN
  * ADDITION (daily counts are mergeable by construction — a day split
  * across micro-batches sums to the same integer the batch scan
  * computes), and all three analytics serve from state through the
  * SHARED batch cores (`sesOn` / `holtOn` / `acfOn`) — so a streamed
  * and a backfilled corpus produce BIT-IDENTICAL forecasts and ACF
  * (exact integer state + one shared IEEE tree; ForecastStreamSpec
  * pins all three).
  *
  * State discipline is [[StatsStream.corrSink]]'s (the anomalyFold
  * contract): the per-(type, day) counts AND the (batch id, run tag)
  * guard live in ONE overwritten table — a retry of the committed batch
  * no-ops, stale state fails loudly, the guard cannot commit separately
  * from the counts it guards. State is ≤ #types × #days rows — it grows
  * with CALENDAR TIME, not data volume (a year of a 10-type stream is
  * 3 650 rows), which is what makes the collect-merge a bounded model
  * pull at 100 TB; days are stored as ISO strings so the state schema
  * stays engine-neutral.
  */
object ForecastStream {

  def dailyCountsSink(events: DataFrame, statePath: String, runTag: String = "default"): DataStreamWriter[Row] =
    events.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        dailyFold(batch, statePath, batchId, runTag)
      }

  /** The per-batch body, factored out for direct testing. Expects the
    * raw events schema; derives (event_type, day, n) exactly as the
    * batch entries do.
    */
  private[graft] def dailyFold(batch: DataFrame, statePath: String, batchId: Long,
      runTag: String = "default"): Unit =
    if (!batch.isEmpty) {
      val spark = batch.sparkSession
      import spark.implicits._
      val batchDaily: Seq[(String, String, Long)] = batch
        .groupBy($"event_type", date_format(to_date($"ts"), "yyyy-MM-dd").as("day"))
        .agg(count(lit(1)).as("n"))
        .as[(String, String, Long)].collect().toSeq
      val statePq = s"$statePath/state"
      val p = new org.apache.hadoop.fs.Path(statePq)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val prev: Seq[(String, String, String, Long, Long, String)] =
        if (fs.exists(p) && fs.listStatus(p).nonEmpty)
          spark.read.parquet(statePq)
            .select($"kind", $"event_type", $"day", $"n", $"last_batch_id", $"run_tag")
            .as[(String, String, String, Long, Long, String)]
            .collect().toSeq
        else Seq.empty
      val meta = prev.find(_._1 == "meta").map(m => (m._5, m._6))
      if (meta.exists(m => m._2 == runTag && m._1 == batchId)) {
        // retry of the last committed batch — already folded
      } else if (meta.exists(m => m._2 != runTag || m._1 > batchId)) {
        throw new IllegalStateException(
          s"dailyFold state at $statePath was last written by run '${meta.get._2}' " +
            s"batch ${meta.get._1} but received batch $batchId from run '$runTag' — " +
            "clear the state path or restore the checkpoint")
      } else {
        val prevCounts = prev.filter(_._1 == "count").map(r => ((r._2, r._3), r._4))
        val newCounts = batchDaily.map(r => ((r._1, r._2), r._3))
        val merged = (prevCounts ++ newCounts).groupBy(_._1)
          .map { case (k, rs) => (k, rs.map(_._2).sum) }.toSeq
        val rows = merged.map { case ((t, d), n) =>
          ("count", t, d, n, batchId, runTag)
        } :+ (("meta", "", "", 0L, batchId, runTag))
        rows.toDF("kind", "event_type", "day", "n", "last_batch_id", "run_tag")
          .coalesce(1).write.mode("overwrite").parquet(statePq)
      }
    }

  private def stateDaily(spark: SparkSession, statePath: String): DataFrame = {
    import spark.implicits._
    spark.read.parquet(s"$statePath/state")
      .filter($"kind" === "count")
      .select($"event_type", to_date($"day").as("day"), $"n")
  }

  /** SES forecast from the folded state — identical to the batch entry
    * on the same corpus.
    */
  def serveSes(spark: SparkSession, statePath: String): DataFrame =
    graft.core.StatsQueries.sesOn(stateDaily(spark, statePath))

  /** Holt linear-trend forecast from the folded state. */
  def serveHolt(spark: SparkSession, statePath: String): DataFrame =
    graft.core.HoltForecast.holtOn(stateDaily(spark, statePath))

  /** Lag 1–7 autocorrelation from the folded state. */
  def serveAcf(spark: SparkSession, statePath: String): DataFrame =
    graft.core.StatsQueries.acfOn(stateDaily(spark, statePath))
}
