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
  * State discipline is [[StateFold.guarded]] (round 10: the shared
  * helper replaces the hand-rolled guard, and its versioned commit
  * closes the delete-then-write window this sink's in-place overwrite
  * had — a crash mid-commit previously lost ALL prior daily counts and
  * a replayed batch then folded as if fresh). State is ≤ #types ×
  * #days rows — it grows with CALENDAR TIME, not data volume (a year
  * of a 10-type stream is 3 650 rows), which is what makes the
  * collect-merge a bounded model pull at 100 TB; days are stored as
  * ISO strings so the state schema stays engine-neutral.
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
      StateFold.guarded(spark, statePath, batchId, runTag) { prev =>
        val prevCounts = prev
          .map(_.as[(String, String, Long)].collect().toSeq).getOrElse(Seq.empty)
        (prevCounts.map(r => ((r._1, r._2), r._3)) ++
            batchDaily.map(r => ((r._1, r._2), r._3)))
          .groupBy(_._1).map { case ((t, d), rs) => (t, d, rs.map(_._2).sum) }
          .toSeq.toDF("event_type", "day", "n")
      }
    }

  private def stateDaily(spark: SparkSession, statePath: String): DataFrame = {
    import spark.implicits._
    StateFold.readState(spark, statePath)
      .getOrElse(throw new IllegalStateException(s"no committed daily state at $statePath"))
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

  /** Holt–Winters seasonal forecast from the folded state. */
  def serveHw(spark: SparkSession, statePath: String): DataFrame =
    graft.core.HwForecast.hwOn(stateDaily(spark, statePath))

  /** Theil–Sen robust trend slope from the folded state. */
  def serveTheilSen(spark: SparkSession, statePath: String): DataFrame =
    graft.core.TrendQueries.theilSenOn(stateDaily(spark, statePath))

  /** Mann–Kendall trend test from the folded state. */
  def serveMannKendall(spark: SparkSession, statePath: String): DataFrame =
    graft.core.TrendQueries.mannKendallOn(stateDaily(spark, statePath))

  /** Day-of-week seasonality strength (η²) from the folded state. */
  def serveSeasonality(spark: SparkSession, statePath: String): DataFrame =
    graft.core.SeasonalityQueries.seasonalityOn(stateDaily(spark, statePath))

  /** Index of dispersion (burstiness) from the folded state. */
  def serveDispersion(spark: SparkSession, statePath: String): DataFrame =
    graft.core.TrendQueries.dispersionOn(stateDaily(spark, statePath))

  /** Hodges–Lehmann robust level from the folded state. */
  def serveHlLevel(spark: SparkSession, statePath: String): DataFrame =
    graft.core.TrendQueries.hlLevelOn(stateDaily(spark, statePath))

  /** Pettitt changepoint test from the folded state. */
  def servePettitt(spark: SparkSession, statePath: String): DataFrame =
    graft.core.TrendQueries.pettittOn(stateDaily(spark, statePath))

  /** Wald–Wolfowitz runs test from the folded state. */
  def serveRunsTest(spark: SparkSession, statePath: String): DataFrame =
    graft.core.TrendQueries.runsTestOn(stateDaily(spark, statePath))

  /** The daily count+VALUE fold — the two-column sibling of
    * [[dailyFold]] for analytics that need revenue beside volume
    * (Spearman rank correlation): per-(type, day) counts AND exact
    * cents sums, both mergeable by plain addition, same
    * [[StateFold.guarded]] discipline and the same calendar-bounded
    * state shape (one extra BIGINT per row).
    */
  def dailyValuesSink(events: DataFrame, statePath: String, runTag: String = "default"): DataStreamWriter[Row] =
    events.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        dailyValuesFold(batch, statePath, batchId, runTag)
      }

  private[graft] def dailyValuesFold(batch: DataFrame, statePath: String, batchId: Long,
      runTag: String = "default"): Unit =
    if (!batch.isEmpty) {
      val spark = batch.sparkSession
      import spark.implicits._
      val batchDaily: Seq[(String, String, Long, Long)] = batch
        .groupBy($"event_type", date_format(to_date($"ts"), "yyyy-MM-dd").as("day"))
        .agg(count(lit(1)).as("n"),
          sum(($"value".cast("decimal(10,2)") * 100).cast("long")).as("v"))
        .as[(String, String, Long, Long)].collect().toSeq
      StateFold.guarded(spark, statePath, batchId, runTag) { prev =>
        val prevRows = prev
          .map(_.as[(String, String, Long, Long)].collect().toSeq).getOrElse(Seq.empty)
        (prevRows ++ batchDaily)
          .groupBy(r => (r._1, r._2))
          .map { case ((t, d), rs) => (t, d, rs.map(_._3).sum, rs.map(_._4).sum) }
          .toSeq.toDF("event_type", "day", "n", "v")
      }
    }

  private def stateDailyValues(spark: SparkSession, statePath: String): DataFrame = {
    import spark.implicits._
    StateFold.readState(spark, statePath)
      .getOrElse(throw new IllegalStateException(s"no committed daily-values state at $statePath"))
      .select($"event_type", to_date($"day").as("day"), $"n", $"v")
  }

  /** Spearman volume/revenue rank correlation from the folded state. */
  def serveSpearman(spark: SparkSession, statePath: String): DataFrame =
    graft.core.TrendQueries.spearmanOn(stateDailyValues(spark, statePath))
}
