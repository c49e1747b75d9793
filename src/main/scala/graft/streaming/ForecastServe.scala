package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** §2 entries `events_forecast_ses_served` / `events_forecast_holt_served`
  * / `events_autocorr_served` — the forecast/periodicity trio SERVED FROM
  * STREAMED STATE, as driver-gated entries (round 10): the state cheaper
  * than rescan claim, measured the way the CF/mart persisted twins are
  * instead of only spec-asserted.
  *
  * Lifecycle mirrors the persisted-index entries: the first call per
  * (session, dir) folds the events through
  * [[ForecastStream.dailyFold]] in three event-id-split batches (the
  * ingest job — pre-built outside the bench's timed region, like every
  * persisted twin's save); every later call serves from the committed
  * state through the SHARED batch cores, touching ≤ types×days state
  * rows and never the event corpus. Because streamed == backfilled is
  * bit-exact (ForecastStreamSpec), all three entries are held to the
  * SAME DuckDB oracles as their batch twins — the driver gate itself
  * proves serve-from-state == rescan.
  */
object ForecastServe {

  /** Shared fold-in-thirds ingest: split the events corpus into three
    * event-id-bounded batches and fold each through `fold` (the
    * streamed-ingest simulation both state families use). An empty
    * corpus (NULL max(event_id)) skips folding entirely — the serve
    * then degrades to the batch twin's empty-frame shape instead of
    * NPEing on head().getLong(0).
    */
  private def foldInThirds(ev: DataFrame, p: String,
      fold: (DataFrame, String, Long) => Unit): Unit = {
    val maxRow = ev.agg(max(col("event_id"))).head()
    if (!maxRow.isNullAt(0)) {
      val maxId = maxRow.getLong(0)
      val cuts = Seq(maxId / 3, 2 * maxId / 3, maxId)
      cuts.zip(-1L +: cuts.dropRight(1)).zipWithIndex.foreach { case ((hi, lo), i) =>
        fold(ev.filter(col("event_id") > lo && col("event_id") <= hi), p, i.toLong)
      }
    }
  }

  private val builtStates =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), String]

  private def statePathFor(spark: SparkSession, dir: String): String =
    builtStates.synchronized {
      builtStates.getOrElseUpdate((spark, dir), {
        val p = s"${System.getProperty("java.io.tmpdir")}/graft_forecast_state_" +
          graft.Tables.dirKey(dir) +
          "_" + ProcessHandle.current().pid() +
          "_" + Integer.toHexString(System.identityHashCode(spark))
        foldInThirds(Tables.events(spark, dir), p,
          (b, sp, id) => ForecastStream.dailyFold(b, sp, id))
        p
      })
    }

  def sesServed(spark: SparkSession, dir: String): DataFrame =
    ForecastStream.serveSes(spark, statePathFor(spark, dir))

  def holtServed(spark: SparkSession, dir: String): DataFrame =
    ForecastStream.serveHolt(spark, statePathFor(spark, dir))

  def acfServed(spark: SparkSession, dir: String): DataFrame =
    ForecastStream.serveAcf(spark, statePathFor(spark, dir))

  def hwServed(spark: SparkSession, dir: String): DataFrame =
    ForecastStream.serveHw(spark, statePathFor(spark, dir))

  def theilSenServed(spark: SparkSession, dir: String): DataFrame =
    ForecastStream.serveTheilSen(spark, statePathFor(spark, dir))

  def mannKendallServed(spark: SparkSession, dir: String): DataFrame =
    ForecastStream.serveMannKendall(spark, statePathFor(spark, dir))

  def seasonalityServed(spark: SparkSession, dir: String): DataFrame =
    ForecastStream.serveSeasonality(spark, statePathFor(spark, dir))

  def dispersionServed(spark: SparkSession, dir: String): DataFrame =
    ForecastStream.serveDispersion(spark, statePathFor(spark, dir))

  def hlLevelServed(spark: SparkSession, dir: String): DataFrame =
    ForecastStream.serveHlLevel(spark, statePathFor(spark, dir))

  def pettittServed(spark: SparkSession, dir: String): DataFrame =
    ForecastStream.servePettitt(spark, statePathFor(spark, dir))

  def runsTestServed(spark: SparkSession, dir: String): DataFrame =
    ForecastStream.serveRunsTest(spark, statePathFor(spark, dir))

  /** The count+value state family (one extra BIGINT per state row —
    * kept separate from the counts state so the twelve existing
    * consumers' bit-parity pins never see a schema change).
    */
  private val builtValueStates =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), String]

  private def valueStatePathFor(spark: SparkSession, dir: String): String =
    builtValueStates.synchronized {
      builtValueStates.getOrElseUpdate((spark, dir), {
        val p = s"${System.getProperty("java.io.tmpdir")}/graft_dailyvalues_state_" +
          graft.Tables.dirKey(dir) +
          "_" + ProcessHandle.current().pid() +
          "_" + Integer.toHexString(System.identityHashCode(spark))
        foldInThirds(Tables.events(spark, dir), p,
          (b, sp, id) => ForecastStream.dailyValuesFold(b, sp, id))
        p
      })
    }

  def spearmanServed(spark: SparkSession, dir: String): DataFrame =
    ForecastStream.serveSpearman(spark, valueStatePathFor(spark, dir))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_forecast_ses_served"  -> (sesServed _),
    "events_forecast_holt_served" -> (holtServed _),
    "events_autocorr_served"      -> (acfServed _),
    "events_trend_theilsen_served"    -> (theilSenServed _),
    "events_trend_mannkendall_served" -> (mannKendallServed _),
    "events_forecast_hw_served"       -> (hwServed _),
    "events_seasonality_strength_served" -> (seasonalityServed _),
    "events_dispersion_served" -> (dispersionServed _),
    "events_level_hl_served"   -> (hlLevelServed _),
    "events_changepoint_pettitt_served" -> (pettittServed _),
    "events_runs_test_served" -> (runsTestServed _),
    "events_value_spearman_served" -> (spearmanServed _)
  )

  /** The batch twins' oracles verbatim — serve-from-state is bit-equal. */
  val oracleSql: Map[String, String] = Map(
    "events_forecast_ses_served"  -> graft.core.StatsQueries.eventsForecastSesSql,
    "events_forecast_holt_served" -> graft.core.HoltForecast.eventsForecastHoltSql,
    "events_autocorr_served"      -> graft.core.StatsQueries.eventsAutocorrSql,
    "events_trend_theilsen_served"    -> graft.core.TrendQueries.eventsTrendTheilsenSql,
    "events_trend_mannkendall_served" -> graft.core.TrendQueries.eventsTrendMannKendallSql,
    "events_forecast_hw_served"       -> graft.core.HwForecast.eventsForecastHwSql,
    "events_seasonality_strength_served" ->
      graft.core.SeasonalityQueries.eventsSeasonalityStrengthSql,
    "events_dispersion_served" -> graft.core.TrendQueries.eventsDispersionSql,
    "events_level_hl_served"   -> graft.core.TrendQueries.eventsLevelHlSql,
    "events_changepoint_pettitt_served" ->
      graft.core.TrendQueries.eventsChangepointPettittSql,
    "events_runs_test_served" -> graft.core.TrendQueries.eventsRunsTestSql,
    "events_value_spearman_served" ->
      graft.core.TrendQueries.eventsValueSpearmanSql
  )
}
