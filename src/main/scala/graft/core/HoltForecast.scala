package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Holt linear-trend forecast of next-day event volume — the trended
  * upgrade of [[StatsQueries.eventsForecastSes]] (SES assumes a level;
  * Holt also tracks a slope, so ramping volumes aren't systematically
  * under-forecast). Completes the capacity trio with a second forward
  * projector beside the CUSUM level-shift detector.
  *
  * Exactness: with α = β = 1/2 the Holt recurrences
  * (l_t = (x_t + l_{t-1} + b_{t-1})/2, b_t = (l_t − l_{t-1})/2 + b_{t-1}/2,
  * init l₁ = x₁, b₁ = 0) make the one-step forecast l_H + b_H a LINEAR
  * filter over the window whose weights are dyadic rationals. Over a
  * fixed 14-day window the common denominator is 2²⁶, so the forecast is
  * Σ x_j·n_j (exact BIGINT, numerators precomputed once from the exact
  * Fraction recursion and embedded as literals in BOTH engines) followed
  * by ONE IEEE division — hash-checkable like the SES/trending entries.
  * The weights sum to exactly 1 (level) and 0 (trend): Holt reproduces a
  * constant series and assigns it zero slope, which the spec pins.
  *
  * The window is the last 14 CALENDAR days; a day with no events has
  * count 0, and since 0·n_j = 0 the zero-fill is free — absent day rows
  * contribute nothing to the sum, no row generation needed. (SES could
  * truncate instead because its weights are all positive; Holt's
  * alternate in sign, so the window must be calendar-complete to mean
  * "zero-count days", which it is by construction.)
  *
  * Shape: one groupBy(type, day) partial agg, the corpus max day as a
  * broadcast 1-row scalar (the delta_load watermark device), one final
  * groupBy(type) — two shuffles of at most types×14 rows.
  */
object HoltForecast {

  /** Forecast numerators (oldest j=0 … newest j=13) over 2²⁶; exact
    * impulse responses of l_H + b_H.
    */
  private val levelNum = Seq(703889L, 753027L, 777596L, 437936L, -460352L,
    -2026752L, -4146176L, -6311936L, -7487488L, -6094848L, -262144L,
    11534336L, 29360128L, 50331648L)

  /** Trend-component numerators (b_H alone) over 2²⁶ — the implied
    * daily slope.
    */
  private val trendNum = Seq(-24569L, 364229L, 558628L, 668112L, 553024L,
    46336L, -990208L, -2568192L, -4440064L, -5963776L, -6029312L,
    -3145728L, 4194304L, 16777216L)

  private val den = 67108864.0 // 2^26

  /** The filter over a (event_type, day, n) daily-count frame — shared by
    * the entry and the spec (which feeds synthetic series and checks the
    * literal weights against a direct recurrence simulation; both sides
    * are dyadic, so the comparison is exact, not tolerance-based).
    */
  private[graft] def holtOn(daily: DataFrame): DataFrame = {
    import daily.sparkSession.implicits._
    val mx = daily.agg(max($"day").as("max_day"))
    val lv = typedLit(levelNum)
    val tr = typedLit(trendNum)
    daily.crossJoin(broadcast(mx))
      .withColumn("age", datediff($"max_day", $"day"))
      .filter($"age" <= 13)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_days"),
        sum($"n" * element_at(lv, (lit(14) - $"age").cast("int"))).as("forecast_scaled"),
        sum($"n" * element_at(tr, (lit(14) - $"age").cast("int"))).as("trend_scaled"))
      .withColumn("forecast_next_day", $"forecast_scaled".cast("double") / den)
      .withColumn("trend_per_day", $"trend_scaled".cast("double") / den)
      .orderBy($"event_type")
  }

  def eventsForecastHolt(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    holtOn(Tables.events(spark, dir)
      .groupBy($"event_type", to_date($"ts").as("day"))
      .agg(count(lit(1)).as("n")))
  }

  val eventsForecastHoltSql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
      |    CAST(COUNT(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1, 2
      |), mx AS (
      |  SELECT MAX(day) AS max_day FROM daily
      |), aged AS (
      |  SELECT event_type, n, date_diff('day', day, max_day) AS age
      |  FROM daily CROSS JOIN mx
      |  WHERE date_diff('day', day, max_day) <= 13
      |), w AS (
      |  SELECT event_type, n,
      |    ([703889, 753027, 777596, 437936, -460352, -2026752, -4146176,
      |      -6311936, -7487488, -6094848, -262144, 11534336, 29360128,
      |      50331648])[14 - age] AS lw,
      |    ([-24569, 364229, 558628, 668112, 553024, 46336, -990208,
      |      -2568192, -4440064, -5963776, -6029312, -3145728, 4194304,
      |      16777216])[14 - age] AS tw
      |  FROM aged
      |)
      |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
      |  CAST(SUM(n * lw) AS BIGINT) AS forecast_scaled,
      |  CAST(SUM(n * tw) AS BIGINT) AS trend_scaled,
      |  CAST(CAST(SUM(n * lw) AS BIGINT) AS DOUBLE) / 67108864.0 AS forecast_next_day,
      |  CAST(CAST(SUM(n * tw) AS BIGINT) AS DOUBLE) / 67108864.0 AS trend_per_day
      |FROM w
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_forecast_holt" -> (eventsForecastHolt _)
  )

  val oracleSql: Map[String, String] = Map(
    "events_forecast_holt" -> eventsForecastHoltSql
  )
}
