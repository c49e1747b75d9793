package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** §2 entry `events_forecast_hw` — Holt–Winters ADDITIVE SEASONAL
  * forecast of next-day event volume, completing the smoothing ladder
  * (SES tracks a level, Holt adds a trend, HW adds the weekly cycle the
  * ACF entry measures at lag 7). A level+trend model systematically
  * misses the weekend dip / weekday peak; HW forecasts Monday FROM
  * Mondays.
  *
  * Exactness (the [[HoltForecast]] device, extended to seasonality):
  * with α = β = γ = 1/2 and period m = 7 the classic Winters
  * recurrences
  *   l_t = ((y_t − s_{t−7}) + l_{t−1} + b_{t−1}) / 2
  *   b_t = (l_t − l_{t−1}) / 2 + b_{t−1} / 2
  *   s_t = (y_t − l_t) / 2 + s_{t−7} / 2
  * initialized from the window's first week (l = week-1 mean, b = 0,
  * s_i = y_i − l) make the one-step forecast l_H + b_H + s_{H−6} a
  * LINEAR filter over a fixed H = 28-day (exactly 4-week) window. The
  * weights are exact rationals over the common denominator D = 7·2⁴²
  * (the /7 from the init mean, the 2-powers from the dyadic smoothing),
  * precomputed once from the exact Fraction recursion and embedded as
  * literals in BOTH engines; HwSpec re-derives them from a BigInt
  * rational simulation, so a transcription error cannot survive.
  * Products and sums run in DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) —
  * |w| ≈ 2.3·10¹³ would overflow a BIGINT product at ~4·10⁵ events per
  * (type, day) — and each exact sum casts to double ONCE, DuckDB
  * routing through VARCHAR (§5: its direct HUGEINT→DOUBLE cast is not
  * correctly rounded past 2⁵³). Weights sum to exactly 1 (forecast on a
  * constant series reproduces it) and 0 (its seasonal component is
  * zero), spec-pinned.
  *
  * Zero-fill is free, as in Holt: weights alternate in sign so the
  * window must be calendar-complete, and a day with no events has count
  * 0 — absent rows contribute 0·w = 0, no row generation needed.
  *
  * Shape: one corpus partial agg to (type, day, n), the max day as a
  * broadcast 1-row scalar (the delta_load watermark device), one final
  * groupBy(type) — two shuffles of at most types×28 rows.
  */
object HwForecast {

  private[graft] val H = 28
  private[graft] val period = 7

  /** Forecast numerators (oldest j=1 … newest j=28) over D = 7·2⁴²:
    * exact impulse response of l_H + b_H + s_{H−6}.
    */
  private[graft] val fcNum: Seq[Long] = Seq(
    15362586582091L, 353898189596L, -2572584126672L, -5502533467200L,
    -7063190283520L, -5889182114816L, -1444979658752L, 5059126731701L,
    1865549950180L, 2501475731664L, 1904310320192L, -422203710208L,
    -4244877106176L, -8197825900544L, 5563644133376L, 1215451955200L,
    2867132104704L, 3718482231296L, 2193994285056L, -3334958219264L,
    -13446938624000L, 4800968130560L, -3434900094976L, -2796023709696L,
    -120259084288L, 5291399708672L, 13469017440256L, 23089744183296L)

  /** Seasonal-component numerators (s_H₋₆ alone) over D — the
    * next-day day-of-week effect.
    */
  private[graft] val snNum: Seq[Long] = Seq(
    7089929981952L, -5811633569792L, -5079275339776L, -3528555495424L,
    -1203848085504L, 1502722654208L, 3785090924544L, 5105428328448L,
    554862034944L, -17777098752L, -899555786752L, -1871348498432L,
    -2533514805248L, -2410701389824L, 6496339361792L, 858725023744L,
    699005927424L, 30064771072L, -1322849927168L, -3367254360064L,
    -5772436045824L, 7696581394432L, 0L, 0L, 0L, 0L, 0L, 0L)

  /** D = 7·2⁴² — exactly representable as a double (3-bit mantissa). */
  private[graft] val den = 30786325577728.0

  /** The filter over a (event_type, day, n) daily-count frame — shared
    * by the batch entry and the streaming serve.
    */
  private[graft] def hwOn(daily: DataFrame): DataFrame = {
    import daily.sparkSession.implicits._
    val mx = daily.agg(max($"day").as("max_day"))
    val fw = typedLit(fcNum)
    val sw = typedLit(snNum)
    val nDec = $"n".cast("decimal(38,0)")
    daily.crossJoin(broadcast(mx))
      .withColumn("age", datediff($"max_day", $"day"))
      .filter($"age" <= H - 1)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_days"),
        sum(nDec * element_at(fw, (lit(H) - $"age").cast("int")).cast("decimal(38,0)"))
          .as("fc_scaled"),
        sum(nDec * element_at(sw, (lit(H) - $"age").cast("int")).cast("decimal(38,0)"))
          .as("sn_scaled"))
      .select($"event_type", $"n_days",
        ($"fc_scaled".cast("double") / den).as("forecast_next_day"),
        ($"sn_scaled".cast("double") / den).as("season_next_day"))
      .orderBy($"event_type")
  }

  def eventsForecastHw(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    hwOn(Tables.events(spark, dir)
      .groupBy($"event_type", to_date($"ts").as("day"))
      .agg(count(lit(1)).as("n")))
  }

  val eventsForecastHwSql: String = {
    val fl = fcNum.mkString("[", ", ", "]")
    val sl = snNum.mkString("[", ", ", "]")
    s"""WITH daily AS (
      |  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
      |    CAST(COUNT(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1, 2
      |), mx AS (
      |  SELECT MAX(day) AS max_day FROM daily
      |), aged AS (
      |  SELECT event_type, n, date_diff('day', day, max_day) AS age
      |  FROM daily CROSS JOIN mx
      |  WHERE date_diff('day', day, max_day) <= ${H - 1}
      |), w AS (
      |  SELECT event_type, CAST(n AS HUGEINT) AS n,
      |    CAST(($fl)[$H - age] AS HUGEINT) AS fw,
      |    CAST(($sl)[$H - age] AS HUGEINT) AS sw
      |  FROM aged
      |)
      |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
      |  CAST(CAST(SUM(n * fw) AS VARCHAR) AS DOUBLE) / 30786325577728.0 AS forecast_next_day,
      |  CAST(CAST(SUM(n * sw) AS VARCHAR) AS DOUBLE) / 30786325577728.0 AS season_next_day
      |FROM w
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_forecast_hw" -> (eventsForecastHw _))

  val oracleSql: Map[String, String] = Map(
    "events_forecast_hw" -> eventsForecastHwSql)
}
