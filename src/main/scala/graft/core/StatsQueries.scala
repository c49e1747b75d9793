package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Exact distributed statistics: Pearson correlation + OLS regression
  * line per group, computed the way a 100 TB engine has to — ONE
  * partial-aggregate pass collecting exact sufficient statistics
  * (n, Σx, Σx², Σy, Σy², Σxy — associative, partition-order-proof),
  * then the closed-form estimators as a fixed tree of IEEE double ops
  * over those exact sums. Never `corr()`/`covar_samp()` built-ins:
  * their internal accumulation is float and engine-specific, so the
  * result would not be oracle-stable (the same reason §5 bans
  * AVG(DECIMAL)). The final expression tree matches the DuckDB oracle's
  * token for token, so both engines run the identical IEEE sequence.
  *
  * The y-sums carry as SCALED LONGS (y has scale 2 → Σy in centi-units,
  * Σy² in 10⁻⁴-units, Σxy in centi-units): exact at every testdata SF,
  * trivially mergeable by addition — which is what makes the fold the
  * streaming twin ([[graft.streaming.StatsStream]]) folds bit-exactly.
  * At a scale where the scaled sums outgrow a long they widen to
  * decimal sums — same shape, same mergeability.
  *
  * Semantics: per event type, does the hour of day predict event value?
  * (x = hour 0..23, y = value) — the reference dashboard's part-of-day
  * listening profile (dm_part_of_day_agg) upgraded from group means to
  * a trend line + strength-of-association.
  */
object StatsQueries {

  /** The one distributed pass: exact per-group sufficient statistics
    * over (event_type, x, y). SHARED by the batch entry and the
    * streaming fold — mergeable by plain addition of every column.
    */
  private[graft] def suffStatsOn(ev: DataFrame): DataFrame = {
    import ev.sparkSession.implicits._
    ev.select($"event_type", $"x", $"y")
      .groupBy($"event_type").agg(
        count(lit(1)).as("n"),
        sum($"x").as("sx"),
        sum($"x" * $"x").as("sxx"),
        sum(($"y" * 100).cast("long")).as("sy_c"),     // Σy in 0.01 units
        sum(($"y" * $"y" * 10000).cast("long")).as("syy_4"), // Σy² in 1e-4 units
        sum(($"x" * $"y" * 100).cast("long")).as("sxy_c"))   // Σxy in 0.01 units
  }

  private[graft] def eventsXY(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .select($"event_type", hour($"ts").cast("long").as("x"),
        $"value".cast("decimal(10,2)").as("y"))
  }

  /** The closed-form estimators over a sufficient-statistics frame —
    * SHARED serve core: exact sums → doubles, then one fixed IEEE
    * expression tree (token-for-token identical to the oracle SQL), so
    * batch and streamed statistics cannot diverge.
    */
  private[graft] def corrFrom(stats: DataFrame): DataFrame = {
    import stats.sparkSession.implicits._
    val nD   = $"n".cast("double")
    val sxD  = $"sx".cast("double")
    val sxxD = $"sxx".cast("double")
    val syD  = $"sy_c".cast("double") / 100.0
    val syyD = $"syy_4".cast("double") / 10000.0
    val sxyD = $"sxy_c".cast("double") / 100.0
    val covN = nD * sxyD - sxD * syD         // n·Σxy − Σx·Σy
    val varX = nD * sxxD - sxD * sxD         // n·Σx² − (Σx)²
    val varY = nD * syyD - syD * syD         // n·Σy² − (Σy)²
    stats.select(
      $"event_type", $"n",
      (covN / (sqrt(varX) * sqrt(varY))).as("pearson_r"),
      (covN / varX).as("slope"),
      ((syD - (covN / varX) * sxD) / nD).as("intercept"))
      .orderBy($"event_type")
  }

  def eventsValueCorr(spark: SparkSession, dir: String): DataFrame =
    corrFrom(suffStatsOn(eventsXY(spark, dir)))

  val eventsValueCorrSql: String =
    """WITH ev AS (
      |  SELECT event_type, CAST(hour(CAST(ts AS TIMESTAMP)) AS BIGINT) AS x,
      |    CAST(value AS DECIMAL(10,2)) AS y
      |  FROM events
      |), stats AS (
      |  SELECT event_type,
      |    CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(x) AS BIGINT) AS sx,
      |    CAST(SUM(x * x) AS BIGINT) AS sxx,
      |    CAST(SUM(CAST(y * 100 AS BIGINT)) AS BIGINT) AS sy_c,
      |    CAST(SUM(CAST(y * y * 10000 AS BIGINT)) AS BIGINT) AS syy_4,
      |    CAST(SUM(CAST(x * y * 100 AS BIGINT)) AS BIGINT) AS sxy_c
      |  FROM ev GROUP BY event_type
      |), d AS (
      |  SELECT event_type, n,
      |    CAST(n AS DOUBLE) AS nd, CAST(sx AS DOUBLE) AS sxd, CAST(sxx AS DOUBLE) AS sxxd,
      |    CAST(sy_c AS DOUBLE) / 100.0 AS syd,
      |    CAST(syy_4 AS DOUBLE) / 10000.0 AS syyd,
      |    CAST(sxy_c AS DOUBLE) / 100.0 AS sxyd
      |  FROM stats
      |)
      |SELECT event_type, n,
      |  (nd * sxyd - sxd * syd)
      |    / (sqrt(nd * sxxd - sxd * sxd) * sqrt(nd * syyd - syd * syd)) AS pearson_r,
      |  (nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd) AS slope,
      |  (syd - ((nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd)) * sxd) / nd AS intercept
      |FROM d
      |ORDER BY event_type""".stripMargin

  /** Next-day volume forecast by exponential smoothing (α = 1/2) over
    * each type's daily counts — the capacity-planning twin of the
    * anomaly screens (they look back for outliers; this projects
    * forward). Same exactness device as dm_trending_artists: α = 1/2
    * makes every weight a POWER OF TWO, so the smoothed sum is an exact
    * BIGINT (Σ y·2^(29−age), truncated at a 30-day horizon — the tail
    * beyond it contributes < 2⁻³⁰ of a count) and the forecast is ONE
    * final division by 2^30. Arbitrary-α SES is the same operator with
    * float weights; the dyadic form is what makes it hash-checkable.
    * The corpus max day enters as a plan-side broadcast scalar (the
    * delta_load watermark device — no collect).
    */
  def eventsForecastSes(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.events(spark, dir)
      .groupBy($"event_type", to_date($"ts").as("day"))
      .agg(count(lit(1)).as("n"))
    val mx = daily.agg(max($"day").as("max_day"))
    daily.crossJoin(broadcast(mx))
      .withColumn("age", datediff($"max_day", $"day"))
      .filter($"age" <= 29)
      .withColumn("w", pow(lit(2.0), (lit(29) - $"age").cast("double")).cast("long"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_days"),
        sum($"n" * $"w").as("forecast_scaled"))
      .withColumn("forecast_next_day", $"forecast_scaled".cast("double") / 1073741824.0)
      .orderBy($"event_type")
  }

  val eventsForecastSesSql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
      |    CAST(COUNT(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1, 2
      |), mx AS (
      |  SELECT MAX(day) AS max_day FROM daily
      |), aged AS (
      |  SELECT event_type, n,
      |    date_diff('day', day, max_day) AS age
      |  FROM daily CROSS JOIN mx
      |  WHERE date_diff('day', day, max_day) <= 29
      |)
      |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
      |  CAST(SUM(n * CAST(pow(2.0, 29 - age) AS BIGINT)) AS BIGINT) AS forecast_scaled,
      |  CAST(CAST(SUM(n * CAST(pow(2.0, 29 - age) AS BIGINT)) AS BIGINT) AS DOUBLE)
      |    / 1073741824.0 AS forecast_next_day
      |FROM aged
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_value_corr" -> (eventsValueCorr _),
    "events_forecast_ses" -> (eventsForecastSes _)
  )

  val oracleSql: Map[String, String] = Map(
    "events_value_corr" -> eventsValueCorrSql,
    "events_forecast_ses" -> eventsForecastSesSql
  )
}
