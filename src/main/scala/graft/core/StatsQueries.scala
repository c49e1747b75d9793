package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Exact distributed statistics: Pearson correlation + OLS regression
  * line per group, computed the way a 100 TB engine has to — ONE
  * partial-aggregate pass collecting exact sufficient statistics
  * (n, Σx, Σx², Σy, Σy², Σxy as longs/decimals: associative, partition-
  * order-proof), then the closed-form estimators as a fixed tree of IEEE
  * double ops over those exact sums. Never `corr()`/`covar_samp()`
  * built-ins: their internal accumulation is float and engine-specific,
  * so the result would not be oracle-stable (the same reason §5 bans
  * AVG(DECIMAL)). The final expression tree matches the DuckDB oracle's
  * token for token, so both engines run the identical IEEE sequence.
  *
  * Semantics: per event type, does the hour of day predict event value?
  * (x = hour 0..23, y = value) — the reference dashboard's part-of-day
  * listening profile (dm_part_of_day_agg) upgraded from group means to a
  * trend line + strength-of-association.
  */
object StatsQueries {

  def eventsValueCorr(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select($"event_type", hour($"ts").cast("long").as("x"),
        $"value".cast("decimal(10,2)").as("y"))
    val stats = ev.groupBy($"event_type").agg(
      count(lit(1)).as("n"),
      sum($"x").as("sx"),
      sum($"x" * $"x").as("sxx"),
      sum($"y").cast("double").as("sy"),
      sum($"y" * $"y").cast("double").as("syy"),
      sum($"x".cast("decimal(4,0)") * $"y").cast("double").as("sxy"))
    // exact sums → doubles, then one fixed IEEE expression tree (token-
    // for-token identical to the oracle SQL below)
    val nD  = $"n".cast("double")
    val sxD = $"sx".cast("double")
    val sxxD = $"sxx".cast("double")
    val covN = nD * $"sxy" - sxD * $"sy"         // n·Σxy − Σx·Σy
    val varX = nD * sxxD - sxD * sxD             // n·Σx² − (Σx)²
    val varY = nD * $"syy" - $"sy" * $"sy"       // n·Σy² − (Σy)²
    stats.select(
      $"event_type", $"n",
      (covN / (sqrt(varX) * sqrt(varY))).as("pearson_r"),
      (covN / varX).as("slope"),
      (($"sy" - (covN / varX) * sxD) / nD).as("intercept"))
      .orderBy($"event_type")
  }

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
      |    CAST(SUM(y) AS DOUBLE) AS sy,
      |    CAST(SUM(y * y) AS DOUBLE) AS syy,
      |    CAST(SUM(CAST(x AS DECIMAL(4,0)) * y) AS DOUBLE) AS sxy
      |  FROM ev GROUP BY event_type
      |)
      |SELECT event_type, n,
      |  (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
      |    / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |       * sqrt(CAST(n AS DOUBLE) * syy - sy * sy)) AS pearson_r,
      |  (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
      |    / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS slope,
      |  (sy - ((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
      |    / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
      |    * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) AS intercept
      |FROM stats
      |ORDER BY event_type""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_value_corr" -> (eventsValueCorr _)
  )

  val oracleSql: Map[String, String] = Map(
    "events_value_corr" -> eventsValueCorrSql
  )
}
