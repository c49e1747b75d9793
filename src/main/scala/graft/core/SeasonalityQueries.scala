package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2 entry `events_seasonality_strength` — the variance-explained
  * screen UNDER the Holt–Winters seasonal forecast: per event type, the
  * share of daily-volume variance explained by the day-of-week means
  * (the one-way-ANOVA η² with day-of-week as the factor). HW assumes a
  * weekly cycle and the ACF measures one lag at a time; η² is the single
  * number that says how much of the series a weekly profile captures at
  * all — the justification you quote before fitting the seasonal model
  * (η² ≈ 0 → Holt without the season term is the right ladder rung).
  *
  * Scale shape: the shared one-pass daily collapse (≤ types×days rows),
  * then ONE aggregation to the (type, dow) grain — ≤ 7 rows per type —
  * and a conditional-aggregation pivot of those ≤ 7 group terms into
  * fixed columns. Nothing after the first pass touches corpus rows.
  *
  * Exactness (hash-gate): day-of-week is pure integer arithmetic
  * (days since Monday 1970-01-05 mod 7 — no engine dayofweek()
  * convention in play). Within-group and total sums of squares stay in
  * BIGINT via the n·Σx² − (Σx)² form; each group's SS contributes ONE
  * correctly-rounded divide, and the ≤ 7 terms add LEFT-ASSOCIATIVELY
  * through explicit pivot columns — the one place a SUM() over doubles
  * would have let engine aggregation order leak into the hash. A
  * constant series (SS_tot = 0) emits NULL η² in both engines. BIGINT
  * bounds: (Σn)² exact to ~3·10⁹ events per (type, dow); past that the
  * sums move to DECIMAL(38,0), the plan unchanged. The
  * `weekly_seasonal` flag uses η² > 0.2 (a conventional medium-effect
  * cut — the number itself is the deliverable, the flag a convenience).
  * Reference anchor: the weekday listening profile behind the
  * reference dashboard's seasonality heatmap
  * (dashboard_queries.py:30-47 month/year grains; dm_ddl.sql daily
  * views).
  */
object SeasonalityQueries {

  /** η² over a (event_type, day, n) daily frame — shared by the batch
    * entry and the streamed-state serve.
    */
  private[graft] def seasonalityOn(daily: DataFrame): DataFrame = {
    import daily.sparkSession.implicits._
    // Monday-anchored day-of-week: engine-neutral integer arithmetic.
    val dowed = daily.withColumn("dow",
      pmod(datediff($"day", to_date(lit("1970-01-05"))).cast("long"), lit(7L)))
    val groups = dowed.groupBy($"event_type", $"dow").agg(
      count(lit(1)).as("n_g"),
      sum($"n").as("s_g"),
      sum($"n" * $"n").as("q_g"))
    // Per-dow within-group SS as ONE divide: (n_g·q_g − s_g²)/n_g.
    val withTerm = groups.withColumn("w_g",
      ($"n_g" * $"q_g" - $"s_g" * $"s_g").cast("double") / $"n_g".cast("double"))
    // Pivot ≤ 7 rows into fixed columns so the double additions below are
    // an explicit left-associative tree, not an order-free SUM().
    val pivotAggs =
      Seq(sum($"n_g").as("n_days"), sum($"s_g").as("s_tot"), sum($"q_g").as("q_tot")) ++
        (0 to 6).map(g =>
          coalesce(max(when($"dow" === g.toLong, $"w_g")), lit(0.0)).as(s"w_$g"))
    val pivoted = withTerm.groupBy($"event_type").agg(pivotAggs.head, pivotAggs.tail: _*)
    val ssw = (0 to 6).map(g => col(s"w_$g")).reduceLeft(_ + _)
    val sst = ($"n_days" * $"q_tot" - $"s_tot" * $"s_tot").cast("double") /
      $"n_days".cast("double")
    pivoted
      .withColumn("ss_within", ssw)
      .withColumn("ss_total", sst)
      .withColumn("eta2",
        when($"ss_total" > 0.0, lit(1.0) - $"ss_within" / $"ss_total"))
      .withColumn("weekly_seasonal",
        when($"eta2".isNull, lit(null).cast("boolean")).otherwise($"eta2" > 0.2))
      .select($"event_type", $"n_days", $"ss_total", $"ss_within",
        $"eta2", $"weekly_seasonal")
      .orderBy($"event_type")
  }

  def eventsSeasonalityStrength(spark: SparkSession, dir: String): DataFrame =
    seasonalityOn(TrendQueries.dailyOf(spark, dir))

  val eventsSeasonalityStrengthSql: String = {
    val wCols = (0 to 6).map(g =>
      s"""    COALESCE(MAX(CASE WHEN dow = $g THEN w_g END), 0.0) AS w_$g""")
      .mkString(",\n")
    val sswExpr = (0 to 6).map(g => s"w_$g").mkString(" + ")
    s"""WITH daily AS (
      |  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
      |    CAST(COUNT(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1, 2
      |), dowed AS (
      |  SELECT event_type, n,
      |    CAST(date_diff('day', DATE '1970-01-05', day) AS BIGINT) % 7 AS dow
      |  FROM daily
      |), groups AS (
      |  SELECT event_type, dow,
      |    CAST(COUNT(*) AS BIGINT) AS n_g,
      |    CAST(SUM(n) AS BIGINT) AS s_g,
      |    CAST(SUM(n * n) AS BIGINT) AS q_g
      |  FROM dowed GROUP BY 1, 2
      |), terms AS (
      |  SELECT event_type, dow, n_g, s_g, q_g,
      |    CAST(n_g * q_g - s_g * s_g AS DOUBLE) / CAST(n_g AS DOUBLE) AS w_g
      |  FROM groups
      |), pivoted AS (
      |  SELECT event_type,
      |    CAST(SUM(n_g) AS BIGINT) AS n_days,
      |    CAST(SUM(s_g) AS BIGINT) AS s_tot,
      |    CAST(SUM(q_g) AS BIGINT) AS q_tot,
      |$wCols
      |  FROM terms GROUP BY 1
      |), stats AS (
      |  SELECT event_type, n_days,
      |    CAST(n_days * q_tot - s_tot * s_tot AS DOUBLE)
      |      / CAST(n_days AS DOUBLE) AS ss_total,
      |    $sswExpr AS ss_within
      |  FROM pivoted
      |), eta AS (
      |  SELECT event_type, n_days, ss_total, ss_within,
      |    CASE WHEN ss_total > 0.0 THEN 1.0 - ss_within / ss_total
      |         ELSE NULL END AS eta2
      |  FROM stats
      |)
      |SELECT event_type, n_days, ss_total, ss_within, eta2,
      |  CASE WHEN eta2 IS NULL THEN NULL ELSE eta2 > 0.2 END AS weekly_seasonal
      |FROM eta
      |ORDER BY event_type""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_seasonality_strength" -> (eventsSeasonalityStrength _)
  )

  val oracleSql: Map[String, String] = Map(
    "events_seasonality_strength" -> eventsSeasonalityStrengthSql
  )
}
