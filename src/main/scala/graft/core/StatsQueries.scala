package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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
  /** The SES filter over a (event_type, day, n) daily-count frame —
    * shared by the batch entry and the streaming serve
    * ([[graft.streaming.ForecastStream]]), so streamed and backfilled
    * corpora produce bit-identical forecasts.
    */
  private[graft] def sesOn(daily: DataFrame): DataFrame = {
    import daily.sparkSession.implicits._
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

  def eventsForecastSes(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    sesOn(Tables.events(spark, dir)
      .groupBy($"event_type", to_date($"ts").as("day"))
      .agg(count(lit(1)).as("n")))
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

  /** Exact grouped QUARTILES + IQR outlier census — the box-plot /
    * Tukey-fence profile per event type, by the agg_median_exact
    * bucketed-selection discipline generalized to three ranks: a 256+
    * bucket histogram locates each target rank's bucket, only those
    * buckets' rows are rank-sorted (never a whole group in one task),
    * and the three selected values pivot into columns by conditional
    * aggregation. Quantile definition is EXPLICIT rank selection
    * (rank = ceil(p·n), exact in IEEE for p ∈ {1/4, 1/2, 3/4}) written
    * identically in both engines — the built-in quantile functions
    * interpolate differently per engine and would never hash-match.
    * Outliers are counted map-side against the broadcast fences
    * (q25/q75 ± 1.5·IQR, one shared expression tree).
    */
  /** The exact per-type quartile table (event_type, q25, q50, q75,
    * n_events) — the two-phase bucket-histogram order-statistic device,
    * extracted so [[aggWinsorizedMean]] shares the identical quartile
    * definition (rank ceil(n·p) over (value, event_id)) with the IQR
    * entry.
    */
  private[graft] def tukeyQuartiles(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val B = math.max(256, spark.sparkContext.defaultParallelism * 8)
    val ev = Tables.events(spark, dir)
      .select($"event_type", $"value", $"event_id")
    val stats = ev.groupBy($"event_type")
      .agg(count(lit(1)).as("n"), min($"value").as("mn"), max($"value").as("mx"))
      .withColumn("r25", ceil($"n" * 0.25).cast("long"))
      .withColumn("r50", ceil($"n" * 0.5).cast("long"))
      .withColumn("r75", ceil($"n" * 0.75).cast("long"))
    val evb = ev.join(broadcast(stats), Seq("event_type"))
      .withColumn("b",
        when($"mx" === $"mn", lit(0))
          .otherwise(least(floor(($"value" - $"mn") / ($"mx" - $"mn") * B), lit(B - 1)))
          .cast("int"))
    val hist = evb.groupBy($"event_type", $"b").agg(count(lit(1)).as("cnt"))
    val wb = Window.partitionBy($"event_type").orderBy($"b")
      .rowsBetween(Window.unboundedPreceding, -1)
    def hit(r: org.apache.spark.sql.Column) =
      r > $"cum_before" && r <= $"cum_before" + $"cnt"
    val targetBuckets = hist
      .withColumn("cum_before", coalesce(sum($"cnt").over(wb), lit(0L)))
      .join(stats.select($"event_type", $"r25", $"r50", $"r75"), Seq("event_type"))
      .filter(hit($"r25") || hit($"r50") || hit($"r75"))
      .select($"event_type", $"b", $"cum_before")
    val probe = evb.join(broadcast(targetBuckets), Seq("event_type", "b"))
    val wp = Window.partitionBy($"event_type", $"b").orderBy($"value", $"event_id")
    val quart = probe.withColumn("rank", row_number().over(wp).cast("long") + $"cum_before")
      .filter($"rank" === $"r25" || $"rank" === $"r50" || $"rank" === $"r75")
      .groupBy($"event_type")
      .agg(max(when($"rank" === $"r25", $"value")).as("q25"),
        max(when($"rank" === $"r50", $"value")).as("q50"),
        max(when($"rank" === $"r75", $"value")).as("q75"),
        max($"n").as("n_events"))
    quart
  }

  def aggQuantilesIqr(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select($"event_type", $"value", $"event_id")
    val quart = tukeyQuartiles(spark, dir)
    val fenced = ev.join(broadcast(quart), Seq("event_type"))
      .groupBy($"event_type")
      .agg(
        sum(when($"value" < $"q25" - lit(1.5) * ($"q75" - $"q25"), 1L).otherwise(0L)).as("n_low_outliers"),
        sum(when($"value" > $"q75" + lit(1.5) * ($"q75" - $"q25"), 1L).otherwise(0L)).as("n_high_outliers"))
    quart.join(fenced, Seq("event_type"))
      .select($"event_type", $"n_events", $"q25", $"q50", $"q75",
        ($"q75" - $"q25").as("iqr"), $"n_low_outliers", $"n_high_outliers")
      .orderBy($"event_type")
  }

  val aggQuantilesIqrSql: String =
    """WITH ranked AS (
      |  SELECT event_type, value,
      |    row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
      |    COUNT(*) OVER (PARTITION BY event_type) AS n
      |  FROM events
      |), quart AS (
      |  SELECT event_type,
      |    MAX(CASE WHEN rn = CAST(ceil(n * 0.25) AS BIGINT) THEN value END) AS q25,
      |    MAX(CASE WHEN rn = CAST(ceil(n * 0.5) AS BIGINT) THEN value END) AS q50,
      |    MAX(CASE WHEN rn = CAST(ceil(n * 0.75) AS BIGINT) THEN value END) AS q75,
      |    CAST(MAX(n) AS BIGINT) AS n_events
      |  FROM ranked
      |  WHERE rn = CAST(ceil(n * 0.25) AS BIGINT)
      |     OR rn = CAST(ceil(n * 0.5) AS BIGINT)
      |     OR rn = CAST(ceil(n * 0.75) AS BIGINT)
      |  GROUP BY event_type
      |), fenced AS (
      |  SELECT e.event_type,
      |    CAST(SUM(CASE WHEN e.value < q.q25 - 1.5 * (q.q75 - q.q25) THEN 1 ELSE 0 END) AS BIGINT) AS n_low_outliers,
      |    CAST(SUM(CASE WHEN e.value > q.q75 + 1.5 * (q.q75 - q.q25) THEN 1 ELSE 0 END) AS BIGINT) AS n_high_outliers
      |  FROM events e JOIN quart q ON e.event_type = q.event_type
      |  GROUP BY e.event_type
      |)
      |SELECT q.event_type, n_events, q25, q50, q75, q75 - q25 AS iqr,
      |  n_low_outliers, n_high_outliers
      |FROM quart q JOIN fenced f ON q.event_type = f.event_type
      |ORDER BY q.event_type""".stripMargin

  /** CUSUM CHANGEPOINT detection on each type's daily volume — "when
    * did the level shift?", the complement of the anomaly screens
    * ("which single days spiked?"). The classic statistic
    * S_r = Σ_{i≤r}(y_i − ȳ) maximized over split points r, made exact
    * by scaling with the day count: D·prefix(r) − r·total is a BIGINT
    * (the mean never materializes as a float), so the argmax and the
    * tie-break (earliest split) are engine-stable; the normalized
    * statistic is ONE final division. One bounded window pass over the
    * ≤ types×days daily aggregate — never over raw events.
    */
  def eventsChangepointCusum(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.events(spark, dir)
      .groupBy($"event_type", to_date($"ts").as("day"))
      .agg(count(lit(1)).as("y"))
    val wOrd = Window.partitionBy($"event_type").orderBy($"day")
    val wAll = Window.partitionBy($"event_type")
    val scored = daily
      .withColumn("r", row_number().over(wOrd).cast("long"))
      .withColumn("prefix", sum($"y").over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("total", sum($"y").over(wAll))
      .withColumn("d_days", count(lit(1)).over(wAll))
      .withColumn("min_day", min($"day").over(wAll))
      .filter($"r" < $"d_days") // S_D = 0 by construction — not a split
      .withColumn("s_scaled", abs($"d_days" * $"prefix" - $"r" * $"total"))
      .withColumn("day_offset", datediff($"day", $"min_day").cast("long"))
    scored.groupBy($"event_type")
      .agg(max(struct($"s_scaled", (-$"r").as("neg_r"), $"day_offset",
        $"total", $"d_days")).as("best"))
      .select($"event_type",
        $"best.d_days".as("n_days"),
        $"best.day_offset".as("cp_day_offset"),
        $"best.s_scaled".as("cusum_scaled"),
        ($"best.s_scaled".cast("double") /
          ($"best.d_days" * $"best.total").cast("double")).as("cusum_norm"))
      .orderBy($"event_type")
  }

  val eventsChangepointCusumSql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
      |    CAST(COUNT(*) AS BIGINT) AS y
      |  FROM events GROUP BY 1, 2
      |), scored AS (
      |  SELECT event_type, day, y,
      |    CAST(row_number() OVER w AS BIGINT) AS r,
      |    CAST(SUM(y) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS prefix,
      |    CAST(SUM(y) OVER wp AS BIGINT) AS total,
      |    CAST(COUNT(*) OVER wp AS BIGINT) AS d_days,
      |    MIN(day) OVER wp AS min_day
      |  FROM daily
      |  WINDOW w AS (PARTITION BY event_type ORDER BY day),
      |         wp AS (PARTITION BY event_type)
      |), s AS (
      |  SELECT event_type, d_days, total,
      |    abs(d_days * prefix - r * total) AS s_scaled, r,
      |    CAST(date_diff('day', min_day, day) AS BIGINT) AS day_offset
      |  FROM scored WHERE r < d_days
      |), ranked AS (
      |  SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY s_scaled DESC, r) AS pick
      |  FROM s
      |)
      |SELECT event_type, d_days AS n_days, day_offset AS cp_day_offset,
      |  s_scaled AS cusum_scaled,
      |  CAST(s_scaled AS DOUBLE) / CAST(d_days * total AS DOUBLE) AS cusum_norm
      |FROM ranked WHERE pick = 1
      |ORDER BY event_type""".stripMargin

  /** Behavioral DIVERSITY index per user — how spread a user's activity
    * is across event types, as the Gini–Simpson index 1 − Σp_i². The
    * Shannon-entropy twin needs a libm log and would never hash-match;
    * Gini–Simpson is RATIONAL: (n² − Σn_i²)/n² over exact BIGINT
    * counts, ONE IEEE division per user — same diversity ordering,
    * engine-exact. Rolled up to a per-cohort profile (min/mean/max
    * diversity by activity decile) so the output is bounded and the
    * mean is itself an exact-sum ratio.
    */
  def eventsDiversityGini(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val byType = Tables.events(spark, dir)
      .groupBy($"user_id", $"event_type").agg(count(lit(1)).as("n_i"))
    val perUser = byType.groupBy($"user_id")
      .agg(sum($"n_i").as("n"), sum($"n_i" * $"n_i").as("sq"),
        count(lit(1)).as("n_types"))
      // scaled to 1e6 and floored: an exact BIGINT per user, so the
      // cohort SUM below stays exact (a sum of per-user doubles would
      // re-introduce order dependence)
      .withColumn("div_ppm",
        floor((($"n" * $"n" - $"sq") * 1000000L).cast("double") /
          ($"n" * $"n").cast("double")).cast("long"))
    perUser
      .withColumn("decile", least(floor($"n" / 10L), lit(9L)))
      .groupBy($"decile")
      .agg(count(lit(1)).as("n_users"),
        min($"div_ppm").as("min_div_ppm"),
        max($"div_ppm").as("max_div_ppm"),
        sum($"div_ppm").as("sum_div_ppm"),
        max($"n_types").as("max_types"))
      .withColumn("mean_diversity",
        $"sum_div_ppm".cast("double") / ($"n_users" * 1000000L).cast("double"))
      .orderBy($"decile")
  }

  val eventsDiversityGiniSql: String =
    """WITH bt AS (
      |  SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n_i
      |  FROM events GROUP BY 1, 2
      |), pu AS (
      |  SELECT user_id, CAST(SUM(n_i) AS BIGINT) AS n,
      |    CAST(SUM(n_i * n_i) AS BIGINT) AS sq,
      |    CAST(COUNT(*) AS BIGINT) AS n_types
      |  FROM bt GROUP BY user_id
      |), d AS (
      |  SELECT user_id, n, n_types,
      |    CAST(floor(CAST((n * n - sq) * 1000000 AS DOUBLE) / CAST(n * n AS DOUBLE)) AS BIGINT)
      |      AS div_ppm,
      |    LEAST(CAST(floor(n / 10.0) AS BIGINT), 9) AS decile
      |  FROM pu
      |)
      |SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_users,
      |  CAST(MIN(div_ppm) AS BIGINT) AS min_div_ppm,
      |  CAST(MAX(div_ppm) AS BIGINT) AS max_div_ppm,
      |  CAST(SUM(div_ppm) AS BIGINT) AS sum_div_ppm,
      |  CAST(MAX(n_types) AS BIGINT) AS max_types,
      |  CAST(CAST(SUM(div_ppm) AS BIGINT) AS DOUBLE)
      |    / CAST(COUNT(*) * 1000000 AS DOUBLE) AS mean_diversity
      |FROM d
      |GROUP BY decile
      |ORDER BY decile""".stripMargin

  /** Autocorrelation of daily volume at lags 1–7 — the periodicity
    * detector behind the seasonality heatmap (the heatmap SHOWS the
    * weekly cycle; the ACF MEASURES it: a peak at lag 7 = weekly
    * rhythm). Pairs are matched on CALENDAR day (a self-join on
    * day + lag, not a row-offset window), so gap days don't smear lags.
    * Exactness: daily counts are integers, so all five sufficient sums
    * per (type, lag) are exact BIGINTs and the Pearson formula is the
    * [[eventsValueCorr]] correctly-rounded-doubles discipline. The lag
    * dimension rides an exploded 7-element literal: one join, one
    * shuffle on (type, day), never 7 passes.
    */
  /** The ACF core over a (event_type, day, n) daily-count frame —
    * shared by the batch entry and the streaming serve.
    */
  private[graft] def acfOn(daily: DataFrame): DataFrame = {
    import daily.sparkSession.implicits._
    val lagged = daily
      .withColumn("lag", explode(typedLit((1 to 7).map(_.toLong))))
      .select($"event_type", expr("date_add(day, int(lag))").as("day"),
        $"lag", $"n".as("x"))
    val pairs = lagged.join(daily.select($"event_type", $"day", $"n".as("y")),
      Seq("event_type", "day"))
    val stats = pairs.groupBy($"event_type", $"lag")
      .agg(count(lit(1)).as("n_pairs"),
        sum($"x").as("sx"), sum($"y").as("sy"),
        sum($"x" * $"x").as("sxx"), sum($"y" * $"y").as("syy"),
        sum($"x" * $"y").as("sxy"))
    val nD = $"n_pairs".cast("double")
    val covN = nD * $"sxy".cast("double") - $"sx".cast("double") * $"sy".cast("double")
    val varX = nD * $"sxx".cast("double") - $"sx".cast("double") * $"sx".cast("double")
    val varY = nD * $"syy".cast("double") - $"sy".cast("double") * $"sy".cast("double")
    stats.select($"event_type", $"lag", $"n_pairs",
      (covN / (sqrt(varX) * sqrt(varY))).as("acf"))
      .orderBy($"event_type", $"lag")
  }

  def eventsAutocorr(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    acfOn(Tables.events(spark, dir)
      .groupBy($"event_type", to_date($"ts").as("day"))
      .agg(count(lit(1)).as("n")))
  }

  val eventsAutocorrSql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
      |    CAST(COUNT(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1, 2
      |), lagged AS (
      |  SELECT event_type, day + CAST(lag AS INTEGER) AS day2,
      |    CAST(lag AS BIGINT) AS lag, n AS x
      |  FROM daily, UNNEST(range(1, 8)) AS r(lag)
      |), pairs AS (
      |  SELECT l.event_type, l.lag, l.x, d.n AS y
      |  FROM lagged l JOIN daily d
      |    ON l.event_type = d.event_type AND l.day2 = d.day
      |), stats AS (
      |  SELECT event_type, lag, CAST(COUNT(*) AS BIGINT) AS n_pairs,
      |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
      |    CAST(SUM(x * x) AS BIGINT) AS sxx, CAST(SUM(y * y) AS BIGINT) AS syy,
      |    CAST(SUM(x * y) AS BIGINT) AS sxy
      |  FROM pairs GROUP BY 1, 2
      |)
      |SELECT event_type, lag, n_pairs,
      |  (CAST(n_pairs AS DOUBLE) * CAST(sxy AS DOUBLE)
      |     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |  / (sqrt(CAST(n_pairs AS DOUBLE) * CAST(sxx AS DOUBLE)
      |       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |   * sqrt(CAST(n_pairs AS DOUBLE) * CAST(syy AS DOUBLE)
      |       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS acf
      |FROM stats
      |ORDER BY event_type, lag""".stripMargin

  /** Exact higher-moment profile per event type — mean, variance,
    * SKEWNESS, KURTOSIS (the distribution-shape numbers behind the
    * anomaly screens' implicit normality assumption: heavy skew or fat
    * tails say "use the quantile fences, not ±3σ"). Exactness: values
    * are 2-decimal, so x·100 is an integer ≤ ~10⁴ and the four power
    * sums are computed as DECIMAL(38,0) — exact integers up to 10³⁸
    * (x⁴·10⁸ ≈ 10¹⁶ per row would overflow BIGINT corpus-wide; DuckDB
    * sums the same integers in HUGEINT). Each exact sum casts to double
    * ONCE (both engines round the same integer to the same IEEE
    * double), and the central-moment formulas are one shared expression
    * tree — the corrFrom discipline extended to the 3rd and 4th powers.
    * One partial-agg groupBy; everything after runs on ≤ #types rows.
    * Oracle subtlety (now §5 policy): DuckDB's direct HUGEINT→DOUBLE
    * cast is not correctly rounded above 2⁵³ — the oracle routes it
    * through VARCHAR, which is.
    */
  def aggMomentsExact(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // x·100 as a LONG, but EVERY power multiplies in DECIMAL(38,0) —
    // exact to 10³⁸ per row and sum. The DECIMAL(10,2) domain admits
    // x up to ~10¹⁰, where even x² passes 2⁶³ (a LONG×LONG square
    // would wrap silently under non-ANSI Spark while the DuckDB oracle
    // multiplies in HUGEINT — a latent gate divergence), and sf0.1's
    // max value 560 already put x⁴ ≈ 9.8·10¹⁸ past a long.
    val x = ($"value".cast("decimal(10,2)") * 100).cast("long")
    val xd = $"x".cast("decimal(38,0)")
    val stats = Tables.events(spark, dir)
      .select($"event_type", x.as("x"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        sum(xd).as("s1"),
        sum(xd * xd).as("s2"),
        sum(xd * xd * xd).as("s3"),
        sum((xd * xd) * (xd * xd)).as("s4"))
    val nD = $"n".cast("double")
    val m1 = $"s1".cast("double") / nD / 100.0
    val m2 = $"s2".cast("double") / nD / 1e4
    val m3 = $"s3".cast("double") / nD / 1e6
    val m4 = $"s4".cast("double") / nD / 1e8
    val variance = m2 - m1 * m1
    val mu3 = m3 - lit(3.0) * m1 * m2 + lit(2.0) * m1 * m1 * m1
    val mu4 = m4 - lit(4.0) * m1 * m3 + lit(6.0) * m1 * m1 * m2 -
      lit(3.0) * m1 * m1 * m1 * m1
    stats.select($"event_type", $"n",
      m1.as("mean"),
      variance.as("variance"),
      (mu3 / pow(variance, 1.5)).as("skewness"),
      (mu4 / (variance * variance) - lit(3.0)).as("excess_kurtosis"))
      .orderBy($"event_type")
  }

  val aggMomentsExactSql: String =
    """WITH s AS (
      |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
      |    SUM(CAST(CAST(value AS DECIMAL(10,2)) * 100 AS HUGEINT)) AS s1,
      |    SUM(CAST(CAST(value AS DECIMAL(10,2)) * 100 AS HUGEINT)
      |      * CAST(CAST(value AS DECIMAL(10,2)) * 100 AS HUGEINT)) AS s2,
      |    SUM(CAST(CAST(value AS DECIMAL(10,2)) * 100 AS HUGEINT)
      |      * CAST(CAST(value AS DECIMAL(10,2)) * 100 AS HUGEINT)
      |      * CAST(CAST(value AS DECIMAL(10,2)) * 100 AS HUGEINT)) AS s3,
      |    SUM(CAST(CAST(value AS DECIMAL(10,2)) * 100 AS HUGEINT)
      |      * CAST(CAST(value AS DECIMAL(10,2)) * 100 AS HUGEINT)
      |      * CAST(CAST(value AS DECIMAL(10,2)) * 100 AS HUGEINT)
      |      * CAST(CAST(value AS DECIMAL(10,2)) * 100 AS HUGEINT)) AS s4
      |  FROM events GROUP BY event_type
      |), m AS (
      |  -- HUGEINT -> DOUBLE via VARCHAR: DuckDB's direct hugeint cast is
      |  -- not correctly rounded above 2^53 (s4 ~ 3e19 lands 1 ULP off
      |  -- Java's BigDecimal.doubleValue); text -> double is
      |  SELECT event_type, n,
      |    CAST(CAST(s1 AS VARCHAR) AS DOUBLE) / n / 100.0 AS m1,
      |    CAST(CAST(s2 AS VARCHAR) AS DOUBLE) / n / 1e4 AS m2,
      |    CAST(CAST(s3 AS VARCHAR) AS DOUBLE) / n / 1e6 AS m3,
      |    CAST(CAST(s4 AS VARCHAR) AS DOUBLE) / n / 1e8 AS m4
      |  FROM s
      |)
      |SELECT event_type, n, m1 AS mean,
      |  m2 - m1 * m1 AS variance,
      |  (m3 - 3.0 * m1 * m2 + 2.0 * m1 * m1 * m1)
      |    / pow(m2 - m1 * m1, 1.5) AS skewness,
      |  (m4 - 4.0 * m1 * m3 + 6.0 * m1 * m1 * m2 - 3.0 * m1 * m1 * m1 * m1)
      |    / ((m2 - m1 * m1) * (m2 - m1 * m1)) - 3.0 AS excess_kurtosis
      |FROM m
      |ORDER BY event_type""".stripMargin

  /** §2 `events_ab_welch`: two-sample A/B comparison per event type —
    * Welch's unequal-variance t-test between a deterministic user-parity
    * split (arm a = even user ids, b = odd; the assignment an experiment
    * platform would hash), the experiment-analysis readout every
    * event-capture pipeline eventually serves.
    *
    * Exactness is the [[corrFrom]] discipline end-to-end: per (type, arm)
    * sufficient statistics as exact integer cents (n, Σy·100, Σy²·10⁴)
    * via CONDITIONAL sums in ONE grouped pass (no arm shuffle, no pivot);
    * then one fixed IEEE tree — sample variance, the two standard-error
    * terms `ra = var_a/n_a`, `rb`, `t = (m_a−m_b)/√(ra+rb)` and the
    * Welch–Satterthwaite dof `(ra+rb)²/(ra²/(n_a−1)+rb²/(n_b−1))` —
    * token-for-token identical in the oracle SQL, so even the doubles
    * hash-match. The `significant` flag compares the shared t against the
    * 1.96 literal. Map-side combine collapses the scan to ≤|types|
    * partials; the output is ≤|types| rows.
    */
  def eventsAbWelch(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select($"event_type", pmod($"user_id", lit(2)).as("arm"),
        $"value".cast("decimal(10,2)").as("y"))
      .withColumn("y_c", ($"y" * 100).cast("long"))
      .withColumn("yy_4", ($"y" * $"y" * 10000).cast("long"))
    welchFrom(ev.groupBy($"event_type").agg(
      sum(when($"arm" === 0, 1L).otherwise(0L)).as("n_a"),
      sum(when($"arm" === 0, $"y_c").otherwise(0L)).as("sy_a"),
      sum(when($"arm" === 0, $"yy_4").otherwise(0L)).as("syy_a"),
      sum(when($"arm" === 1, 1L).otherwise(0L)).as("n_b"),
      sum(when($"arm" === 1, $"y_c").otherwise(0L)).as("sy_b"),
      sum(when($"arm" === 1, $"yy_4").otherwise(0L)).as("syy_b")))
  }

  /** The Welch IEEE tail over a per-type sufficient-statistics frame
    * (n/Σ/Σ² per arm, exact cents grid) — shared by the batch entry and
    * the streamed value-histogram serve (the integer stats derive
    * identically from rows or from histogram counts, so streamed ==
    * batch is bit-exact through this core).
    */
  private[graft] def welchFrom(stats: DataFrame): DataFrame = {
    import stats.sparkSession.implicits._
    val naD  = $"n_a".cast("double")
    val nbD  = $"n_b".cast("double")
    val syaD = $"sy_a".cast("double") / 100.0
    val sybD = $"sy_b".cast("double") / 100.0
    val syyaD = $"syy_a".cast("double") / 10000.0
    val syybD = $"syy_b".cast("double") / 10000.0
    stats
      // degenerate-arm guard: an arm with n = 0 has no mean and one with
      // n ≤ 1 has no sample variance — the unguarded n·(n−1) denominator
      // produced NaN/Infinity whose handling DuckDB need not share. NULL
      // here propagates NULL through ra/rb/t_stat/dof/significant in
      // BOTH engines (NULL arithmetic is NULL), keeping the hash exact
      // on a skewed event type.
      .withColumn("mean_a", when($"n_a" > 0, syaD / naD))
      .withColumn("mean_b", when($"n_b" > 0, sybD / nbD))
      .withColumn("var_a", when($"n_a" > 1,
        (naD * syyaD - syaD * syaD) / (naD * (naD - 1.0))))
      .withColumn("var_b", when($"n_b" > 1,
        (nbD * syybD - sybD * sybD) / (nbD * (nbD - 1.0))))
      .withColumn("ra", $"var_a" / naD)
      .withColumn("rb", $"var_b" / nbD)
      .withColumn("t_stat", ($"mean_a" - $"mean_b") / sqrt($"ra" + $"rb"))
      .withColumn("dof", (($"ra" + $"rb") * ($"ra" + $"rb"))
        / ($"ra" * $"ra" / (naD - 1.0) + $"rb" * $"rb" / (nbD - 1.0)))
      .withColumn("significant", abs($"t_stat") > 1.96)
      .select($"event_type", $"n_a", $"n_b", $"mean_a", $"mean_b",
        $"var_a", $"var_b", $"t_stat", $"dof", $"significant")
      .orderBy($"event_type")
  }

  val eventsAbWelchSql: String =
    """WITH ev AS (
      |  SELECT event_type, user_id % 2 AS arm,
      |    CAST(CAST(value AS DECIMAL(10,2)) * 100 AS BIGINT) AS y_c,
      |    CAST(CAST(value AS DECIMAL(10,2)) * CAST(value AS DECIMAL(10,2)) * 10000 AS BIGINT) AS yy_4
      |  FROM events
      |), stats AS (
      |  SELECT event_type,
      |    CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
      |    CAST(SUM(CASE WHEN arm = 0 THEN y_c ELSE 0 END) AS BIGINT) AS sy_a,
      |    CAST(SUM(CASE WHEN arm = 0 THEN yy_4 ELSE 0 END) AS BIGINT) AS syy_a,
      |    CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
      |    CAST(SUM(CASE WHEN arm = 1 THEN y_c ELSE 0 END) AS BIGINT) AS sy_b,
      |    CAST(SUM(CASE WHEN arm = 1 THEN yy_4 ELSE 0 END) AS BIGINT) AS syy_b
      |  FROM ev GROUP BY event_type
      |), d AS (
      |  SELECT event_type, n_a, n_b,
      |    CAST(n_a AS DOUBLE) AS nad, CAST(n_b AS DOUBLE) AS nbd,
      |    CAST(sy_a AS DOUBLE) / 100.0 AS syad, CAST(sy_b AS DOUBLE) / 100.0 AS sybd,
      |    CAST(syy_a AS DOUBLE) / 10000.0 AS syyad, CAST(syy_b AS DOUBLE) / 10000.0 AS syybd
      |  FROM stats
      |), m AS (
      |  SELECT event_type, n_a, n_b, nad, nbd,
      |    CASE WHEN n_a > 0 THEN syad / nad END AS mean_a,
      |    CASE WHEN n_b > 0 THEN sybd / nbd END AS mean_b,
      |    CASE WHEN n_a > 1
      |      THEN (nad * syyad - syad * syad) / (nad * (nad - 1.0)) END AS var_a,
      |    CASE WHEN n_b > 1
      |      THEN (nbd * syybd - sybd * sybd) / (nbd * (nbd - 1.0)) END AS var_b
      |  FROM d
      |), r AS (
      |  SELECT *, var_a / nad AS ra, var_b / nbd AS rb FROM m
      |)
      |SELECT event_type, n_a, n_b, mean_a, mean_b, var_a, var_b,
      |  (mean_a - mean_b) / sqrt(ra + rb) AS t_stat,
      |  ((ra + rb) * (ra + rb)) / (ra * ra / (nad - 1.0) + rb * rb / (nbd - 1.0)) AS dof,
      |  abs((mean_a - mean_b) / sqrt(ra + rb)) > 1.96 AS significant
      |FROM r
      |ORDER BY event_type""".stripMargin

  /** §2 `agg_winsorized_mean`: ROBUST mean per event type — values
    * clamped to the Tukey fences [q25−1.5·IQR, q75+1.5·IQR] before
    * averaging (winsorization: the robust-statistics companion to
    * agg_quantiles_iqr's outlier CENSUS — that entry counts the tail,
    * this reports the level with the tail's leverage removed; a plain
    * mean moves arbitrarily far under one corrupt feed value, the
    * winsorized mean moves at most by the fence). Quartiles come from
    * the SHARED [[tukeyQuartiles]] device verbatim, so the two entries
    * can never disagree about where the fences sit.
    *
    * Exactness: everything happens in integer HALF-CENTS — v2 = 2·cents,
    * lo2 = 2·q25_c − 3·iqr_c, hi2 = 2·q75_c + 3·iqr_c (the 1.5 factor
    * becomes the integer 3 at double scale, so the fence is EXACT where
    * a double 1.5·iqr could land on a .xx5 rounding boundary and split
    * the engines); clamped sums are exact BIGINTs and each mean is ONE
    * IEEE divide. One scan + the quartile device's bounded passes.
    */
  def aggWinsorizedMean(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val quart = tukeyQuartiles(spark, dir)
      .withColumn("q25_c", ($"q25".cast("decimal(10,2)") * 100).cast("long"))
      .withColumn("q75_c", ($"q75".cast("decimal(10,2)") * 100).cast("long"))
      .withColumn("lo2", $"q25_c" * 2 - ($"q75_c" - $"q25_c") * 3)
      .withColumn("hi2", $"q75_c" * 2 + ($"q75_c" - $"q25_c") * 3)
      .select($"event_type", $"n_events", $"lo2", $"hi2")
    Tables.events(spark, dir)
      .select($"event_type", ($"value".cast("decimal(10,2)") * 200).cast("long").as("v2"))
      .join(broadcast(quart), Seq("event_type"))
      .withColumn("w2", least(greatest($"v2", $"lo2"), $"hi2"))
      .groupBy($"event_type")
      .agg(max($"n_events").as("n_events"),
        sum(when($"v2" < $"lo2", 1L).otherwise(0L)).as("n_clamped_low"),
        sum(when($"v2" > $"hi2", 1L).otherwise(0L)).as("n_clamped_high"),
        sum($"v2").as("sum_v2"), sum($"w2").as("sum_w2"))
      .withColumn("mean_raw", $"sum_v2".cast("double") / ($"n_events" * 200).cast("double"))
      .withColumn("mean_winsorized", $"sum_w2".cast("double") / ($"n_events" * 200).cast("double"))
      .select($"event_type", $"n_events", $"n_clamped_low", $"n_clamped_high",
        $"mean_raw", $"mean_winsorized")
      .orderBy($"event_type")
  }

  /** §2 entry `agg_trimmed_mean` — the 10% TRIMMED mean beside the
    * winsorized one: winsorizing CLAMPS the tails to the fences, trimming
    * DROPS the top and bottom n div 10 observations outright (the robust
    * location estimate that ignores outliers instead of voting them at
    * the fence). No per-row rank window: the corpus collapses to the
    * DOMAIN-bounded value histogram (the Mann–Whitney discipline), the
    * tail take per value group is a clamp of (k − cumulative-below)
    * against the group count — pure integer arithmetic on the bounded
    * frame, so a tie group straddling the cut contributes exactly its
    * partial take (take_lo + take_hi < cnt is guaranteed by n > 2k).
    * Hash-gate: sums/takes exact BIGINTs on the cents grid, one
    * correctly-rounded divide per mean; n − 2k ≥ 1 for all n ≥ 1, so no
    * degenerate edge exists.
    */
  def aggTrimmedMean(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    trimmedMeanOn(Tables.events(spark, dir)
      .select($"event_type", ($"value".cast("decimal(10,2)") * 100).cast("long").as("y_c")))
  }

  /** The histogram-trim core over a (event_type, y_c) frame — split out
    * for the planted specs.
    */
  private[graft] def trimmedMeanOn(ev: DataFrame): DataFrame = {
    import ev.sparkSession.implicits._
    val hist = ev.groupBy($"event_type", $"y_c").agg(count(lit(1)).as("cnt"))
    val wb = Window.partitionBy($"event_type").orderBy($"y_c")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wt = Window.partitionBy($"event_type")
    val taken = hist
      .withColumn("cumb", coalesce(sum($"cnt").over(wb), lit(0L)))
      .withColumn("n", sum($"cnt").over(wt))
      .withColumn("k", expr("n div 10"))
      .withColumn("cuma", $"n" - $"cumb" - $"cnt")
      .withColumn("take_lo", greatest(least($"k" - $"cumb", $"cnt"), lit(0L)))
      .withColumn("take_hi", greatest(least($"k" - $"cuma", $"cnt"), lit(0L)))
    taken.groupBy($"event_type").agg(
        max($"n").as("n_events"), max($"k").as("n_trimmed_each_side"),
        sum($"y_c" * $"cnt").as("sum_all"),
        sum($"y_c" * $"take_lo").as("trim_lo"),
        sum($"y_c" * $"take_hi").as("trim_hi"))
      .withColumn("mean_raw",
        $"sum_all".cast("double") / ($"n_events" * 100L).cast("double"))
      .withColumn("mean_trimmed",
        ($"sum_all" - $"trim_lo" - $"trim_hi").cast("double")
          / (($"n_events" - $"n_trimmed_each_side" * 2L) * 100L).cast("double"))
      .select($"event_type", $"n_events", $"n_trimmed_each_side",
        $"mean_raw", $"mean_trimmed")
      .orderBy($"event_type")
  }

  val aggTrimmedMeanSql: String =
    """WITH hist AS (
      |  SELECT event_type,
      |    CAST(CAST(value AS DECIMAL(10,2)) * 100 AS BIGINT) AS y_c,
      |    CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM events GROUP BY 1, 2
      |), taken AS (
      |  SELECT event_type, y_c, cnt,
      |    COALESCE(SUM(cnt) OVER (PARTITION BY event_type ORDER BY y_c
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumb,
      |    SUM(cnt) OVER (PARTITION BY event_type) AS n
      |  FROM hist
      |), clamped AS (
      |  SELECT event_type, y_c, cnt, n, n // 10 AS k,
      |    GREATEST(LEAST(n // 10 - cumb, cnt), 0) AS take_lo,
      |    GREATEST(LEAST(n // 10 - (n - cumb - cnt), cnt), 0) AS take_hi
      |  FROM taken
      |), agg AS (
      |  SELECT event_type,
      |    CAST(MAX(n) AS BIGINT) AS n_events,
      |    CAST(MAX(k) AS BIGINT) AS n_trimmed_each_side,
      |    CAST(SUM(y_c * cnt) AS BIGINT) AS sum_all,
      |    CAST(SUM(y_c * take_lo) AS BIGINT) AS trim_lo,
      |    CAST(SUM(y_c * take_hi) AS BIGINT) AS trim_hi
      |  FROM clamped GROUP BY 1
      |)
      |SELECT event_type, n_events, n_trimmed_each_side,
      |  CAST(sum_all AS DOUBLE) / CAST(n_events * 100 AS DOUBLE) AS mean_raw,
      |  CAST(sum_all - trim_lo - trim_hi AS DOUBLE)
      |    / CAST((n_events - 2 * n_trimmed_each_side) * 100 AS DOUBLE) AS mean_trimmed
      |FROM agg
      |ORDER BY event_type""".stripMargin

  val aggWinsorizedMeanSql: String =
    """WITH ranked AS (
      |  SELECT event_type, value,
      |    row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
      |    COUNT(*) OVER (PARTITION BY event_type) AS n
      |  FROM events
      |), quart AS (
      |  SELECT event_type,
      |    MAX(CASE WHEN rn = CAST(ceil(n * 0.25) AS BIGINT) THEN value END) AS q25,
      |    MAX(CASE WHEN rn = CAST(ceil(n * 0.75) AS BIGINT) THEN value END) AS q75,
      |    CAST(MAX(n) AS BIGINT) AS n_events
      |  FROM ranked
      |  WHERE rn = CAST(ceil(n * 0.25) AS BIGINT)
      |     OR rn = CAST(ceil(n * 0.75) AS BIGINT)
      |  GROUP BY event_type
      |), fences AS (
      |  SELECT event_type, n_events,
      |    CAST(CAST(q25 AS DECIMAL(10,2)) * 100 AS BIGINT) * 2
      |      - (CAST(CAST(q75 AS DECIMAL(10,2)) * 100 AS BIGINT)
      |         - CAST(CAST(q25 AS DECIMAL(10,2)) * 100 AS BIGINT)) * 3 AS lo2,
      |    CAST(CAST(q75 AS DECIMAL(10,2)) * 100 AS BIGINT) * 2
      |      + (CAST(CAST(q75 AS DECIMAL(10,2)) * 100 AS BIGINT)
      |         - CAST(CAST(q25 AS DECIMAL(10,2)) * 100 AS BIGINT)) * 3 AS hi2
      |  FROM quart
      |), v AS (
      |  SELECT e.event_type, f.n_events, f.lo2, f.hi2,
      |    CAST(CAST(e.value AS DECIMAL(10,2)) * 200 AS BIGINT) AS v2
      |  FROM events e JOIN fences f ON e.event_type = f.event_type
      |)
      |SELECT event_type, n_events,
      |  CAST(SUM(CASE WHEN v2 < lo2 THEN 1 ELSE 0 END) AS BIGINT) AS n_clamped_low,
      |  CAST(SUM(CASE WHEN v2 > hi2 THEN 1 ELSE 0 END) AS BIGINT) AS n_clamped_high,
      |  CAST(SUM(v2) AS DOUBLE) / CAST(n_events * 200 AS DOUBLE) AS mean_raw,
      |  CAST(SUM(least(greatest(v2, lo2), hi2)) AS DOUBLE)
      |    / CAST(n_events * 200 AS DOUBLE) AS mean_winsorized
      |FROM v
      |GROUP BY event_type, n_events
      |ORDER BY event_type""".stripMargin

  /** Generic grouped LOWER MEDIAN (rank ceil(n/2) over (v, id)) for an
    * integer value column — the two-phase bucket-histogram device
    * generalized from [[tukeyQuartiles]] so [[aggMadExact]] can take a
    * median of DERIVED values (absolute deviations) without a per-group
    * sort. Expects columns (g, v: long, id); integer bucket arithmetic
    * (domain ≤ ~2^43 before the ×1024 bucket scale could overflow — far
    * above any cents-scale column; the double form is the drop-in past
    * that).
    */
  private[graft] def groupedLowerMedianLong(df: DataFrame): DataFrame = {
    import df.sparkSession.implicits._
    import org.apache.spark.sql.expressions.Window
    val stats = df.groupBy($"g")
      .agg(count(lit(1)).as("n"), min($"v").as("mn"), max($"v").as("mx"))
      .withColumn("r", ceil($"n" * 0.5).cast("long"))
    val evb = df.join(broadcast(stats), Seq("g"))
      .withColumn("b",
        when($"mx" === $"mn", lit(0L))
          .otherwise(least(expr("((v - mn) * 1024) div (mx - mn + 1)"), lit(1023L)))
          .cast("int"))
      .select($"g", $"v", $"id", $"b")
    val hist = evb.groupBy($"g", $"b").agg(count(lit(1)).as("cnt"))
    val wb = Window.partitionBy($"g").orderBy($"b")
      .rowsBetween(Window.unboundedPreceding, -1)
    val target = hist
      .withColumn("cum_before", coalesce(sum($"cnt").over(wb), lit(0L)))
      .join(stats.select($"g", $"r"), Seq("g"))
      .filter($"r" > $"cum_before" && $"r" <= $"cum_before" + $"cnt")
      .select($"g", $"b", $"cum_before", $"r")
    val probe = evb.join(broadcast(target), Seq("g", "b"))
    val wp = Window.partitionBy($"g", $"b").orderBy($"v", $"id")
    probe.withColumn("rank", row_number().over(wp).cast("long") + $"cum_before")
      .filter($"rank" === $"r")
      .groupBy($"g").agg(max($"v").as("med"))
  }

  /** §2 `agg_mad_exact`: MEDIAN ABSOLUTE DEVIATION per event type — the
    * robust scale estimator beside the winsorized mean's robust level
    * (50% breakdown point: half the feed can go corrupt before MAD
    * moves, where the stddev the z-score screens use breaks at one bad
    * value). Both medians are the LOWER median (rank ceil(n/2) over
    * (value, event_id) — single order statistic, deterministic ties),
    * computed via the shared bucket-histogram device — the center from
    * [[tukeyQuartiles]]'s q50 verbatim, the deviation median through
    * [[groupedLowerMedianLong]] over exact |cents − median_cents|
    * integers; no per-group sort anywhere, reported doubles are one
    * ÷100 each.
    */
  def aggMadExact(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // r16 (guide §1.2 — don't compute twice): `med` is referenced by the
    // deviation build AND both final attach joins; unmaterialized, each
    // reference re-ran the whole 3-pass quartile chain. Group-grain rows
    // (one per event type), so the checkpoint is bounded.
    val med = tukeyQuartiles(spark, dir)
      .select($"event_type",
        ($"q50".cast("decimal(10,2)") * 100).cast("long").as("med_c"),
        $"n_events")
      .localCheckpoint()
    val devs = Tables.events(spark, dir)
      .select($"event_type", $"event_id",
        ($"value".cast("decimal(10,2)") * 100).cast("long").as("v_c"))
      .join(broadcast(med), Seq("event_type"))
      .select($"event_type".as("g"), abs($"v_c" - $"med_c").as("v"), $"event_id".as("id"))
      // the bucket-median helper reads its input three times (stats,
      // histogram, probe); materialize the deviation stream once instead
      // of re-scanning the fact table per read
      .localCheckpoint()
    groupedLowerMedianLong(devs)
      .select($"g".as("event_type"), $"med".as("mad_c"))
      .join(broadcast(med), Seq("event_type"))
      .select($"event_type", $"n_events", $"med_c".as("median_cents"),
        $"mad_c".as("mad_cents"),
        ($"med_c".cast("double") / 100.0).as("median"),
        ($"mad_c".cast("double") / 100.0).as("mad"))
      .orderBy($"event_type")
  }

  val aggMadExactSql: String =
    """WITH ev AS (
      |  SELECT event_type, event_id,
      |    CAST(CAST(value AS DECIMAL(10,2)) * 100 AS BIGINT) AS v_c
      |  FROM events
      |), ranked AS (
      |  SELECT event_type, v_c,
      |    row_number() OVER (PARTITION BY event_type ORDER BY v_c, event_id) AS rn,
      |    COUNT(*) OVER (PARTITION BY event_type) AS n
      |  FROM ev
      |), med AS (
      |  SELECT event_type, v_c AS med_c, CAST(n AS BIGINT) AS n_events
      |  FROM ranked WHERE rn = CAST(ceil(n * 0.5) AS BIGINT)
      |), devs AS (
      |  SELECT ev.event_type, ev.event_id, abs(ev.v_c - med.med_c) AS dv
      |  FROM ev JOIN med ON ev.event_type = med.event_type
      |), ranked2 AS (
      |  SELECT event_type, dv,
      |    row_number() OVER (PARTITION BY event_type ORDER BY dv, event_id) AS rn,
      |    COUNT(*) OVER (PARTITION BY event_type) AS n
      |  FROM devs
      |), mad AS (
      |  SELECT event_type, dv AS mad_c
      |  FROM ranked2 WHERE rn = CAST(ceil(n * 0.5) AS BIGINT)
      |)
      |SELECT med.event_type, n_events, med_c AS median_cents, mad_c AS mad_cents,
      |  CAST(med_c AS DOUBLE) / 100.0 AS median,
      |  CAST(mad_c AS DOUBLE) / 100.0 AS mad
      |FROM med JOIN mad ON med.event_type = mad.event_type
      |ORDER BY med.event_type""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "agg_mad_exact" -> (aggMadExact _),
    "agg_winsorized_mean" -> (aggWinsorizedMean _),
    "agg_trimmed_mean" -> (aggTrimmedMean _),
    "events_ab_welch" -> (eventsAbWelch _),
    "agg_moments_exact" -> (aggMomentsExact _),
    "events_autocorr" -> (eventsAutocorr _),
    "events_value_corr" -> (eventsValueCorr _),
    "events_forecast_ses" -> (eventsForecastSes _),
    "agg_quantiles_iqr" -> (aggQuantilesIqr _),
    "events_changepoint_cusum" -> (eventsChangepointCusum _),
    "events_diversity_gini" -> (eventsDiversityGini _)
  )

  val oracleSql: Map[String, String] = Map(
    "agg_mad_exact" -> aggMadExactSql,
    "agg_winsorized_mean" -> aggWinsorizedMeanSql,
    "agg_trimmed_mean" -> aggTrimmedMeanSql,
    "events_ab_welch" -> eventsAbWelchSql,
    "agg_moments_exact" -> aggMomentsExactSql,
    "events_autocorr" -> eventsAutocorrSql,
    "events_value_corr" -> eventsValueCorrSql,
    "events_forecast_ses" -> eventsForecastSesSql,
    "agg_quantiles_iqr" -> aggQuantilesIqrSql,
    "events_changepoint_cusum" -> eventsChangepointCusumSql,
    "events_diversity_gini" -> eventsDiversityGiniSql
  )
}
