package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** §2 entries `events_trend_theilsen` / `events_trend_mannkendall` — the
  * ROBUST trend pair beside the OLS slope (`events_value_corr`) and the
  * CUSUM level-shift detector: Theil–Sen estimates the trend as the
  * MEDIAN of all pairwise slopes (a single outlier day cannot move it,
  * where it drags an OLS fit arbitrarily), and Mann–Kendall tests trend
  * EXISTENCE from rank concordance alone (no linearity or normality
  * assumption — the standard screen before quoting any slope).
  *
  * Scale shape (the reason both are cheap at 100 TB): ONE partial-agg
  * groupBy collapses the event corpus to the (event_type, day, n) daily
  * frame — ≤ types×days rows, CALENDAR-bounded, so the all-pairs
  * self-join that both statistics need is days²-bounded per type
  * (30 days → 435 pairs) regardless of corpus row count. The corpus is
  * touched exactly once; everything pairwise runs on the collapsed
  * frame. The per-type windows partition on event_type — bounded
  * partitions, never a global sort.
  *
  * Exactness (hash-gate): pairwise slopes are dy/dx of exact BIGINTs
  * (one correctly-rounded divide — both engines produce the identical
  * IEEE double), the median is EXPLICIT rank selection over the total
  * order (slope, dy, dx) — deterministic and engine-identical, with the
  * even-count midpoint as sum/2 written identically in both engines.
  * Mann–Kendall's S and the ties-corrected variance numerator are pure
  * integer arithmetic; z adds one divide and one sqrt (both correctly
  * rounded). Reference semantics: trend screens over the reference's
  * daily listening-activity rollups (dm_ddl.sql daily views).
  */
object TrendQueries {

  /** The shared daily-count frame: one corpus pass, ≤ types×days rows. */
  private[graft] def dailyOf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .groupBy($"event_type", to_date($"ts").as("day"))
      .agg(count(lit(1)).as("n"))
  }

  /** All ordered day pairs (a.day < b.day) per type with integer rise
    * dy and run dx — the base frame both trend statistics consume.
    */
  private[graft] def dayPairsOn(daily: DataFrame): DataFrame = {
    import daily.sparkSession.implicits._
    val a = daily.select($"event_type", $"day".as("day_a"), $"n".as("n_a"))
    val b = daily.select($"event_type", $"day".as("day_b"), $"n".as("n_b"))
    a.join(b, Seq("event_type"))
      .filter($"day_a" < $"day_b")
      .select($"event_type",
        ($"n_b" - $"n_a").as("dy"),
        datediff($"day_b", $"day_a").cast("long").as("dx"))
  }

  /** Theil–Sen slope over a (event_type, day, n) daily frame — shared
    * by the batch entry and the streaming serve.
    */
  private[graft] def theilSenOn(daily: DataFrame): DataFrame = {
    import daily.sparkSession.implicits._
    val pairs = dayPairsOn(daily)
      .withColumn("slope", $"dy".cast("double") / $"dx".cast("double"))
    // Explicit rank selection: total order (slope, dy, dx) is engine-
    // identical; odd count picks one row twice (lo == hi), even count
    // the two middles — median = picked-sum / picked-count either way.
    val w = Window.partitionBy($"event_type").orderBy($"slope", $"dy", $"dx")
    val ranked = pairs
      .withColumn("rnk", row_number().over(w).cast("long"))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy($"event_type")))
    val picked = ranked
      .filter($"rnk" === expr("(cnt + 1) div 2") || $"rnk" === expr("cnt div 2 + 1"))
    val days = daily.groupBy($"event_type").agg(count(lit(1)).as("n_days"))
    picked.groupBy($"event_type")
      .agg(max($"cnt").as("n_pairs"),
        (sum($"slope") / count(lit(1))).as("slope_per_day"))
      .join(days, Seq("event_type"))
      .select($"event_type", $"n_days", $"n_pairs", $"slope_per_day",
        ($"slope_per_day" * 7.0).as("slope_per_week"))
      .orderBy($"event_type")
  }

  def eventsTrendTheilsen(spark: SparkSession, dir: String): DataFrame =
    theilSenOn(dailyOf(spark, dir))

  /** Mann–Kendall trend test over a (event_type, day, n) daily frame —
    * shared by the batch entry and the streaming serve.
    */
  private[graft] def mannKendallOn(daily: DataFrame): DataFrame = {
    import daily.sparkSession.implicits._
    val s = dayPairsOn(daily)
      .groupBy($"event_type")
      .agg(sum(when($"dy" > 0, 1L).when($"dy" < 0, -1L).otherwise(0L)).as("s_stat"))
    // Ties correction: groups of equal daily counts within a type.
    val ties = daily.groupBy($"event_type", $"n").agg(count(lit(1)).as("t"))
      .groupBy($"event_type")
      .agg(sum($"t").as("n_days"),
        sum($"t" * ($"t" - 1L) * (lit(2L) * $"t" + 5L)).as("tie_term"))
    val joined = s.join(ties, Seq("event_type"))
    val n = $"n_days"
    val varS = (n * (n - 1L) * (lit(2L) * n + 5L) - $"tie_term").cast("double") / 18.0
    val zCol: Column = when(varS <= 0.0, lit(null).cast("double"))
      .when($"s_stat" > 0L, ($"s_stat" - 1L).cast("double") / sqrt(varS))
      .when($"s_stat" < 0L, ($"s_stat" + 1L).cast("double") / sqrt(varS))
      .otherwise(lit(0.0))
    joined
      .select($"event_type", $"n_days", $"s_stat", varS.as("var_s"), zCol.as("z"))
      .withColumn("trend",
        when($"z".isNull, "no_trend")
          .when($"z" > 1.96, "increasing")
          .when($"z" < -1.96, "decreasing")
          .otherwise("no_trend"))
      .orderBy($"event_type")
  }

  def eventsTrendMannKendall(spark: SparkSession, dir: String): DataFrame =
    mannKendallOn(dailyOf(spark, dir))

  /** §2 entry `events_dispersion` — the BURSTINESS screen on the daily
    * frame: the index of dispersion (variance-to-mean ratio of daily
    * counts). A Poisson arrival stream has D = 1; D ≫ 1 means bursty
    * traffic (campaign spikes, batch replays), D ≪ 1 suspiciously
    * regular (the bot signature dq_bot_regularity hunts per user, read
    * here at the type grain). The number that tells you whether a mean
    * daily volume is a usable capacity number at all.
    *
    * Exactness: D = (N·Q − S²) / ((N−1)·S) — one correctly-rounded
    * divide of exact BIGINT forms (sample variance over mean, the
    * n·Σx²−(Σx)² discipline); N < 2 or S = 0 → NULL in both engines.
    * One corpus pass (the shared daily collapse), ≤ types rows after.
    */
  private[graft] def dispersionOn(daily: DataFrame): DataFrame = {
    import daily.sparkSession.implicits._
    daily.groupBy($"event_type").agg(
        count(lit(1)).as("n_days"),
        sum($"n").as("s"),
        sum($"n" * $"n").as("q"))
      .withColumn("mean_daily", $"s".cast("double") / $"n_days".cast("double"))
      .withColumn("dispersion",
        when($"n_days" > 1L && $"s" > 0L,
          ($"n_days" * $"q" - $"s" * $"s").cast("double")
            / (($"n_days" - 1L) * $"s").cast("double")))
      .withColumn("overdispersed",
        when($"dispersion".isNull, lit(null).cast("boolean"))
          .otherwise($"dispersion" > 1.0))
      .select($"event_type", $"n_days", $"mean_daily", $"dispersion",
        $"overdispersed")
      .orderBy($"event_type")
  }

  def eventsDispersion(spark: SparkSession, dir: String): DataFrame =
    dispersionOn(dailyOf(spark, dir))

  /** §2 entry `events_level_hl` — the HODGES–LEHMANN robust LEVEL of
    * daily volume, completing the robust trio (Theil–Sen = robust slope,
    * Mann–Kendall = trend existence, HL = the level you quote): the
    * median of all WALSH AVERAGES (n_i + n_j)/2 over day pairs i ≤ j —
    * the estimator associated with the Wilcoxon test, ~30% of outlier
    * days cannot move it where the mean follows any spike, yet it is
    * more efficient than the plain median on clean data.
    *
    * Exactness: median((n_i+n_j)/2) = median(n_i+n_j)/2 (monotone map),
    * so rank selection runs on the exact INTEGER pair sums over the
    * engine-identical total order (sum, day_a, day_b); odd count picks
    * one row twice, even the two middles — HL = picked-sum /
    * (picked-count · 2), one correctly-rounded divide. Scale: the
    * calendar²-bounded self-join of the Theil–Sen discipline (i ≤ j —
    * self-pairs included, the Walsh set), windows partition by type.
    */
  private[graft] def hlLevelOn(daily: DataFrame): DataFrame = {
    import daily.sparkSession.implicits._
    val a = daily.select($"event_type", $"day".as("day_a"), $"n".as("n_a"))
    val b = daily.select($"event_type", $"day".as("day_b"), $"n".as("n_b"))
    val pairs = a.join(b, Seq("event_type"))
      .filter($"day_a" <= $"day_b")
      .select($"event_type", ($"n_a" + $"n_b").as("s"), $"day_a", $"day_b")
    val w = Window.partitionBy($"event_type").orderBy($"s", $"day_a", $"day_b")
    val ranked = pairs
      .withColumn("rnk", row_number().over(w).cast("long"))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy($"event_type")))
    val picked = ranked
      .filter($"rnk" === expr("(cnt + 1) div 2") || $"rnk" === expr("cnt div 2 + 1"))
    val days = daily.groupBy($"event_type").agg(count(lit(1)).as("n_days"))
    picked.groupBy($"event_type")
      .agg(max($"cnt").as("n_pairs"),
        (sum($"s").cast("double") / (count(lit(1)) * 2L).cast("double")).as("hl_level"))
      .join(days, Seq("event_type"))
      .select($"event_type", $"n_days", $"n_pairs", $"hl_level")
      .orderBy($"event_type")
  }

  def eventsLevelHl(spark: SparkSession, dir: String): DataFrame =
    hlLevelOn(dailyOf(spark, dir))

  private val dailySql: String =
    """daily AS (
      |  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
      |    CAST(COUNT(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1, 2
      |), pairs AS (
      |  SELECT a.event_type,
      |    b.n - a.n AS dy,
      |    CAST(date_diff('day', a.day, b.day) AS BIGINT) AS dx
      |  FROM daily a JOIN daily b
      |    ON a.event_type = b.event_type AND a.day < b.day
      |)""".stripMargin

  val eventsTrendTheilsenSql: String =
    s"""WITH $dailySql, sloped AS (
      |  SELECT event_type, dy, dx,
      |    CAST(dy AS DOUBLE) / CAST(dx AS DOUBLE) AS slope
      |  FROM pairs
      |), ranked AS (
      |  SELECT event_type, dy, dx, slope,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY event_type
      |      ORDER BY slope, dy, dx) AS BIGINT) AS rnk,
      |    CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS cnt
      |  FROM sloped
      |), picked AS (
      |  SELECT event_type, slope, cnt FROM ranked
      |  WHERE rnk = (cnt + 1) // 2 OR rnk = cnt // 2 + 1
      |), days AS (
      |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days
      |  FROM daily GROUP BY 1
      |)
      |SELECT p.event_type, d.n_days, p.n_pairs, p.slope_per_day,
      |  p.slope_per_day * 7.0 AS slope_per_week
      |FROM (
      |  SELECT event_type, MAX(cnt) AS n_pairs,
      |    SUM(slope) / CAST(COUNT(*) AS BIGINT) AS slope_per_day
      |  FROM picked GROUP BY 1
      |) p JOIN days d ON p.event_type = d.event_type
      |ORDER BY p.event_type""".stripMargin

  val eventsTrendMannKendallSql: String =
    s"""WITH $dailySql, s AS (
      |  SELECT event_type,
      |    CAST(SUM(CASE WHEN dy > 0 THEN 1 WHEN dy < 0 THEN -1 ELSE 0 END)
      |      AS BIGINT) AS s_stat
      |  FROM pairs GROUP BY 1
      |), tie_groups AS (
      |  SELECT event_type, n, CAST(COUNT(*) AS BIGINT) AS t
      |  FROM daily GROUP BY 1, 2
      |), ties AS (
      |  SELECT event_type,
      |    CAST(SUM(t) AS BIGINT) AS n_days,
      |    CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term
      |  FROM tie_groups GROUP BY 1
      |), joined AS (
      |  SELECT s.event_type, ties.n_days, s.s_stat,
      |    CAST(ties.n_days * (ties.n_days - 1) * (2 * ties.n_days + 5)
      |      - ties.tie_term AS DOUBLE) / 18.0 AS var_s
      |  FROM s JOIN ties ON s.event_type = ties.event_type
      |), z AS (
      |  SELECT event_type, n_days, s_stat, var_s,
      |    CASE WHEN var_s <= 0.0 THEN NULL
      |         WHEN s_stat > 0 THEN CAST(s_stat - 1 AS DOUBLE) / sqrt(var_s)
      |         WHEN s_stat < 0 THEN CAST(s_stat + 1 AS DOUBLE) / sqrt(var_s)
      |         ELSE 0.0 END AS z
      |  FROM joined
      |)
      |SELECT event_type, n_days, s_stat, var_s, z,
      |  CASE WHEN z IS NULL THEN 'no_trend'
      |       WHEN z > 1.96 THEN 'increasing'
      |       WHEN z < -1.96 THEN 'decreasing'
      |       ELSE 'no_trend' END AS trend
      |FROM z
      |ORDER BY event_type""".stripMargin

  val eventsDispersionSql: String =
    s"""WITH $dailySql, agg AS (
      |  SELECT event_type,
      |    CAST(COUNT(*) AS BIGINT) AS n_days,
      |    CAST(SUM(n) AS BIGINT) AS s,
      |    CAST(SUM(n * n) AS BIGINT) AS q
      |  FROM daily GROUP BY 1
      |), d AS (
      |  SELECT event_type, n_days,
      |    CAST(s AS DOUBLE) / CAST(n_days AS DOUBLE) AS mean_daily,
      |    CASE WHEN n_days > 1 AND s > 0
      |      THEN CAST(n_days * q - s * s AS DOUBLE)
      |        / CAST((n_days - 1) * s AS DOUBLE) END AS dispersion
      |  FROM agg
      |)
      |SELECT event_type, n_days, mean_daily, dispersion,
      |  CASE WHEN dispersion IS NULL THEN NULL ELSE dispersion > 1.0 END
      |    AS overdispersed
      |FROM d
      |ORDER BY event_type""".stripMargin

  val eventsLevelHlSql: String =
    s"""WITH $dailySql, wpairs AS (
      |  SELECT a.event_type, a.n + b.n AS s, a.day AS day_a, b.day AS day_b
      |  FROM daily a JOIN daily b
      |    ON a.event_type = b.event_type AND a.day <= b.day
      |), ranked AS (
      |  SELECT event_type, s,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY event_type
      |      ORDER BY s, day_a, day_b) AS BIGINT) AS rnk,
      |    CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS cnt
      |  FROM wpairs
      |), picked AS (
      |  SELECT event_type, s, cnt FROM ranked
      |  WHERE rnk = (cnt + 1) // 2 OR rnk = cnt // 2 + 1
      |), days AS (
      |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days
      |  FROM daily GROUP BY 1
      |)
      |SELECT p.event_type, d.n_days, p.n_pairs, p.hl_level
      |FROM (
      |  SELECT event_type, MAX(cnt) AS n_pairs,
      |    CAST(SUM(s) AS DOUBLE) / CAST(COUNT(*) * 2 AS DOUBLE) AS hl_level
      |  FROM picked GROUP BY 1
      |) p JOIN days d ON p.event_type = d.event_type
      |ORDER BY p.event_type""".stripMargin

  /** §2 entry `events_changepoint_pettitt` — the RANK-based changepoint
    * test beside the CUSUM level-shift detector (`events_changepoint_
    * cusum`): Pettitt's U_t = Σ_{i≤t,j>t} sgn(x_j − x_i) locates the
    * single most likely break in the daily series and TESTS it, with no
    * distributional assumption — CUSUM flags where the running mean
    * drifts (and a whale day drags it); Pettitt only counts rank
    * concordance across the cut, so one spiked day cannot fake a break.
    * The Mann–Kendall of changepoints: MK asks "is there a monotone
    * trend", Pettitt asks "is there ONE structural break, and when".
    *
    * Scale shape: the shared daily collapse (ONE corpus pass,
    * calendar-bounded frame), then U_t via the telescoping identity
    * U_t = U_{t−1} + V_t with V_t = Σ_{e≠t} sgn(x_e − x_t) = m + 1 −
    * midrank2(x_t) — the MW tie-group device gives every day's V from
    * the per-type VALUE histogram + one below-window, and U is a
    * day-ordered prefix sum: two bounded windows, NO days² join at all
    * (cheaper than Theil–Sen on the same frame).
    *
    * Exactness (hash-gate): V and U are pure BIGINTs; K = max |U_t|
    * over t < m with the argmax day picked by the engine-identical
    * (|U| desc, day asc) order. Significance: p = 2·exp(−6K²/(m³+m²))
    * ≤ 0.05 ⟺ 6K² > −ln(0.025)·(m³+m²), so the verdict needs no exp —
    * the −ln(0.025) literal (the KS coefficient's sibling, re-derived
    * in TrendSpec) and one double product chain mirrored token for
    * token. A 1-day series has no interior cut → the type drops in
    * both engines.
    */
  private[graft] val PettittLn40 = 3.6888794541139363 // -ln(0.025) = ln(40)

  private[graft] def pettittOn(daily: DataFrame): DataFrame = {
    import daily.sparkSession.implicits._
    // Per-type value histogram with pooled-below counts (the MW device).
    val hist = daily.groupBy($"event_type", $"n").agg(count(lit(1)).as("t"))
    val wBelow = Window.partitionBy($"event_type").orderBy($"n")
      .rowsBetween(Window.unboundedPreceding, -1)
    val r2 = hist
      .withColumn("below", coalesce(sum($"t").over(wBelow), lit(0L)))
      .select($"event_type", $"n",
        (lit(2L) * $"below" + $"t" + 1L).as("midrank2"))
    val wAll = Window.partitionBy($"event_type")
    val wDay = Window.partitionBy($"event_type").orderBy($"day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val u = daily.join(r2, Seq("event_type", "n"))
      .withColumn("m", count(lit(1)).over(wAll))
      .withColumn("v", $"m" + 1L - $"midrank2")
      .withColumn("u", sum($"v").over(wDay))
      .withColumn("rn", row_number().over(
        Window.partitionBy($"event_type").orderBy($"day")).cast("long"))
      .filter($"rn" < $"m") // U_m == 0 identically; the cut is interior
    val wPick = Window.partitionBy($"event_type").orderBy(abs($"u").desc, $"day")
    val picked = u.withColumn("pick", row_number().over(wPick)).filter($"pick" === 1)
    val mD = $"n_days".cast("double")
    picked
      .select($"event_type", $"m".as("n_days"), abs($"u").as("k_stat"),
        $"day".cast("timestamp").as("change_day"))
      .withColumn("significant",
        lit(6.0) * $"k_stat".cast("double") * $"k_stat".cast("double") >
          lit(PettittLn40) * (mD * mD * mD + mD * mD))
      .orderBy($"event_type")
  }

  def eventsChangepointPettitt(spark: SparkSession, dir: String): DataFrame =
    pettittOn(dailyOf(spark, dir))

  val eventsChangepointPettittSql: String =
    s"""WITH $dailySql, hist AS (
      |  SELECT event_type, n, CAST(COUNT(*) AS BIGINT) AS t
      |  FROM daily GROUP BY 1, 2
      |), r2 AS (
      |  SELECT event_type, n,
      |    2 * COALESCE(SUM(t) OVER (PARTITION BY event_type ORDER BY n
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + t + 1
      |      AS midrank2
      |  FROM hist
      |), vframe AS (
      |  SELECT d.event_type, d.day,
      |    CAST(COUNT(*) OVER (PARTITION BY d.event_type) AS BIGINT) AS m,
      |    r2.midrank2,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY d.event_type ORDER BY d.day)
      |      AS BIGINT) AS rn
      |  FROM daily d JOIN r2 ON r2.event_type = d.event_type AND r2.n = d.n
      |), u AS (
      |  SELECT event_type, day, m, rn,
      |    CAST(SUM(m + 1 - midrank2)
      |      OVER (PARTITION BY event_type ORDER BY day
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS u
      |  FROM vframe
      |), picked AS (
      |  SELECT event_type, m AS n_days, ABS(u) AS k_stat,
      |    CAST(day AS TIMESTAMP) AS change_day,
      |    ROW_NUMBER() OVER (PARTITION BY event_type
      |      ORDER BY ABS(u) DESC, day) AS pick
      |  FROM u WHERE rn < m
      |)
      |SELECT event_type, n_days, k_stat, change_day,
      |  6.0 * CAST(k_stat AS DOUBLE) * CAST(k_stat AS DOUBLE) >
      |    $PettittLn40 * (CAST(n_days AS DOUBLE) * CAST(n_days AS DOUBLE)
      |      * CAST(n_days AS DOUBLE)
      |      + CAST(n_days AS DOUBLE) * CAST(n_days AS DOUBLE)) AS significant
      |FROM picked WHERE pick = 1
      |ORDER BY event_type""".stripMargin

  /** §2 entry `events_value_spearman` — SPEARMAN rank correlation
    * between daily volume and daily revenue per event type ("do busy
    * days monetize, monotonically?"), the robust twin of the Pearson
    * `events_value_corr`: Pearson bends to one whale day and only sees
    * LINEAR association; Spearman ranks both margins first, so any
    * monotone relation scores and no single day can move either margin
    * by more than one rank step.
    *
    * Scale shape: one corpus pass to the (type, day, n, v) daily frame
    * (counts AND value sums — the value axis needs cents), then BOTH
    * margins' midranks from per-type value histograms (the MW tie
    * device — two bounded windows), Pearson on the double-midranks via
    * exact BIGINT sufficient statistics. Everything after the collapse
    * is calendar-bounded; sums of rank products ≤ 4m⁴ hold in BIGINT
    * to m ≈ 40k days per type — calendar-safe by two orders.
    *
    * Exactness (hash-gate): double-midranks are the exact integers of
    * the MW device; the five Σ's are BIGINT; rho's one divide and one
    * sqrt-of-product run on correctly-rounded doubles mirrored token
    * for token. The large-sample screen z = rho·√(m−1) against 1.96
    * (the house normal literal). A constant margin (all days equal
    * volume or equal revenue) zeroes its variance → NULL rho in both
    * engines; m < 2 likewise.
    */
  private[graft] def dailyValuesOf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .groupBy($"event_type", to_date($"ts").as("day"))
      .agg(count(lit(1)).as("n"),
        sum(($"value".cast("decimal(10,2)") * 100).cast("long")).as("v"))
  }

  private[graft] def spearmanOn(daily: DataFrame): DataFrame = {
    import daily.sparkSession.implicits._
    def rank2Of(key: String): DataFrame = {
      val hist = daily.groupBy($"event_type", col(key)).agg(count(lit(1)).as("t"))
      val w = Window.partitionBy($"event_type").orderBy(col(key))
        .rowsBetween(Window.unboundedPreceding, -1)
      hist.withColumn("below", coalesce(sum($"t").over(w), lit(0L)))
        .select($"event_type", col(key),
          (lit(2L) * $"below" + $"t" + 1L).as(s"r2_$key"))
    }
    val joined = daily
      .join(rank2Of("n"), Seq("event_type", "n"))
      .join(rank2Of("v"), Seq("event_type", "v"))
    val agg = joined.groupBy($"event_type").agg(
      count(lit(1)).as("m"),
      sum($"r2_n").as("sx"), sum($"r2_v").as("sy"),
      sum($"r2_n" * $"r2_n").as("sxx"), sum($"r2_v" * $"r2_v").as("syy"),
      sum($"r2_n" * $"r2_v").as("sxy"))
    val dxx = $"m" * $"sxx" - $"sx" * $"sx"
    val dyy = $"m" * $"syy" - $"sy" * $"sy"
    agg
      .withColumn("rho",
        when($"m" >= 2L && dxx > 0L && dyy > 0L,
          ($"m" * $"sxy" - $"sx" * $"sy").cast("double") /
            sqrt(dxx.cast("double") * dyy.cast("double"))))
      .withColumn("z", when($"rho".isNotNull,
        $"rho" * sqrt(($"m" - 1L).cast("double"))))
      .withColumn("significant",
        when($"z".isNull, lit(null).cast("boolean")).otherwise(abs($"z") > 1.96))
      .select($"event_type", $"m".as("n_days"), $"rho", $"z", $"significant")
      .orderBy($"event_type")
  }

  def eventsValueSpearman(spark: SparkSession, dir: String): DataFrame =
    spearmanOn(dailyValuesOf(spark, dir))

  val eventsValueSpearmanSql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
      |    CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(CAST(CAST(value AS DECIMAL(10,2)) * 100 AS BIGINT))
      |      AS BIGINT) AS v
      |  FROM events GROUP BY 1, 2
      |), rn AS (
      |  SELECT event_type, n,
      |    2 * COALESCE(SUM(t) OVER (PARTITION BY event_type ORDER BY n
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + t + 1
      |      AS r2_n
      |  FROM (SELECT event_type, n, CAST(COUNT(*) AS BIGINT) AS t
      |        FROM daily GROUP BY 1, 2)
      |), rv AS (
      |  SELECT event_type, v,
      |    2 * COALESCE(SUM(t) OVER (PARTITION BY event_type ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + t + 1
      |      AS r2_v
      |  FROM (SELECT event_type, v, CAST(COUNT(*) AS BIGINT) AS t
      |        FROM daily GROUP BY 1, 2)
      |), agg AS (
      |  SELECT d.event_type,
      |    CAST(COUNT(*) AS BIGINT) AS m,
      |    CAST(SUM(rn.r2_n) AS BIGINT) AS sx,
      |    CAST(SUM(rv.r2_v) AS BIGINT) AS sy,
      |    CAST(SUM(rn.r2_n * rn.r2_n) AS BIGINT) AS sxx,
      |    CAST(SUM(rv.r2_v * rv.r2_v) AS BIGINT) AS syy,
      |    CAST(SUM(rn.r2_n * rv.r2_v) AS BIGINT) AS sxy
      |  FROM daily d
      |  JOIN rn ON rn.event_type = d.event_type AND rn.n = d.n
      |  JOIN rv ON rv.event_type = d.event_type AND rv.v = d.v
      |  GROUP BY 1
      |), r AS (
      |  SELECT event_type, m,
      |    CASE WHEN m >= 2 AND m * sxx - sx * sx > 0 AND m * syy - sy * sy > 0
      |      THEN CAST(m * sxy - sx * sy AS DOUBLE) /
      |        sqrt(CAST(m * sxx - sx * sx AS DOUBLE)
      |          * CAST(m * syy - sy * sy AS DOUBLE))
      |      END AS rho
      |  FROM agg
      |), z AS (
      |  SELECT event_type, m, rho,
      |    CASE WHEN rho IS NOT NULL
      |      THEN rho * sqrt(CAST(m - 1 AS DOUBLE)) END AS z
      |  FROM r
      |)
      |SELECT event_type, m AS n_days, rho, z,
      |  CASE WHEN z IS NULL THEN NULL ELSE ABS(z) > 1.96 END AS significant
      |FROM z
      |ORDER BY event_type""".stripMargin

  /** §2 entry `events_runs_test` — the WALD–WOLFOWITZ runs test on the
    * daily series, the assumption-free RANDOMNESS screen that closes
    * the daily-frame battery: Mann–Kendall asks "is there a monotone
    * trend", Pettitt "is there one break", dispersion "is the variance
    * Poisson-like" — this asks "is the sequence ORDER random at all".
    * Days classify above/below the median daily count (median-tied
    * days drop, the standard treatment); too FEW sign runs means
    * clustering (regimes, weekly waves, autocorrelation — the signal
    * to check BEFORE trusting any i.i.d.-flavored readout), too MANY
    * means forced oscillation (load-balancer round-robin, dithering).
    *
    * Scale shape: the shared daily collapse, then bounded per-type
    * windows only — a rank pick for the median (the Theil–Sen picker),
    * one lag for run breaks. The ≤types-row median table broadcast-
    * joins back (hash equi-join, not a nested loop).
    *
    * Exactness (hash-gate): the median enters ONLY through the integer
    * comparison 2n vs med2 (med2 = twice-the-median as an exact BIGINT
    * from the picker: 2·mid for odd counts, lo+hi for even), so
    * classification can never ride a float; run counts and n₁/n₂ are
    * BIGINTs; μ = 2n₁n₂/n + 1, σ² and z are one mirrored double tree.
    * n₁ = 0 or n₂ = 0 (an all-equal or one-sided series) → NULL z and
    * an 'undefined' pattern in both engines.
    */
  private[graft] def runsTestOn(daily: DataFrame): DataFrame = {
    import daily.sparkSession.implicits._
    val wRank = Window.partitionBy($"event_type").orderBy($"n", $"day")
    val ranked = daily
      .withColumn("rnk", row_number().over(wRank).cast("long"))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy($"event_type")))
    val med = ranked
      .filter($"rnk" === expr("(cnt + 1) div 2") || $"rnk" === expr("cnt div 2 + 1"))
      .groupBy($"event_type")
      .agg(expr("(2 * sum(n)) div count(1)").as("med2"))
    val classified = daily.join(med, Seq("event_type"))
      .withColumn("sgn",
        when(lit(2L) * $"n" > $"med2", 1L).when(lit(2L) * $"n" < $"med2", -1L))
      .filter($"sgn".isNotNull)
    val wDay = Window.partitionBy($"event_type").orderBy($"day")
    val runs = classified
      .withColumn("prev", lag($"sgn", 1).over(wDay))
      .withColumn("brk", when($"prev".isNull || $"prev" =!= $"sgn", 1L).otherwise(0L))
    val agg = runs.groupBy($"event_type").agg(
      sum(when($"sgn" === 1L, 1L).otherwise(0L)).as("n_above"),
      sum(when($"sgn" === -1L, 1L).otherwise(0L)).as("n_below"),
      sum($"brk").as("n_runs"))
    val nD = ($"n_above" + $"n_below").cast("double")
    val twoD = (lit(2L) * $"n_above" * $"n_below").cast("double")
    val mu = twoD / nD + 1.0
    val varR = (twoD * (twoD - nD)) / (nD * nD * (nD - 1.0))
    agg
      .withColumn("z",
        when($"n_above" > 0L && $"n_below" > 0L &&
            $"n_above" + $"n_below" > 1L && varR > 0.0,
          ($"n_runs".cast("double") - mu) / sqrt(varR)))
      .withColumn("pattern",
        when($"z".isNull, "undefined")
          .when($"z" < -1.96, "clustered")
          .when($"z" > 1.96, "oscillating")
          .otherwise("random"))
      .select($"event_type", $"n_above", $"n_below", $"n_runs", $"z", $"pattern")
      .orderBy($"event_type")
  }

  def eventsRunsTest(spark: SparkSession, dir: String): DataFrame =
    runsTestOn(dailyOf(spark, dir))

  val eventsRunsTestSql: String =
    s"""WITH $dailySql, ranked AS (
      |  SELECT event_type, day, n,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY n, day)
      |      AS BIGINT) AS rnk,
      |    CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS cnt
      |  FROM daily
      |), med AS (
      |  SELECT event_type, (2 * SUM(n)) // COUNT(*) AS med2
      |  FROM ranked
      |  WHERE rnk = (cnt + 1) // 2 OR rnk = cnt // 2 + 1
      |  GROUP BY 1
      |), classified AS (
      |  SELECT d.event_type, d.day,
      |    CASE WHEN 2 * d.n > m.med2 THEN 1
      |         WHEN 2 * d.n < m.med2 THEN -1 END AS sgn
      |  FROM daily d JOIN med m ON m.event_type = d.event_type
      |), kept AS (
      |  SELECT event_type, day, sgn,
      |    LAG(sgn) OVER (PARTITION BY event_type ORDER BY day) AS prev
      |  FROM classified WHERE sgn IS NOT NULL
      |), agg AS (
      |  SELECT event_type,
      |    CAST(SUM(CASE WHEN sgn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_above,
      |    CAST(SUM(CASE WHEN sgn = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_below,
      |    CAST(SUM(CASE WHEN prev IS NULL OR prev <> sgn THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n_runs
      |  FROM kept GROUP BY 1
      |), z AS (
      |  SELECT event_type, n_above, n_below, n_runs,
      |    CASE WHEN n_above > 0 AND n_below > 0 AND n_above + n_below > 1
      |        AND (CAST(2 * n_above * n_below AS DOUBLE)
      |          * (CAST(2 * n_above * n_below AS DOUBLE)
      |            - CAST(n_above + n_below AS DOUBLE)))
      |          / (CAST(n_above + n_below AS DOUBLE)
      |            * CAST(n_above + n_below AS DOUBLE)
      |            * (CAST(n_above + n_below AS DOUBLE) - 1.0)) > 0.0
      |      THEN (CAST(n_runs AS DOUBLE)
      |          - (CAST(2 * n_above * n_below AS DOUBLE)
      |            / CAST(n_above + n_below AS DOUBLE) + 1.0))
      |        / sqrt((CAST(2 * n_above * n_below AS DOUBLE)
      |            * (CAST(2 * n_above * n_below AS DOUBLE)
      |              - CAST(n_above + n_below AS DOUBLE)))
      |          / (CAST(n_above + n_below AS DOUBLE)
      |            * CAST(n_above + n_below AS DOUBLE)
      |            * (CAST(n_above + n_below AS DOUBLE) - 1.0)))
      |      END AS z
      |  FROM agg
      |)
      |SELECT event_type, n_above, n_below, n_runs, z,
      |  CASE WHEN z IS NULL THEN 'undefined'
      |       WHEN z < -1.96 THEN 'clustered'
      |       WHEN z > 1.96 THEN 'oscillating'
      |       ELSE 'random' END AS pattern
      |FROM z
      |ORDER BY event_type""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_runs_test"         -> (eventsRunsTest _),
    "events_trend_theilsen"    -> (eventsTrendTheilsen _),
    "events_trend_mannkendall" -> (eventsTrendMannKendall _),
    "events_dispersion"        -> (eventsDispersion _),
    "events_level_hl"          -> (eventsLevelHl _),
    "events_changepoint_pettitt" -> (eventsChangepointPettitt _),
    "events_value_spearman"      -> (eventsValueSpearman _)
  )

  val oracleSql: Map[String, String] = Map(
    "events_runs_test"         -> eventsRunsTestSql,
    "events_trend_theilsen"    -> eventsTrendTheilsenSql,
    "events_trend_mannkendall" -> eventsTrendMannKendallSql,
    "events_dispersion"        -> eventsDispersionSql,
    "events_level_hl"          -> eventsLevelHlSql,
    "events_changepoint_pettitt" -> eventsChangepointPettittSql,
    "events_value_spearman"      -> eventsValueSpearmanSql
  )
}
