package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** User-behavior analytics over the event stream: ordered-step funnel
  * conversion and cohort retention — the dashboard questions a
  * listening-history product asks right after the top-N charts
  * (reference anchor: dashboard/dashboard_queries.py's engagement grain;
  * dm_ddl.sql's non-skip/session measures are the same "how engaged"
  * axis, these add "when do users convert / come back").
  */
object BehaviorQueries {

  /** Ordered-step funnel: view → click-after-first-view →
    * purchase-after-that-click, each step within a 24-hour attribution
    * window of the previous one. Step k's timestamp is the user's earliest
    * qualifying event strictly after step k-1's (and inside its window), so
    * a click that precedes every view does not count — the strict-sequence,
    * bounded-window semantics real funnel tools use.
    *
    * Scale shape: one shuffle on user_id for the first-view aggregate;
    * the click and purchase passes join events to the (user, t_k) table on
    * user_id — the same key, so AQE reuses the partitioning and no new
    * shuffle key ever appears. Per-step user counts are a single partial
    * agg; the 3-row output is a `stack` over one collected aggregate row.
    * Gap math on whole epoch-seconds (engine-agnostic, see sessionize).
    */
  private val funnelWindowSec = 86400L

  /** The §2 entry: the 3-step view → click → purchase instantiation of
    * [[eventsFunnelOn]] (oracle-gated; the generalized chain is
    * BehaviorSpec-pinned on a 4-step synthetic funnel).
    */
  def eventsFunnel(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    eventsFunnelOn(
      Tables.events(spark, dir)
        .select($"user_id", $"event_type", unix_timestamp($"ts").as("ts_sec")),
      Seq("view", "click", "purchase"))
  }

  /** The 4-step §2 entry: signup → view → click → purchase through the
    * SAME generalized fold — the N-step chain is driver-oracle-gated
    * beyond the reference's 3 steps, not just ScalaTest-pinned. One
    * more step adds one more user_id-keyed join (no new shuffle key)
    * and one more output row.
    */
  def eventsFunnel4(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    eventsFunnelOn(
      Tables.events(spark, dir)
        .select($"user_id", $"event_type", unix_timestamp($"ts").as("ts_sec")),
      Seq("signup", "view", "click", "purchase"))
  }

  /** The general N-step funnel: `steps` is any ordered Seq of event
    * types; step k's timestamp folds out of step k-1's exactly like the
    * fixed 3-step chain (earliest qualifying event strictly after the
    * previous step, inside its `windowSec` attribution window). Step
    * names derive as `<step>_after_<previous>`, which reproduces the
    * reference 3-step labels verbatim — the oracle entry is untouched.
    *
    * Scale shape is unchanged by N: every join in the fold keys on
    * user_id, so ONE Exchange partitioning serves the whole chain
    * regardless of step count, and the output stays N rows.
    */
  private[graft] def eventsFunnelOn(ev: DataFrame, steps: Seq[String],
      windowSec: Long = funnelWindowSec): DataFrame = {
    import ev.sparkSession.implicits._
    require(steps.size >= 2, "a funnel needs at least 2 steps")
    val first = ev.filter($"event_type" === steps.head)
      .groupBy($"user_id").agg(min($"ts_sec").as("t"))
    val stepTimes: Seq[DataFrame] = steps.tail.scanLeft(first) { (prev, step) =>
      ev.filter($"event_type" === step)
        .join(prev, Seq("user_id"))
        .filter($"ts_sec" > $"t" && $"ts_sec" <= $"t" + windowSec)
        .groupBy($"user_id").agg(min($"ts_sec").as("t"))
    }
    val joined = stepTimes.zipWithIndex
      .map { case (df, i) => df.select($"user_id", $"t".as(s"t${i + 1}")) }
      .reduceLeft((acc, next) => acc.join(next, Seq("user_id"), "left"))
    val names = steps.head +: steps.tail.zip(steps).map { case (s, prev) => s"${s}_after_$prev" }
    val counts = joined.agg(
      count($"t1").as("n1"),
      (2 to steps.size).map(i => count(col(s"t$i")).as(s"n$i")): _*)
    // typed-Column unpivot (not a selectExpr stack with interpolated step
    // names: lit() carries any step string — quotes included — as data,
    // never as SQL text)
    val stepRows = names.zipWithIndex.map { case (name, i) =>
      struct(
        lit(i + 1).as("step"),
        lit(name).as("step_name"),
        col(s"n${i + 1}").as("n_users"),
        (col(s"n${i + 1}").cast("double") / col("n1")).as("pct_of_first"))
    }
    counts
      .select(explode(array(stepRows: _*)).as("r"))
      .select($"r.step", $"r.step_name", $"r.n_users", $"r.pct_of_first")
      .orderBy($"step")
  }

  val eventsFunnelSql: String =
    s"""WITH ev AS (
      |  SELECT user_id, event_type,
      |    CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS ts_sec
      |  FROM events
      |), s1 AS (
      |  SELECT user_id, MIN(ts_sec) AS t1 FROM ev
      |  WHERE event_type = 'view' GROUP BY user_id
      |), s2 AS (
      |  SELECT e.user_id, MIN(e.ts_sec) AS t2
      |  FROM ev e JOIN s1 USING (user_id)
      |  WHERE e.event_type = 'click' AND e.ts_sec > s1.t1
      |    AND e.ts_sec <= s1.t1 + $funnelWindowSec
      |  GROUP BY e.user_id
      |), s3 AS (
      |  SELECT e.user_id, MIN(e.ts_sec) AS t3
      |  FROM ev e JOIN s2 USING (user_id)
      |  WHERE e.event_type = 'purchase' AND e.ts_sec > s2.t2
      |    AND e.ts_sec <= s2.t2 + $funnelWindowSec
      |  GROUP BY e.user_id
      |), c AS (
      |  SELECT (SELECT COUNT(*) FROM s1) AS n1,
      |         (SELECT COUNT(*) FROM s2) AS n2,
      |         (SELECT COUNT(*) FROM s3) AS n3
      |)
      |SELECT 1 AS step, 'view' AS step_name, n1 AS n_users,
      |  CAST(n1 AS DOUBLE) / n1 AS pct_of_first FROM c
      |UNION ALL
      |SELECT 2, 'click_after_view', n2, CAST(n2 AS DOUBLE) / n1 FROM c
      |UNION ALL
      |SELECT 3, 'purchase_after_click', n3, CAST(n3 AS DOUBLE) / n1 FROM c
      |ORDER BY step""".stripMargin

  val eventsFunnel4Sql: String =
    s"""WITH ev AS (
      |  SELECT user_id, event_type,
      |    CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS ts_sec
      |  FROM events
      |), s1 AS (
      |  SELECT user_id, MIN(ts_sec) AS t1 FROM ev
      |  WHERE event_type = 'signup' GROUP BY user_id
      |), s2 AS (
      |  SELECT e.user_id, MIN(e.ts_sec) AS t2
      |  FROM ev e JOIN s1 USING (user_id)
      |  WHERE e.event_type = 'view' AND e.ts_sec > s1.t1
      |    AND e.ts_sec <= s1.t1 + $funnelWindowSec
      |  GROUP BY e.user_id
      |), s3 AS (
      |  SELECT e.user_id, MIN(e.ts_sec) AS t3
      |  FROM ev e JOIN s2 USING (user_id)
      |  WHERE e.event_type = 'click' AND e.ts_sec > s2.t2
      |    AND e.ts_sec <= s2.t2 + $funnelWindowSec
      |  GROUP BY e.user_id
      |), s4 AS (
      |  SELECT e.user_id, MIN(e.ts_sec) AS t4
      |  FROM ev e JOIN s3 USING (user_id)
      |  WHERE e.event_type = 'purchase' AND e.ts_sec > s3.t3
      |    AND e.ts_sec <= s3.t3 + $funnelWindowSec
      |  GROUP BY e.user_id
      |), c AS (
      |  SELECT (SELECT COUNT(*) FROM s1) AS n1,
      |         (SELECT COUNT(*) FROM s2) AS n2,
      |         (SELECT COUNT(*) FROM s3) AS n3,
      |         (SELECT COUNT(*) FROM s4) AS n4
      |)
      |SELECT 1 AS step, 'signup' AS step_name, n1 AS n_users,
      |  CAST(n1 AS DOUBLE) / n1 AS pct_of_first FROM c
      |UNION ALL
      |SELECT 2, 'view_after_signup', n2, CAST(n2 AS DOUBLE) / n1 FROM c
      |UNION ALL
      |SELECT 3, 'click_after_view', n3, CAST(n3 AS DOUBLE) / n1 FROM c
      |UNION ALL
      |SELECT 4, 'purchase_after_click', n4, CAST(n4 AS DOUBLE) / n1 FROM c
      |ORDER BY step""".stripMargin

  /** Cohort retention: users grouped by first-activity day, counted on
    * each later active day as (cohort_day, day_offset, n_users,
    * cohort_size, retention_pct).
    *
    * Scale shape: first-activity is one partial-agg groupBy on user_id;
    * active (user, day) pairs are a distinct that partial-aggregates
    * map-side (each user's events collapse to ≤ n_days rows before the
    * shuffle); the join back to cohorts is on user_id again (partitioning
    * reuse); the final rollup keys on (cohort_day, offset) — bounded by
    * days², never by corpus size. Dates are formatted as strings at the
    * edge only (repo policy: no DATE columns in driver output).
    */
  def userRetentionCohort(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select($"user_id", to_date($"ts").as("d"))
    val firsts = ev.groupBy($"user_id").agg(min($"d").as("cohort_d"))
    val sizes = firsts.groupBy($"cohort_d").agg(count(lit(1)).as("cohort_size"))
    val active = ev.distinct()
    active.join(firsts, Seq("user_id"))
      .groupBy($"cohort_d", datediff($"d", $"cohort_d").cast("int").as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
      .join(broadcast(sizes), Seq("cohort_d"))
      .select(
        date_format($"cohort_d", "yyyy-MM-dd").as("cohort_day"),
        $"day_offset", $"n_users", $"cohort_size",
        ($"n_users".cast("double") / $"cohort_size").as("retention_pct"))
      .orderBy($"cohort_day", $"day_offset")
  }

  val userRetentionCohortSql: String =
    """WITH ev AS (
      |  SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d FROM events
      |), firsts AS (
      |  SELECT user_id, MIN(d) AS cohort_d FROM ev GROUP BY user_id
      |), sizes AS (
      |  SELECT cohort_d, COUNT(*) AS cohort_size FROM firsts GROUP BY cohort_d
      |), active AS (
      |  SELECT DISTINCT user_id, d FROM ev
      |), ret AS (
      |  SELECT f.cohort_d,
      |    CAST(date_diff('day', f.cohort_d, a.d) AS INTEGER) AS day_offset,
      |    COUNT(*) AS n_users
      |  FROM active a JOIN firsts f USING (user_id)
      |  GROUP BY 1, 2
      |)
      |SELECT strftime(r.cohort_d, '%Y-%m-%d') AS cohort_day,
      |  r.day_offset, r.n_users, s.cohort_size,
      |  CAST(r.n_users AS DOUBLE) / s.cohort_size AS retention_pct
      |FROM ret r JOIN sizes s USING (cohort_d)
      |ORDER BY cohort_day, day_offset""".stripMargin

  /** Longest consecutive-day activity streak per user (the Wrapped-style
    * "your longest listening streak" stat): classic gaps-and-islands —
    * distinct active days, island id = day − dense day rank (constant
    * within a consecutive run), longest island per user with earliest-
    * start tie-break.
    *
    * Scale shape: the distinct (user, day) set partial-aggregates
    * map-side; every window is PARTITIONED BY user_id (state bounded by
    * one user's days, never global); the per-user pick is a rank inside
    * the same partitioning. One logical shuffle on user_id end to end.
    */
  def listeningStreaks(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy($"user_id")
    val active = Tables.events(spark, dir)
      .select($"user_id", to_date($"ts").as("d")).distinct()
    val streaks = active
      .withColumn("island",
        datediff($"d", lit("2024-01-01").cast("date")) -
          row_number().over(byUser.orderBy($"d")))
      .groupBy($"user_id", $"island")
      .agg(count(lit(1)).as("streak_days"),
        min($"d").as("start_d"), max($"d").as("end_d"))
    streaks
      .withColumn("rk", row_number().over(
        byUser.orderBy($"streak_days".desc, $"start_d")))
      .filter($"rk" === 1)
      .select($"user_id", $"streak_days",
        date_format($"start_d", "yyyy-MM-dd").as("streak_start"),
        date_format($"end_d", "yyyy-MM-dd").as("streak_end"))
      .orderBy($"user_id")
  }

  val listeningStreaksSql: String =
    """WITH active AS (
      |  SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d FROM events
      |), isl AS (
      |  SELECT user_id, d,
      |    date_diff('day', DATE '2024-01-01', d)
      |      - row_number() OVER (PARTITION BY user_id ORDER BY d) AS island
      |  FROM active
      |), streaks AS (
      |  SELECT user_id, island, COUNT(*) AS streak_days,
      |    MIN(d) AS start_d, MAX(d) AS end_d
      |  FROM isl GROUP BY user_id, island
      |), ranked AS (
      |  SELECT *, row_number() OVER (
      |    PARTITION BY user_id ORDER BY streak_days DESC, start_d) AS rk
      |  FROM streaks
      |)
      |SELECT user_id, streak_days,
      |  strftime(start_d, '%Y-%m-%d') AS streak_start,
      |  strftime(end_d, '%Y-%m-%d') AS streak_end
      |FROM ranked WHERE rk = 1
      |ORDER BY user_id""".stripMargin

  /** Daily volume anomaly detection per event type (the monitoring query
    * every event pipeline runs against itself): per-type daily counts
    * z-scored against that type's own mean/std, days beyond |z| > 2
    * flagged. The moment sums (Σc, Σc²) are exact BIGINTs; mean/var/z are
    * then the IDENTICAL double expression tree in Spark and the oracle, so
    * even the floating-point scores hash-match (each IEEE op is exact on
    * identical inputs — the repo's single-double-op rule, chained).
    *
    * Scale shape: daily counts partial-aggregate map-side (key space =
    * types × days); the per-type stats row broadcasts back; z is map-side.
    * Bounded output regardless of event volume.
    */
  def eventsAnomaly(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.events(spark, dir)
      .groupBy($"event_type", to_date($"ts").as("d"))
      .agg(count(lit(1)).as("n_events"))
    val stats = daily.groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        sum($"n_events").as("s"),
        sum($"n_events" * $"n_events").as("q"))
    val mean = $"s".cast("double") / $"n"
    val variance = $"q".cast("double") / $"n" - mean * mean
    daily.join(broadcast(stats), Seq("event_type"))
      // zero deviation (constant counts, or one active day) means nothing
      // is anomalous — guard it or 0/0 = NaN, which abs(..) > 2 would
      // label 'anomaly' (NaN sorts above every double in Spark). The
      // guard is <= 0: the q/n − mean² form can cancel to a tiny NEGATIVE
      // double when true variance ≈ 0 relative to mean², and
      // sqrt(negative) is NaN in Spark but an ERROR in DuckDB — both
      // engines must take the degenerate branch on the same rows
      .withColumn("z_score",
        when(variance <= 0.0, lit(0.0))
          .otherwise(($"n_events".cast("double") - mean) / sqrt(variance)))
      .select($"event_type", date_format($"d", "yyyy-MM-dd").as("day"),
        $"n_events", $"z_score",
        when(abs($"z_score") > 2.0, "anomaly").otherwise("normal").as("verdict"))
      .orderBy($"event_type", $"day")
  }

  val eventsAnomalySql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
      |    COUNT(*) AS n_events
      |  FROM events GROUP BY 1, 2
      |), stats AS (
      |  SELECT event_type, COUNT(*) AS n,
      |    CAST(SUM(n_events) AS BIGINT) AS s,
      |    CAST(SUM(n_events * n_events) AS BIGINT) AS q
      |  FROM daily GROUP BY 1
      |), z AS (
      |  SELECT daily.event_type, d, n_events,
      |    CASE WHEN CAST(q AS DOUBLE) / n - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n) <= 0
      |      THEN 0.0
      |      ELSE (CAST(n_events AS DOUBLE) - CAST(s AS DOUBLE) / n)
      |        / SQRT(CAST(q AS DOUBLE) / n - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n))
      |    END AS z_score
      |  FROM daily JOIN stats ON daily.event_type = stats.event_type
      |)
      |SELECT event_type, strftime(d, '%Y-%m-%d') AS day, n_events, z_score,
      |  CASE WHEN ABS(z_score) > 2.0 THEN 'anomaly' ELSE 'normal' END AS verdict
      |FROM z
      |ORDER BY event_type, day""".stripMargin

  /** DAU / WAU engagement stickiness: per day, the distinct users active
    * that day and in the trailing 7-day window, plus their ratio (the
    * "how habitual is usage" metric every engagement dashboard carries).
    *
    * The trailing window is computed WITHOUT a range-window distinct
    * (distinct counts don't partial-aggregate under sliding windows):
    * each distinct (user, day) pair is exploded to the ≤7 future days it
    * keeps the user "weekly active" for — a map-side ×7 expansion of the
    * already-collapsed (user, day) set, not of raw events — then one
    * partial-agg distinct per day. Bounded by users × days either way.
    */
  def eventsDauWau(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val active = Tables.events(spark, dir)
      .select($"user_id", to_date($"ts").as("d")).distinct()
    val days = active.select($"d".as("day")).distinct()
    val dau = active.groupBy($"d".as("day"))
      .agg(countDistinct($"user_id").as("dau"))
    val wau = active
      .select($"user_id", explode(sequence($"d", date_add($"d", 6))).as("day"))
      .join(days, Seq("day")) // trailing windows exist only for observed days
      .groupBy($"day")
      .agg(countDistinct($"user_id").as("wau"))
    dau.join(wau, Seq("day"))
      .select(date_format($"day", "yyyy-MM-dd").as("day"), $"dau", $"wau",
        ($"dau".cast("double") / $"wau").as("stickiness"))
      .orderBy($"day")
  }

  val eventsDauWauSql: String =
    """WITH active AS (
      |  SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d FROM events
      |), days AS (
      |  SELECT DISTINCT d AS day FROM active
      |), dau AS (
      |  SELECT d AS day, COUNT(DISTINCT user_id) AS dau FROM active GROUP BY 1
      |), expanded AS (
      |  SELECT user_id, d + CAST(u AS INTEGER) AS day
      |  FROM active, UNNEST(range(0, 7)) AS r(u)
      |), wau AS (
      |  SELECT e.day, COUNT(DISTINCT e.user_id) AS wau
      |  FROM expanded e JOIN days USING (day)
      |  GROUP BY 1
      |)
      |SELECT strftime(dau.day, '%Y-%m-%d') AS day, dau.dau, wau.wau,
      |  CAST(dau.dau AS DOUBLE) / wau.wau AS stickiness
      |FROM dau JOIN wau ON dau.day = wau.day
      |ORDER BY day""".stripMargin

  /** Trailing-baseline anomaly screen — the BATCH twin of
    * [[graft.streaming.EventsPipeline.streamingAnomaly]]'s no-lookahead
    * semantics (where [[eventsAnomaly]] scores against GLOBAL stats, this
    * scores each day against only the days BEFORE it — what a live screen
    * could actually have known): exact BIGINT prefix sums (n, Σ, Σ²) via a
    * type-partitioned window over the AGGREGATED daily table (≤ types×days
    * rows — the agg-median window discipline, never raw events), the
    * identical double expression tree in both engines, a 3-closed-day
    * warm-up floor, and the corpus's final day excluded (the stream leaves
    * it open). StreamingSpec pins verdict-for-verdict parity with the
    * streaming fold on replayed batches.
    */
  def eventsAnomalyTrailing(spark: SparkSession, dir: String): DataFrame =
    eventsAnomalyTrailingOn(Tables.events(spark, dir))

  private[graft] def eventsAnomalyTrailingOn(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.expressions.Window
    val daily = events
      .groupBy($"event_type", to_date($"ts").as("d"))
      .agg(count(lit(1)).as("n_events"))
    val maxDay = daily.agg(max($"d").as("max_d")) // 1-row broadcast
    val w = Window.partitionBy($"event_type").orderBy($"d")
      .rowsBetween(Window.unboundedPreceding, -1)
    val scored = daily
      .withColumn("pn", count(lit(1)).over(w))
      .withColumn("ps", sum($"n_events").over(w))
      .withColumn("pq", sum($"n_events" * $"n_events").over(w))
    val mean = $"ps".cast("double") / $"pn"
    val variance = $"pq".cast("double") / $"pn" - mean * mean
    scored.crossJoin(broadcast(maxDay))
      .filter($"d" < $"max_d") // the stream's open final day
      .withColumn("z_score",
        when($"pn" === 0 || variance <= 0.0, lit(0.0))
          .otherwise(($"n_events".cast("double") - mean) / sqrt(variance)))
      .select($"event_type", date_format($"d", "yyyy-MM-dd").as("day"),
        $"n_events", coalesce($"pn", lit(0L)).as("n_baseline"), $"z_score",
        when(abs($"z_score") > 2.0 && $"pn" >= 3, "anomaly").otherwise("normal").as("verdict"))
      .orderBy($"event_type", $"day")
  }

  val eventsAnomalyTrailingSql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS d, COUNT(*) AS n_events
      |  FROM events GROUP BY 1, 2
      |), scored AS (
      |  SELECT event_type, d, n_events,
      |    CAST(COUNT(*) OVER w AS BIGINT) AS pn,
      |    CAST(SUM(n_events) OVER w AS BIGINT) AS ps,
      |    CAST(SUM(n_events * n_events) OVER w AS BIGINT) AS pq
      |  FROM daily
      |  WINDOW w AS (PARTITION BY event_type ORDER BY d
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |), mx AS (
      |  SELECT max(d) AS max_d FROM daily
      |), z AS (
      |  SELECT event_type, d, n_events, coalesce(pn, 0) AS n_baseline,
      |    CASE WHEN pn IS NULL OR pn = 0
      |        OR (CAST(pq AS DOUBLE) / pn - (CAST(ps AS DOUBLE) / pn) * (CAST(ps AS DOUBLE) / pn)) <= 0.0
      |      THEN 0.0
      |      ELSE (CAST(n_events AS DOUBLE) - CAST(ps AS DOUBLE) / pn)
      |        / sqrt(CAST(pq AS DOUBLE) / pn - (CAST(ps AS DOUBLE) / pn) * (CAST(ps AS DOUBLE) / pn))
      |    END AS z_score,
      |    pn
      |  FROM scored CROSS JOIN mx
      |  WHERE d < max_d
      |)
      |SELECT event_type, strftime(d, '%Y-%m-%d') AS day, n_events, n_baseline, z_score,
      |  CASE WHEN abs(z_score) > 2.0 AND pn >= 3 THEN 'anomaly' ELSE 'normal' END AS verdict
      |FROM z
      |ORDER BY event_type, day""".stripMargin

  /** Top user-journey trigrams: the most common 3-step event-type paths
    * taken INSIDE a session (the sessionize_events 30-min-gap sessions,
    * re-derived with the identical window so the two entries can never
    * disagree on session boundaries). The journey miner behind funnel
    * design — funnels test paths someone hypothesized; this surfaces the
    * paths users actually walk. Counts are exact integers; top-20 cut
    * ordered (count desc, path asc); path emitted as one flat string
    * ("a>b>c" — SchemaContract-safe). Shape: the session window is
    * partitioned by (user, session), the trigram count is one partial
    * agg on a low-cardinality key (|types|³ ≤ a few thousand), and the
    * final rank runs over the 20-row aggregate — nothing single-
    * partition ever sees raw events.
    */
  def eventsPathTopk(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select($"user_id", $"event_id", $"event_type",
        unix_timestamp($"ts").as("ts_sec"))
    val byUser = Window.partitionBy($"user_id").orderBy($"ts_sec", $"event_id")
    val newSess = when($"ts_sec" - lag($"ts_sec", 1).over(byUser) > lit(1800), lit(1))
      .otherwise(lit(0))
    val sess = ev
      .withColumn("is_new", when(lag($"ts_sec", 1).over(byUser).isNull, lit(1)).otherwise(newSess))
      .withColumn("session_seq", sum($"is_new").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val inSess = Window.partitionBy($"user_id", $"session_seq").orderBy($"ts_sec", $"event_id")
    val tri = sess
      .withColumn("t2", lead($"event_type", 1).over(inSess))
      .withColumn("t3", lead($"event_type", 2).over(inSess))
      .filter($"t2".isNotNull && $"t3".isNotNull)
      .select(concat_ws(">", $"event_type", $"t2", $"t3").as("path"))
    val top = tri.groupBy($"path").agg(count(lit(1)).as("n_sessions_walked"))
      .orderBy($"n_sessions_walked".desc, $"path")
      .limit(20)
    top.withColumn("rank", row_number().over(
        Window.partitionBy(pmod(length($"path"), lit(1)))
          .orderBy($"n_sessions_walked".desc, $"path")).cast("long"))
      .orderBy($"rank")
  }

  val eventsPathTopkSql: String =
    """WITH ev AS (
      |  SELECT user_id, event_id, event_type,
      |    CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS ts_sec
      |  FROM events
      |), flagged AS (
      |  SELECT *,
      |    CASE WHEN lag(ts_sec) OVER w IS NULL THEN 1
      |         WHEN ts_sec - lag(ts_sec) OVER w > 1800 THEN 1
      |         ELSE 0 END AS is_new
      |  FROM ev
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec, event_id)
      |), sessions AS (
      |  SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_sec, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
      |  FROM flagged
      |), tri AS (
      |  SELECT event_type || '>' || lead(event_type, 1) OVER s
      |      || '>' || lead(event_type, 2) OVER s AS path,
      |    lead(event_type, 2) OVER s AS t3
      |  FROM sessions
      |  WINDOW s AS (PARTITION BY user_id, session_seq ORDER BY ts_sec, event_id)
      |)
      |SELECT path, n_sessions_walked,
      |  row_number() OVER (ORDER BY n_sessions_walked DESC, path) AS rank
      |FROM (
      |  SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions_walked
      |  FROM tri WHERE t3 IS NOT NULL
      |  GROUP BY path
      |)
      |ORDER BY n_sessions_walked DESC, path
      |LIMIT 20""".stripMargin

  /** §2 `events_survival_km`: Kaplan–Meier time-to-conversion — the
    * censoring-correct answer to "how long until a signup converts"
    * (the funnel's 24 h window counts conversions; the naive mean of
    * observed waits is biased LOW because slow converters are still
    * unobserved — KM is the standard estimator that uses censored
    * subjects correctly). Subjects: each user's FIRST signup; event:
    * their first purchase strictly after it; censoring: the corpus
    * frontier (the delta_load watermark device, broadcast scalar).
    * S(t) steps down by (1 − d_t/n_t) at each observed conversion time.
    *
    * Scale shape: subjects are ONE per-user aggregate; the risk table
    * is ≤ #subjects rows, so the cumulative windows (at-risk counts,
    * the Π(1−d/n) as exp·Σln on the BOUNDED sorted table) never see the
    * corpus. Rows-only (the product is transcendental via exp/ln);
    * SurvivalSpec pins the whole curve against a driver-side KM
    * reference to 1e-9 and the monotone-step shape.
    */
  def eventsSurvivalKm(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select($"user_id", unix_timestamp($"ts").as("ts_sec"), $"event_type")
    val signup = ev.filter($"event_type" === "signup")
      .groupBy($"user_id").agg(min($"ts_sec").as("s_ts"))
    val firstPurch = ev.filter($"event_type" === "purchase")
      .join(signup, Seq("user_id"))
      .filter($"ts_sec" > $"s_ts")
      .groupBy($"user_id").agg(min($"ts_sec").as("p_ts"))
    val mx = ev.agg(max($"ts_sec").as("max_ts"))
    val subj = signup.join(firstPurch, Seq("user_id"), "left")
      .crossJoin(broadcast(mx))
      .withColumn("duration", coalesce($"p_ts" - $"s_ts", $"max_ts" - $"s_ts"))
      .withColumn("converted", $"p_ts".isNotNull)
    val nTotal = subj.agg(count(lit(1)).as("n_total"))
    val durCounts = subj.groupBy($"duration").agg(count(lit(1)).as("c"))
    val wBefore = Window.partitionBy(pmod($"duration", lit(1)))
      .orderBy($"duration").rowsBetween(Window.unboundedPreceding, -1)
    val cum = durCounts
      .withColumn("cum_before", coalesce(sum($"c").over(wBefore), lit(0L)))
      .select($"duration", $"cum_before")
    val deaths = subj.filter($"converted")
      .groupBy($"duration".as("t_sec")).agg(count(lit(1)).as("d"))
    val risk = deaths.join(cum, deaths("t_sec") === cum("duration"))
      .crossJoin(broadcast(nTotal))
      .select($"t_sec", $"d", ($"n_total" - $"cum_before").as("n_at_risk"))
    val wKm = Window.partitionBy(pmod($"t_sec", lit(1)))
      .orderBy($"t_sec").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    risk
      .withColumn("factor", lit(1.0) - $"d".cast("double") / $"n_at_risk".cast("double"))
      // Spark's log() returns NULL at 0 and the window sum would silently
      // skip it — the terminal d==n step must drive S to exactly 0, so
      // zero factors are counted explicitly instead of logged
      .withColumn("n_zero_factors",
        sum(when($"factor" <= 0.0, 1L).otherwise(0L)).over(wKm))
      .withColumn("survival",
        when($"n_zero_factors" > 0, lit(0.0))
          .otherwise(exp(sum(when($"factor" > 0.0, log($"factor"))).over(wKm))))
      .select($"t_sec", $"n_at_risk", $"d".as("n_converted"), $"survival")
      .orderBy($"t_sec")
  }

  /** §2 `events_peak_concurrency`: per-day PEAK concurrent sessions —
    * the capacity number next to events_intervals_union's coverage
    * total (union answers "how much time was covered"; this answers
    * "how many at once at the worst moment", which is what a serving
    * fleet is actually sized for). Sessions come from the
    * sessionize_events core VERBATIM (same 30-min gap rule, so the two
    * entries cannot disagree on session bounds); each session explodes
    * over the epoch-days it overlaps (bounded by session length), and
    * within each day a classic sweep line (+1 at clamped start, −1 at
    * clamped end+1, ties resolved −1-first so touching sessions never
    * inflate the peak) runs as a day-partitioned window over ≤
    * 2·sessions-per-day boundary points — never the raw events.
    * Day arithmetic is pure epoch integer division (no DATE types near
    * the gate). Exact integers end-to-end.
    */
  def eventsPeakConcurrency(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sessions = CoreQueries.sessionizeEvents(spark, dir)
      .select($"user_id", $"session_seq", $"session_start_sec", $"session_end_sec")
      .withColumn("d0", expr("session_start_sec div 86400"))
      .withColumn("d1", expr("session_end_sec div 86400"))
    val perDay = sessions
      .withColumn("day_num", explode(sequence($"d0", $"d1")))
      .withColumn("lo", greatest($"session_start_sec", $"day_num" * 86400))
      .withColumn("hi", least($"session_end_sec", $"day_num" * 86400 + 86399))
    val pts = perDay.select($"day_num", $"lo".as("t"), lit(1L).as("delta"))
      .unionByName(perDay.select($"day_num", ($"hi" + 1).as("t"), lit(-1L).as("delta")))
    val wSweep = Window.partitionBy($"day_num").orderBy($"t", $"delta")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val swept = pts.withColumn("active", sum($"delta").over(wSweep))
    val peaks = swept.groupBy($"day_num").agg(max($"active").as("peak_concurrency"))
    val counts = perDay.groupBy($"day_num").agg(count(lit(1)).as("n_sessions"))
    counts.join(peaks, Seq("day_num"))
      .select($"day_num", $"n_sessions", $"peak_concurrency")
      .orderBy($"day_num")
  }

  val eventsPeakConcurrencySql: String =
    """WITH ev AS (
      |  SELECT user_id, event_id,
      |    CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS ts_sec
      |  FROM events
      |), flagged AS (
      |  SELECT *,
      |    CASE WHEN lag(ts_sec) OVER w IS NULL THEN 1
      |         WHEN ts_sec - lag(ts_sec) OVER w > 1800 THEN 1
      |         ELSE 0 END AS is_new
      |  FROM ev
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec, event_id)
      |), sess AS (
      |  SELECT user_id,
      |    CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_sec, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq,
      |    ts_sec
      |  FROM flagged
      |), bounds AS (
      |  SELECT user_id, session_seq,
      |    MIN(ts_sec) AS s0, MAX(ts_sec) AS s1
      |  FROM sess GROUP BY user_id, session_seq
      |), per_day AS (
      |  SELECT user_id, session_seq, s0, s1, CAST(u AS BIGINT) AS day_num,
      |    greatest(s0, CAST(u AS BIGINT) * 86400) AS lo,
      |    least(s1, CAST(u AS BIGINT) * 86400 + 86399) AS hi
      |  FROM bounds, UNNEST(range(s0 // 86400, s1 // 86400 + 1)) AS r(u)
      |), pts AS (
      |  SELECT day_num, lo AS t, CAST(1 AS BIGINT) AS delta FROM per_day
      |  UNION ALL
      |  SELECT day_num, hi + 1 AS t, CAST(-1 AS BIGINT) AS delta FROM per_day
      |), swept AS (
      |  SELECT day_num,
      |    CAST(SUM(delta) OVER (PARTITION BY day_num ORDER BY t, delta
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS active
      |  FROM pts
      |), peaks AS (
      |  SELECT day_num, MAX(active) AS peak_concurrency FROM swept GROUP BY day_num
      |), counts AS (
      |  SELECT day_num, COUNT(*) AS n_sessions FROM per_day GROUP BY day_num
      |)
      |SELECT counts.day_num, n_sessions, peak_concurrency
      |FROM counts JOIN peaks ON counts.day_num = peaks.day_num
      |ORDER BY counts.day_num""".stripMargin

  /** §2 `events_retention_bitmap`: lag-k retention for EVERY horizon
    * k ∈ 1..62 in one pass, via per-user activity BITMAPS — the
    * bitmap-index device (Roaring-style, one machine word per user
    * here): a user's last 63 days collapse to one BIGINT with bit i set
    * iff they were active i days before the corpus frontier, so "active
    * on two days k apart" is `mask & (mask >> k)` — popcount counts the
    * co-active day pairs and a nonzero word marks a retained user. The
    * join-free contrast: user_retention_cohort answers one horizon per
    * row via a self-join shape; this answers all 62 with zero joins
    * after the mask build.
    *
    * Scale shape: ONE user-keyed aggregation builds the masks (the
    * per-user distinct-day set collapses map-side via the partial
    * sum(DISTINCT bit) — each distinct (user, day) contributes one
    * power of two, so sum-distinct IS bit_or); the 62-lag expansion
    * runs on #users rows (bounded fan-out, no shuffle — lag is derived
    * per row), and the rollup is a 62-group aggregate. The frontier is
    * the usual broadcast 1-row scalar. Exact integers end-to-end: bits
    * stay in 0..62, so no mask is ever negative and arithmetic vs
    * logical shift cannot diverge between engines.
    */
  def eventsRetentionBitmap(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    retentionBitmapOn(Tables.events(spark, dir)
      .select($"user_id", expr("unix_timestamp(ts) div 86400").as("day_num")))
  }

  /** Core over any (user_id, day_num) frame — spec-testable against a
    * naive per-lag distinct-day self-join.
    */
  private[graft] def retentionBitmapOn(ev: DataFrame): DataFrame = {
    val spark = ev.sparkSession
    import spark.implicits._
    val mx = ev.agg(max($"day_num").as("max_day"))
    val masks = ev.crossJoin(broadcast(mx))
      .withColumn("idx", ($"max_day" - $"day_num").cast("int"))
      .filter($"idx" <= 62)
      .groupBy($"user_id")
      // shiftleft via SQL expr: the Scala helper only takes a literal
      // shift amount, the SQL function takes any expression
      .agg(sum_distinct(expr("shiftleft(1L, idx)")).as("mask"))
    masks
      .select($"mask", explode(sequence(lit(1), lit(62))).as("lag"))
      .withColumn("co", $"mask".bitwiseAND(expr("shiftright(mask, lag)")))
      .groupBy($"lag")
      .agg(sum(bit_count($"co")).cast("long").as("n_copresent_user_days"),
        sum(when($"co" =!= 0L, 1L).otherwise(0L)).as("n_users_retained"))
      .select($"lag".cast("int").as("lag"),
        $"n_copresent_user_days", $"n_users_retained")
      .orderBy($"lag")
  }

  val eventsRetentionBitmapSql: String =
    """WITH ev AS (
      |  SELECT user_id,
      |    CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) // 86400 AS day_num
      |  FROM events
      |), mx AS (
      |  SELECT MAX(day_num) AS max_day FROM ev
      |), masks AS (
      |  SELECT user_id,
      |    CAST(SUM(DISTINCT 1::BIGINT << CAST(max_day - day_num AS INT)) AS BIGINT) AS mask
      |  FROM ev, mx
      |  WHERE max_day - day_num <= 62
      |  GROUP BY user_id
      |), lagged AS (
      |  SELECT CAST(u AS INT) AS lag, mask & (mask >> CAST(u AS INT)) AS co
      |  FROM masks, UNNEST(range(1, 63)) AS r(u)
      |)
      |SELECT lag,
      |  CAST(SUM(bit_count(co)) AS BIGINT) AS n_copresent_user_days,
      |  CAST(SUM(CASE WHEN co <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_users_retained
      |FROM lagged GROUP BY lag
      |ORDER BY lag""".stripMargin

  /** §2 entry `events_gapfill_ffill` (round 12): calendar GAP-FILL with
    * FORWARD FILL — the regular-grid resample every time-series pipeline
    * runs before modeling (forecasters, anomaly scores, and retention
    * math all assume one row per (entity, day); raw event streams have
    * holes wherever a user went quiet). Per user: the daily activity
    * rollup lands on the user's complete [first_day, last_day] calendar
    * span — absent days appear with n_events = 0 and is_gap = 1 — and
    * the last observed daily spend carries forward across the gap
    * (`ffill_value`), the standard last-observation-carried-forward
    * semantics.
    *
    * Scale shape: one corpus aggregate to daily grain (map-side
    * combine), one ENTITY-grain span aggregate whose `sequence` explode
    * builds the grid (output size = Σ user spans — the operator's
    * contract, not a blow-up), one (user, day) equi-join, and a
    * USER-partitioned running window for the carry (the sessionize
    * discipline — the fleet-wide PlanSpec guard proves no global
    * window). Hash-exact end to end: counts and flags are integers, the
    * daily spend is an exact DECIMAL sum cast once, and forward-fill
    * only COPIES values — no float arithmetic anywhere.
    */
  def eventsGapfillFfill(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    eventsGapfillFfillOn(Tables.events(spark, dir))
  }

  /** Core over any (user_id, ts, value) frame — spec-testable on planted
    * gap shapes. */
  private[graft] def eventsGapfillFfillOn(ev: DataFrame): DataFrame = {
    import ev.sparkSession.implicits._
    val daily = ev
      .select($"user_id", to_date($"ts").as("d"),
        $"value".cast("decimal(10,2)").as("v"))
      .groupBy($"user_id", $"d")
      .agg(count(lit(1)).as("n_events"), sum($"v").as("day_value"))
    val grid = daily.groupBy($"user_id")
      .agg(min($"d").as("d0"), max($"d").as("d1"))
      .select($"user_id", explode(sequence($"d0", $"d1")).as("d"))
    val carry = Window.partitionBy($"user_id").orderBy($"d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(daily, Seq("user_id", "d"), "left")
      .select($"user_id", $"d",
        coalesce($"n_events", lit(0L)).as("n_events"), $"day_value")
      .withColumn("ffill_value",
        last($"day_value", ignoreNulls = true).over(carry).cast("double"))
      .select($"user_id", date_format($"d", "yyyy-MM-dd").as("day"),
        $"n_events",
        ($"n_events" === 0L).cast("int").as("is_gap"),
        $"ffill_value")
      .orderBy($"user_id", $"day")
  }

  val eventsGapfillFfillSql: String =
    """WITH ev AS (
      |  SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
      |    CAST(value AS DECIMAL(10,2)) AS v
      |  FROM events
      |), daily AS (
      |  SELECT user_id, d, CAST(COUNT(*) AS BIGINT) AS n_events, SUM(v) AS day_value
      |  FROM ev GROUP BY 1, 2
      |), span AS (
      |  SELECT user_id, MIN(d) AS d0, MAX(d) AS d1 FROM daily GROUP BY 1
      |), grid AS (
      |  SELECT user_id,
      |    d0 + CAST(UNNEST(range(0, date_diff('day', d0, d1) + 1)) AS INTEGER) AS d
      |  FROM span
      |), joined AS (
      |  SELECT g.user_id, g.d,
      |    CAST(COALESCE(dy.n_events, 0) AS BIGINT) AS n_events,
      |    dy.day_value
      |  FROM grid g LEFT JOIN daily dy ON dy.user_id = g.user_id AND dy.d = g.d
      |)
      |SELECT user_id, strftime(d, '%Y-%m-%d') AS day, n_events,
      |  CAST(CASE WHEN n_events = 0 THEN 1 ELSE 0 END AS INT) AS is_gap,
      |  CAST(last_value(day_value IGNORE NULLS) OVER (
      |    PARTITION BY user_id ORDER BY d
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS ffill_value
      |FROM joined
      |ORDER BY user_id, day""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_gapfill_ffill"  -> (eventsGapfillFfill _),
    "events_retention_bitmap" -> (eventsRetentionBitmap _),
    "events_peak_concurrency" -> (eventsPeakConcurrency _),
    "events_survival_km"    -> (eventsSurvivalKm _),
    "events_path_topk"      -> (eventsPathTopk _),
    "events_anomaly_trailing" -> (eventsAnomalyTrailing _),
    "events_dau_wau"        -> (eventsDauWau _),
    "events_anomaly"        -> (eventsAnomaly _),
    "events_funnel"         -> (eventsFunnel _),
    "events_funnel4"        -> (eventsFunnel4 _),
    "user_retention_cohort" -> (userRetentionCohort _),
    "dm_listening_streaks"  -> (listeningStreaks _)
  )

  val oracleSql: Map[String, String] = Map(
    "events_gapfill_ffill"  -> eventsGapfillFfillSql,
    "events_retention_bitmap" -> eventsRetentionBitmapSql,
    "events_peak_concurrency" -> eventsPeakConcurrencySql,
    "events_path_topk"      -> eventsPathTopkSql,
    "events_anomaly_trailing" -> eventsAnomalyTrailingSql,
    "events_dau_wau"        -> eventsDauWauSql,
    "events_anomaly"        -> eventsAnomalySql,
    "events_funnel"         -> eventsFunnelSql,
    "events_funnel4"        -> eventsFunnel4Sql,
    "user_retention_cohort" -> userRetentionCohortSql,
    "dm_listening_streaks"  -> listeningStreaksSql
  )
}
