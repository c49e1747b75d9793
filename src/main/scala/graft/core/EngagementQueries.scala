package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Engagement / journey analytics over the event stream — the two rollups
  * a listening-history dashboard grows into once it has per-event grain:
  * behavior-flow transition matrices and RFM user segmentation. Reference
  * anchor: dashboard_queries.py's aggregates are per-period totals; these
  * are the per-user / per-path shapes beside them (same family as
  * events_funnel / user_retention_cohort).
  */
object EngagementQueries {

  /** Behavior-flow Markov transition matrix: for consecutive events of the
    * same user (ordered by ts, event_id), the (prev → next) event-type
    * counts and the per-prev transition probability — the Sankey /
    * next-action model every product-analytics suite ships.
    *
    * Scale: the lead() window is partitioned by user_id (state per task =
    * one user's slice); the transition rollup is bounded by #types² rows,
    * and its per-prev total joins back as a broadcast tiny table. The
    * probability is ONE IEEE division of two exact BIGINTs per output row
    * — deterministic under any partitioning, so the entry hash-matches
    * DuckDB's double to the last bit.
    */
  def eventsMarkovTransitions(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val pairs = Tables.events(spark, dir)
      .select($"user_id", $"ts", $"event_id", $"event_type")
      .withColumn("next_type", lead($"event_type", 1).over(w))
      .filter($"next_type".isNotNull)
      .select($"event_type".as("prev_type"), $"next_type")
    transitionProbs(pairs.groupBy($"prev_type", $"next_type")
      .agg(count(lit(1)).as("n_transitions")))
  }

  /** Probability projection over a (prev_type, next_type, n_transitions)
    * count table — SHARED verbatim with the streaming fold
    * ([[graft.streaming.MarkovStream]]), so streamed and backfilled
    * matrices cannot diverge: per-prev totals broadcast back, p = ONE
    * IEEE division of two exact BIGINTs per row.
    */
  private[graft] def transitionProbs(counts: DataFrame): DataFrame = {
    import counts.sparkSession.implicits._
    val totals = counts.groupBy($"prev_type").agg(sum($"n_transitions").as("total"))
    counts.join(broadcast(totals), Seq("prev_type"))
      .withColumn("p", $"n_transitions".cast("double") / $"total".cast("double"))
      .select($"prev_type", $"next_type", $"n_transitions", $"p")
      .orderBy($"prev_type", $"next_type")
  }

  val eventsMarkovTransitionsSql: String =
    """WITH seq AS (
      |  SELECT event_type,
      |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
      |  FROM events
      |), c AS (
      |  SELECT event_type AS prev_type, next_type, COUNT(*) AS n_transitions
      |  FROM seq WHERE next_type IS NOT NULL
      |  GROUP BY 1, 2
      |), t AS (
      |  SELECT prev_type, CAST(SUM(n_transitions) AS BIGINT) AS total
      |  FROM c GROUP BY 1
      |)
      |SELECT prev_type, next_type, CAST(n_transitions AS BIGINT) AS n_transitions,
      |  CAST(n_transitions AS DOUBLE) / CAST(total AS DOUBLE) AS p
      |FROM c JOIN t USING (prev_type)
      |ORDER BY prev_type, next_type""".stripMargin

  /** RFM (recency / frequency / monetary) user segmentation: per-user
    * last-seen, event count, and DECIMAL-exact value total, each scored
    * into quartiles (NTILE(4), deterministic user_id tie-break), composed
    * into the classic r·100 + f·10 + m segment code.
    *
    * The NTILE windows run over the per-user AGGREGATE (users ≪ events —
    * the bounded-aggregate window discipline), with the non-foldable
    * constant partition key ([[graft.ops.Curation]]'s device) so no
    * unpartitioned WindowExec plans. At a user count that outgrows one
    * task, the quartile thresholds come from the curriculum entry's
    * two-level sharded rank or percentile_approx — the segment arithmetic
    * is unchanged; that composition is documented, not duplicated, here.
    */
  def userRfmSegments(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val byUser = Tables.events(spark, dir)
      .groupBy($"user_id")
      .agg(
        max($"ts").as("last_seen"),
        count(lit(1)).as("n_events"),
        sum($"value".cast("decimal(18,2)")).cast("double").as("total_value"))
    val one = pmod($"user_id", lit(1L))
    val r = ntile(4).over(Window.partitionBy(one).orderBy($"last_seen", $"user_id"))
    val f = ntile(4).over(Window.partitionBy(one).orderBy($"n_events", $"user_id"))
    val m = ntile(4).over(Window.partitionBy(one).orderBy($"total_value", $"user_id"))
    byUser
      .withColumn("r_score", r)
      .withColumn("f_score", f)
      .withColumn("m_score", m)
      .withColumn("rfm_segment", $"r_score" * 100 + $"f_score" * 10 + $"m_score")
      .orderBy($"user_id")
  }

  val userRfmSegmentsSql: String =
    """WITH u AS (
      |  SELECT user_id, max(ts) AS last_seen,
      |    CAST(COUNT(*) AS BIGINT) AS n_events,
      |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |  FROM events GROUP BY user_id
      |), s AS (
      |  SELECT *,
      |    CAST(ntile(4) OVER (ORDER BY last_seen, user_id) AS INTEGER) AS r_score,
      |    CAST(ntile(4) OVER (ORDER BY n_events, user_id) AS INTEGER) AS f_score,
      |    CAST(ntile(4) OVER (ORDER BY total_value, user_id) AS INTEGER) AS m_score
      |  FROM u
      |)
      |SELECT user_id, last_seen, n_events, total_value, r_score, f_score, m_score,
      |  CAST(r_score * 100 + f_score * 10 + m_score AS INTEGER) AS rfm_segment
      |FROM s
      |ORDER BY user_id""".stripMargin

  /** Activity seasonality: the day-of-week × hour-of-day event matrix
    * with each cell's exact share of total volume — the heatmap behind
    * every "when do users listen" dashboard panel. One partial-agg
    * groupBy (≤ 168 cells), total broadcast back, share = ONE IEEE
    * division of exact BIGINTs. Day-of-week is normalized to DuckDB's
    * 0=Sunday..6 convention (Spark's dayofweek is 1-based) so the cell
    * keys match across engines.
    */
  def eventsSeasonality(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cells = Tables.events(spark, dir)
      .select((dayofweek($"ts") - 1).cast("long").as("dow"),
        hour($"ts").cast("long").as("hod"))
      .groupBy($"dow", $"hod").agg(count(lit(1)).as("n_events"))
    val total = cells.agg(sum($"n_events").as("total"))
    cells.crossJoin(broadcast(total))
      .withColumn("share", $"n_events".cast("double") / $"total".cast("double"))
      .select($"dow", $"hod", $"n_events", $"share")
      .orderBy($"dow", $"hod")
  }

  val eventsSeasonalitySql: String =
    """WITH c AS (
      |  SELECT CAST(dayofweek(ts) AS BIGINT) AS dow,
      |    CAST(hour(ts) AS BIGINT) AS hod, COUNT(*) AS n_events
      |  FROM events GROUP BY 1, 2
      |), t AS (SELECT CAST(SUM(n_events) AS BIGINT) AS total FROM c)
      |SELECT dow, hod, CAST(n_events AS BIGINT) AS n_events,
      |  CAST(n_events AS DOUBLE) / CAST(total AS DOUBLE) AS share
      |FROM c CROSS JOIN t
      |ORDER BY dow, hod""".stripMargin

  /** §2 entry `events_user_growth` — the user-base growth curve: per
    * day, how many users were seen for the FIRST time, how many were
    * active, and the cumulative distinct-user count (the audience-size
    * number every dashboard headline quotes, computed exactly — a
    * cumulative COUNT DISTINCT without ever running a distinct over a
    * growing window).
    *
    * Shape: one (user, day) partial-agg distinct collapses the corpus;
    * first-seen is a user-grain MIN, daily news/actives are ≤ days-sized
    * aggregates, and the cumulative count is a prefix sum over the
    * BOUNDED daily frame behind the non-foldable constant partition key
    * (the bounded-aggregate window discipline). Cumulative distinct ==
    * Σ first-seen because a user is new exactly once — the identity that
    * makes the curve one prefix sum instead of a day² distinct.
    * All-integer → hash-exact.
    */
  def eventsUserGrowth(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val userDays = Tables.events(spark, dir)
      .select($"user_id", to_date($"ts").as("day")).distinct()
    val newByDay = userDays.groupBy($"user_id").agg(min($"day").as("day"))
      .groupBy($"day").agg(count(lit(1)).as("n_new_users"))
    val activeByDay = userDays.groupBy($"day").agg(count(lit(1)).as("n_active_users"))
    val one = pmod(year($"day"), lit(1))
    val w = Window.partitionBy(one).orderBy($"day")
      .rowsBetween(Window.unboundedPreceding, 0)
    activeByDay.join(newByDay, Seq("day"), "left")
      .withColumn("n_new_users", coalesce($"n_new_users", lit(0L)))
      .withColumn("n_cumulative_users", sum($"n_new_users").over(w))
      .select($"day".cast("timestamp").as("day"), $"n_new_users",
        $"n_active_users", $"n_cumulative_users")
      .orderBy($"day")
  }

  val eventsUserGrowthSql: String =
    """WITH ud AS (
      |  SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
      |  FROM events
      |), firsts AS (
      |  SELECT user_id, MIN(day) AS day FROM ud GROUP BY 1
      |), news AS (
      |  SELECT day, CAST(COUNT(*) AS BIGINT) AS n_new_users FROM firsts GROUP BY 1
      |), actives AS (
      |  SELECT day, CAST(COUNT(*) AS BIGINT) AS n_active_users FROM ud GROUP BY 1
      |)
      |SELECT CAST(a.day AS TIMESTAMP) AS day,
      |  COALESCE(n.n_new_users, 0) AS n_new_users,
      |  a.n_active_users,
      |  CAST(SUM(COALESCE(n.n_new_users, 0)) OVER (ORDER BY a.day
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS n_cumulative_users
      |FROM actives a LEFT JOIN news n ON a.day = n.day
      |ORDER BY day""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_markov_transitions" -> (eventsMarkovTransitions _),
    "user_rfm_segments"         -> (userRfmSegments _),
    "events_seasonality"        -> (eventsSeasonality _),
    "events_user_growth"        -> (eventsUserGrowth _)
  )

  val oracleSql: Map[String, String] = Map(
    "events_markov_transitions" -> eventsMarkovTransitionsSql,
    "user_rfm_segments"         -> userRfmSegmentsSql,
    "events_seasonality"        -> eventsSeasonalitySql,
    "events_user_growth"        -> eventsUserGrowthSql
  )
}
