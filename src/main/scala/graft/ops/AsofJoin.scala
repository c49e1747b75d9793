package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** As-of (point-in-time) join: for each left row, the most recent right row
  * with right.ts ≤ left.ts within the same key.
  *
  * Spark has no native as-of join; the classic distributed formulation is
  * union → single sort per key → forward-fill with last(ignoreNulls), which
  * costs ONE shuffle on the key (same as any co-partitioned join) instead
  * of a per-row range probe. This is (a) "compose existing ops" from the
  * custom-operator preference order — the plan is a window over a union,
  * fully codegen'd, and AQE-managed.
  */
object AsofJoin {

  /** General API: left/right must share `key` and `ts` columns; every right
    * column in `payload` is forward-filled onto left rows.
    */
  def asof(left: DataFrame, right: DataFrame, key: String, ts: String,
      payload: Seq[String]): DataFrame = {
    val spark = left.sparkSession
    import spark.implicits._
    val l = left.withColumn("_is_right", lit(0))
    val r = right.withColumn("_is_right", lit(1))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // at equal ts the right row sorts first, so it is visible to the left row
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts).asc, $"_is_right".desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = payload.foldLeft(unioned) { (df, c) =>
      df.withColumn(s"asof_$c", last(when($"_is_right" === 1, col(c)), ignoreNulls = true).over(w))
    }
    filled.filter($"_is_right" === 0).drop("_is_right").drop(payload: _*)
  }

  /** FORWARD as-of: for each left row, the EARLIEST right row with
    * right.ts ≥ left.ts in the same key — the time-to-next-event
    * direction ([[asof]] looks back; this looks ahead). Same one-shuffle
    * union+window machinery with the sort reversed: descending ts with
    * right rows first at ties, so the running last-right any left row
    * sees is the nearest right at-or-after it.
    */
  def asofForward(left: DataFrame, right: DataFrame, key: String, ts: String,
      payload: Seq[String]): DataFrame = {
    val spark = left.sparkSession
    import spark.implicits._
    val l = left.withColumn("_is_right", lit(0))
    val r = right.withColumn("_is_right", lit(1))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // descending: the frame holds every row with ts ≥ current (right rows
    // first at equal ts, so "at or after" includes the tie)
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts).desc, $"_is_right".desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = payload.foldLeft(unioned) { (df, c) =>
      df.withColumn(s"asof_$c", last(when($"_is_right" === 1, col(c)), ignoreNulls = true).over(w))
    }
    filled.filter($"_is_right" === 0).drop("_is_right").drop(payload: _*)
  }

  /** For each signup, the user's NEXT purchase at or after it
    * (convert_sec = time to first conversion; null = never converted).
    */
  def asofJoinForward(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select($"event_id", $"user_id", unix_timestamp($"ts").as("ts_sec"), $"event_type")
    val signups = ev.filter($"event_type" === "signup")
      .select($"event_id", $"user_id", $"ts_sec")
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"ts_sec", $"ts_sec".as("purchase_ts_sec"))
    asofForward(signups, purchases, "user_id", "ts_sec", Seq("purchase_ts_sec"))
      .select($"event_id", $"user_id", $"ts_sec".as("signup_ts_sec"),
        $"asof_purchase_ts_sec".as("purchase_ts_sec"),
        ($"asof_purchase_ts_sec" - $"ts_sec").as("convert_sec"))
      .orderBy($"event_id")
  }

  val asofJoinForwardSql: String =
    """WITH ev AS (
      |  SELECT event_id, user_id, event_type,
      |    CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS ts_sec
      |  FROM events
      |), signups AS (
      |  SELECT event_id, user_id, ts_sec FROM ev WHERE event_type = 'signup'
      |), purchases AS (
      |  SELECT user_id, ts_sec AS purchase_ts_sec FROM ev WHERE event_type = 'purchase'
      |)
      |SELECT s.event_id, s.user_id, s.ts_sec AS signup_ts_sec,
      |  p.purchase_ts_sec,
      |  p.purchase_ts_sec - s.ts_sec AS convert_sec
      |FROM signups s
      |ASOF LEFT JOIN purchases p
      |  ON s.user_id = p.user_id AND s.ts_sec <= p.purchase_ts_sec
      |ORDER BY s.event_id""".stripMargin

  /** For each purchase event, the user's most recent signup at or before it
    * (wait_sec = time since signup; null = organic purchase, no signup yet).
    */
  def asofJoinEvents(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select($"event_id", $"user_id", unix_timestamp($"ts").as("ts_sec"), $"event_type")
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts_sec")
    val signups = ev.filter($"event_type" === "signup")
      .select($"user_id", $"ts_sec", $"ts_sec".as("signup_ts_sec"))
    asof(purchases, signups, "user_id", "ts_sec", Seq("signup_ts_sec"))
      .select($"event_id", $"user_id", $"ts_sec".as("purchase_ts_sec"),
        $"asof_signup_ts_sec".as("signup_ts_sec"),
        ($"ts_sec" - $"asof_signup_ts_sec").as("wait_sec"))
      .orderBy($"event_id")
  }

  val asofJoinEventsSql: String =
    """WITH ev AS (
      |  SELECT event_id, user_id, event_type,
      |    CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS ts_sec
      |  FROM events
      |), purchases AS (
      |  SELECT event_id, user_id, ts_sec FROM ev WHERE event_type = 'purchase'
      |), signups AS (
      |  SELECT user_id, ts_sec AS signup_ts_sec FROM ev WHERE event_type = 'signup'
      |)
      |SELECT p.event_id, p.user_id, p.ts_sec AS purchase_ts_sec,
      |  s.signup_ts_sec,
      |  p.ts_sec - s.signup_ts_sec AS wait_sec
      |FROM purchases p
      |ASOF LEFT JOIN signups s
      |  ON p.user_id = s.user_id AND p.ts_sec >= s.signup_ts_sec
      |ORDER BY p.event_id""".stripMargin

  /** The same as-of semantics through the NATIVE custom operator
    * (plans.AsofJoinNative: logical node + strategy + sort-merge SparkPlan)
    * — oracle-checked against the identical DuckDB ASOF JOIN, so the
    * custom physical operator is held to the same bit-exact gate as the
    * declarative form.
    */
  def asofJoinNative(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select($"event_id", $"user_id", unix_timestamp($"ts").as("ts_sec"), $"event_type")
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts_sec")
    val signups = ev.filter($"event_type" === "signup")
      .select($"user_id", $"ts_sec", $"ts_sec".as("signup_ts_sec"))
    graft.plans.AsofJoinNative.asof(purchases, signups, "user_id", "ts_sec", Seq("signup_ts_sec"))
      .select($"event_id", $"user_id", $"ts_sec".as("purchase_ts_sec"),
        $"asof_signup_ts_sec".as("signup_ts_sec"),
        ($"ts_sec" - $"asof_signup_ts_sec").as("wait_sec"))
      .orderBy($"event_id")
  }

  /** FORWARD as-of through the native operator — the direction flag on
    * [[graft.plans.AsofJoinNative.AsofJoinExec]]'s streaming merge
    * (reversed time scan, inclusive-tie consume). Same query shape and
    * DuckDB forward-ASOF oracle as the union+window [[asofJoinForward]],
    * so both formulations are held to the identical bit-exact gate.
    */
  def asofJoinForwardNative(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select($"event_id", $"user_id", unix_timestamp($"ts").as("ts_sec"), $"event_type")
    val signups = ev.filter($"event_type" === "signup")
      .select($"event_id", $"user_id", $"ts_sec")
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"ts_sec", $"ts_sec".as("purchase_ts_sec"))
    graft.plans.AsofJoinNative.asof(signups, purchases, "user_id", "ts_sec",
        Seq("purchase_ts_sec"), forward = true)
      .select($"event_id", $"user_id", $"ts_sec".as("signup_ts_sec"),
        $"asof_purchase_ts_sec".as("purchase_ts_sec"),
        ($"asof_purchase_ts_sec" - $"ts_sec").as("convert_sec"))
      .orderBy($"event_id")
  }

  /** TOLERANCE-bounded as-of (pandas merge_asof's `tolerance`): the
    * backward match only counts if the gap fits within `TolSec` — else the
    * left row keeps NULLs. The distinguishing production case: attributing
    * a purchase to a signup only if it happened within the attribution
    * window; an unbounded as-of silently attributes years-stale matches.
    * Same one-shuffle union+window plan as [[asofJoinEvents]]; the bound
    * is a pure map-side post-projection (nulling, not filtering — row
    * count stays the left side's, exactly merge_asof semantics). Oracle:
    * the same DuckDB ASOF LEFT JOIN with the gap CASE'd to NULL.
    */
  private val TolSec = 86400L // 24 h attribution window

  def asofJoinTolerance(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select($"event_id", $"user_id", unix_timestamp($"ts").as("ts_sec"), $"event_type")
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts_sec")
    val signups = ev.filter($"event_type" === "signup")
      .select($"user_id", $"ts_sec", $"ts_sec".as("signup_ts_sec"))
    val within = $"ts_sec" - $"asof_signup_ts_sec" <= TolSec
    asof(purchases, signups, "user_id", "ts_sec", Seq("signup_ts_sec"))
      .select($"event_id", $"user_id", $"ts_sec".as("purchase_ts_sec"),
        when(within, $"asof_signup_ts_sec").as("signup_ts_sec"),
        when(within, $"ts_sec" - $"asof_signup_ts_sec").as("wait_sec"))
      .orderBy($"event_id")
  }

  val asofJoinToleranceSql: String =
    s"""WITH ev AS (
       |  SELECT event_id, user_id, event_type,
       |    CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS ts_sec
       |  FROM events
       |), purchases AS (
       |  SELECT event_id, user_id, ts_sec FROM ev WHERE event_type = 'purchase'
       |), signups AS (
       |  SELECT user_id, ts_sec AS signup_ts_sec FROM ev WHERE event_type = 'signup'
       |)
       |SELECT p.event_id, p.user_id, p.ts_sec AS purchase_ts_sec,
       |  CASE WHEN p.ts_sec - s.signup_ts_sec <= $TolSec THEN s.signup_ts_sec END AS signup_ts_sec,
       |  CASE WHEN p.ts_sec - s.signup_ts_sec <= $TolSec THEN p.ts_sec - s.signup_ts_sec END AS wait_sec
       |FROM purchases p
       |ASOF LEFT JOIN signups s
       |  ON p.user_id = s.user_id AND p.ts_sec >= s.signup_ts_sec
       |ORDER BY p.event_id""".stripMargin

  /** §2 `asof_join_nearest`: the fourth standard as-of direction (pandas
    * merge_asof `direction='nearest'`), completing backward / forward /
    * tolerance: for each purchase, the signup MINIMIZING |Δt| in either
    * direction, ties broken toward the backward match (the
    * point-in-time-correct side — at equal distance the match that was
    * already knowable wins). Composed as the backward fill chained into
    * the forward fill — two key-partitioned window passes over the same
    * union shape (same shuffle key both times, so the second pass
    * reuses the partitioning layout AQE established) — then a pure
    * row-local argmin; `dt_sec` is SIGNED (positive = signup before
    * purchase) so the pick is auditable per row. The DuckDB oracle is
    * two chained ASOF LEFT JOINs with the identical tie rule.
    */
  def asofJoinNearest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select($"event_id", $"user_id", unix_timestamp($"ts").as("ts_sec"), $"event_type")
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts_sec")
    val signups = ev.filter($"event_type" === "signup")
      .select($"user_id", $"ts_sec", $"ts_sec".as("signup_ts_sec"))
    val back = asof(purchases, signups, "user_id", "ts_sec", Seq("signup_ts_sec"))
      .withColumnRenamed("asof_signup_ts_sec", "back_ts")
    val both = asofForward(back, signups, "user_id", "ts_sec", Seq("signup_ts_sec"))
      .withColumnRenamed("asof_signup_ts_sec", "fwd_ts")
    val pickBack = $"back_ts".isNotNull &&
      ($"fwd_ts".isNull || ($"ts_sec" - $"back_ts") <= ($"fwd_ts" - $"ts_sec"))
    both
      .withColumn("signup_ts_sec", when(pickBack, $"back_ts").otherwise($"fwd_ts"))
      .withColumn("dt_sec", $"ts_sec" - $"signup_ts_sec")
      .withColumn("direction",
        when($"signup_ts_sec".isNull, lit(null).cast("string"))
          .when(pickBack, lit("backward")).otherwise(lit("forward")))
      .select($"event_id", $"user_id", $"ts_sec".as("purchase_ts_sec"),
        $"signup_ts_sec", $"dt_sec", $"direction")
      .orderBy($"event_id")
  }

  val asofJoinNearestSql: String =
    """WITH ev AS (
      |  SELECT event_id, user_id, event_type,
      |    CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS ts_sec
      |  FROM events
      |), purchases AS (
      |  SELECT event_id, user_id, ts_sec FROM ev WHERE event_type = 'purchase'
      |), signups AS (
      |  SELECT user_id, ts_sec AS signup_ts_sec FROM ev WHERE event_type = 'signup'
      |), picked AS (
      |  SELECT p.event_id, p.user_id, p.ts_sec,
      |    sb.signup_ts_sec AS back_ts, sf.signup_ts_sec AS fwd_ts,
      |    (sb.signup_ts_sec IS NOT NULL AND (sf.signup_ts_sec IS NULL
      |      OR p.ts_sec - sb.signup_ts_sec <= sf.signup_ts_sec - p.ts_sec)) AS pick_back
      |  FROM purchases p
      |  ASOF LEFT JOIN signups sb
      |    ON p.user_id = sb.user_id AND p.ts_sec >= sb.signup_ts_sec
      |  ASOF LEFT JOIN signups sf
      |    ON p.user_id = sf.user_id AND p.ts_sec <= sf.signup_ts_sec
      |)
      |SELECT event_id, user_id, ts_sec AS purchase_ts_sec,
      |  CASE WHEN pick_back THEN back_ts ELSE fwd_ts END AS signup_ts_sec,
      |  ts_sec - CASE WHEN pick_back THEN back_ts ELSE fwd_ts END AS dt_sec,
      |  CASE WHEN CASE WHEN pick_back THEN back_ts ELSE fwd_ts END IS NULL THEN NULL
      |       WHEN pick_back THEN 'backward' ELSE 'forward' END AS direction
      |FROM picked
      |ORDER BY event_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "asof_join_nearest" -> (asofJoinNearest _),
    "asof_join_events" -> (asofJoinEvents _),
    "asof_join_forward" -> (asofJoinForward _),
    "asof_join_forward_native" -> (asofJoinForwardNative _),
    "asof_join_tolerance" -> (asofJoinTolerance _),
    "asof_join_native" -> (asofJoinNative _))

  val oracleSql: Map[String, String] = Map(
    "asof_join_nearest" -> asofJoinNearestSql,
    "asof_join_events" -> asofJoinEventsSql,
    "asof_join_forward" -> asofJoinForwardSql,
    "asof_join_forward_native" -> asofJoinForwardSql,
    "asof_join_tolerance" -> asofJoinToleranceSql,
    "asof_join_native" -> asofJoinEventsSql)
}
