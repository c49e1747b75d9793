package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Multi-touch purchase attribution — the batch twin of
  * [[graft.streaming.EventsPipeline.purchaseAttribution]] widened from
  * the streaming join's single signup channel to the full marketing
  * shape: every `click`/`view` touch in a 7-day lookback window before a
  * purchase shares credit for it (reference anchor: the dashboard's
  * engagement views, dashboard/dashboard_queries.py:4-43, stop at play
  * counts; attribution is the revenue-side question those views feed).
  *
  * Three credit models in one pass, all engine-exact:
  *  - first-touch / last-touch: the window-rank argmin/argmax per
  *    purchase (ties at whole-second granularity broken by event id, so
  *    the pick is deterministic in both engines);
  *  - linear: `value_cents / n_touches` emitted PER PURCHASE as one
  *    IEEE-correctly-rounded divide of two exact integers (the
  *    [[graft.ops.Recommend]] cosine discipline) — never summed, because
  *    summing rounded doubles is float-order-dependent across engines.
  *    The channel rollup (`events_attribution_channel`) therefore
  *    aggregates the LAST-TOUCH model, whose credits are exact BIGINT
  *    cents.
  *
  * Time math is whole epoch-seconds (the sessionize device — Spark µs vs
  * DuckDB ns sub-second precision never enters). A touch qualifies iff
  * `t_ts_sec < p_ts_sec` (strictly before at second grain) and
  * `t_ts_sec >= p_ts_sec - 604800`.
  *
  * Scale shape: ONE shuffle on `user_id` for the purchase×touch range
  * join — per-user fan-out is bounded by touch rate × the 7-day lookback
  * (never all history), the same bound that keeps the streaming twin's
  * state finite under its watermark. The first/last rank windows
  * repartition on `purchase_id`, whose group size is that same bounded
  * fan-out, so no window partition can outgrow a task at any corpus
  * size. Zero-touch purchases survive via the left join (the "direct"
  * channel — dropping them would overstate marketing-attributed
  * revenue).
  */
object AttributionQueries {

  val lookbackSec: Long = 7L * 86400L

  /** Core over any event table with (event_id, user_id, event_type,
    * ts_sec, value) — spec-testable on synthetic frames.
    */
  private[graft] def attributionOn(ev: DataFrame): DataFrame = {
    val spark = ev.sparkSession
    import spark.implicits._
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"event_id".as("purchase_id"), $"user_id",
        $"ts_sec".as("p_ts_sec"),
        ($"value".cast("decimal(10,2)") * 100).cast("long").as("value_cents"))
    val touches = ev.filter($"event_type".isin("click", "view"))
      .select($"user_id".as("t_user_id"), $"event_id".as("touch_id"),
        $"event_type".as("touch_type"), $"ts_sec".as("t_ts_sec"))
    val joined = purchases.join(touches,
      $"user_id" === $"t_user_id" &&
        $"t_ts_sec" < $"p_ts_sec" &&
        $"t_ts_sec" >= $"p_ts_sec" - lookbackSec)
    val byPurchase = Window.partitionBy($"purchase_id")
    val flagged = joined
      .withColumn("rn_f", row_number().over(byPurchase.orderBy($"t_ts_sec", $"touch_id")))
      .withColumn("rn_l", row_number().over(byPurchase.orderBy($"t_ts_sec".desc, $"touch_id".desc)))
    val perPurchase = flagged.groupBy($"purchase_id").agg(
      count(lit(1)).as("n_touches"),
      max(when($"rn_f" === 1, $"touch_id")).as("first_touch_id"),
      max(when($"rn_f" === 1, $"touch_type")).as("first_touch_type"),
      max(when($"rn_l" === 1, $"touch_id")).as("last_touch_id"),
      max(when($"rn_l" === 1, $"touch_type")).as("last_touch_type"))
    purchases.join(perPurchase, Seq("purchase_id"), "left")
      .withColumn("n_touches", coalesce($"n_touches", lit(0L)))
      .withColumn("credit_per_touch",
        when($"n_touches" > 0,
          $"value_cents".cast("double") / $"n_touches".cast("double")))
      .select($"purchase_id", $"user_id", $"value_cents", $"n_touches",
        $"first_touch_id", $"first_touch_type",
        $"last_touch_id", $"last_touch_type", $"credit_per_touch")
  }

  /** §2 `events_attribution`: one row per purchase with its 7-day touch
    * census, first/last touch, and the linear-model per-touch credit.
    */
  def eventsAttribution(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select($"event_id", $"user_id", $"event_type",
        unix_timestamp($"ts").as("ts_sec"), $"value")
    attributionOn(ev).orderBy($"purchase_id")
  }

  /** §2 `events_attribution_channel`: last-touch revenue by channel
    * (`click` / `view` / `direct` for zero-touch purchases) — exact
    * BIGINT cents, the summable credit model.
    */
  def eventsAttributionChannel(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select($"event_id", $"user_id", $"event_type",
        unix_timestamp($"ts").as("ts_sec"), $"value")
    attributionOn(ev)
      .withColumn("channel", coalesce($"last_touch_type", lit("direct")))
      .groupBy($"channel")
      .agg(count(lit(1)).as("n_purchases"),
        sum($"value_cents").as("attributed_cents"))
      .orderBy($"channel")
  }

  private val baseSql: String =
    s"""WITH ev AS (
      |  SELECT event_id, user_id, event_type,
      |    CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS ts_sec, value
      |  FROM events
      |), purchases AS (
      |  SELECT event_id AS purchase_id, user_id, ts_sec AS p_ts_sec,
      |    CAST(CAST(value AS DECIMAL(10,2)) * 100 AS BIGINT) AS value_cents
      |  FROM ev WHERE event_type = 'purchase'
      |), touches AS (
      |  SELECT user_id AS t_user_id, event_id AS touch_id,
      |    event_type AS touch_type, ts_sec AS t_ts_sec
      |  FROM ev WHERE event_type IN ('click', 'view')
      |), joined AS (
      |  SELECT p.*, t.touch_id, t.touch_type, t.t_ts_sec
      |  FROM purchases p JOIN touches t
      |    ON p.user_id = t.t_user_id
      |   AND t.t_ts_sec < p.p_ts_sec
      |   AND t.t_ts_sec >= p.p_ts_sec - ${lookbackSec}
      |), flagged AS (
      |  SELECT *,
      |    row_number() OVER (PARTITION BY purchase_id ORDER BY t_ts_sec, touch_id) AS rn_f,
      |    row_number() OVER (PARTITION BY purchase_id ORDER BY t_ts_sec DESC, touch_id DESC) AS rn_l
      |  FROM joined
      |), per_purchase AS (
      |  SELECT purchase_id,
      |    COUNT(*) AS n_touches,
      |    MAX(CASE WHEN rn_f = 1 THEN touch_id END) AS first_touch_id,
      |    MAX(CASE WHEN rn_f = 1 THEN touch_type END) AS first_touch_type,
      |    MAX(CASE WHEN rn_l = 1 THEN touch_id END) AS last_touch_id,
      |    MAX(CASE WHEN rn_l = 1 THEN touch_type END) AS last_touch_type
      |  FROM flagged GROUP BY purchase_id
      |), attributed AS (
      |  SELECT p.purchase_id, p.user_id, p.value_cents,
      |    COALESCE(pp.n_touches, 0) AS n_touches,
      |    pp.first_touch_id, pp.first_touch_type,
      |    pp.last_touch_id, pp.last_touch_type,
      |    CASE WHEN COALESCE(pp.n_touches, 0) > 0
      |      THEN CAST(p.value_cents AS DOUBLE) / CAST(pp.n_touches AS DOUBLE)
      |    END AS credit_per_touch
      |  FROM purchases p LEFT JOIN per_purchase pp ON p.purchase_id = pp.purchase_id
      |)""".stripMargin

  val eventsAttributionSql: String =
    s"""$baseSql
      |SELECT purchase_id, user_id, value_cents, n_touches,
      |  first_touch_id, first_touch_type, last_touch_id, last_touch_type,
      |  credit_per_touch
      |FROM attributed
      |ORDER BY purchase_id""".stripMargin

  val eventsAttributionChannelSql: String =
    s"""$baseSql
      |SELECT COALESCE(last_touch_type, 'direct') AS channel,
      |  COUNT(*) AS n_purchases,
      |  CAST(SUM(value_cents) AS BIGINT) AS attributed_cents
      |FROM attributed
      |GROUP BY 1
      |ORDER BY 1""".stripMargin

  /** §2 `events_attribution_position`: POSITION-BASED (U-shaped)
    * multi-touch attribution — 40 % of a purchase's value to the first
    * touch, 40 % to the last, 20 % shared equally by the middles (the
    * standard U-model; n = 1 gets all, n = 2 splits evenly) — rolled up
    * to channel grain in EXACT integer cents via largest-remainder
    * (Hamilton) apportionment: per purchase, touch i's weight is the
    * integer w_i over common denominator D (n ≥ 3: first/last
    * 2·(n−2), middles 1, D = 5·(n−2) — exactly 2/5, 2/5, 1/5), the
    * base allocation is ⌊value_cents·w_i / D⌋, and the leftover
    * R = value_cents − Σ⌊·⌋ cents go one each to the R touches with the
    * largest fractional remainder (ties by position — deterministic in
    * both engines). Credits are whole cents that sum EXACTLY to the
    * purchase value — the conservation law Σ channels == Σ purchases
    * that a rounded-double model silently violates — so the rollup is
    * a plain BIGINT sum. Zero-touch purchases credit `direct`.
    *
    * Scale shape: identical to the last-touch twin — the one user_id
    * shuffle for the range join, purchase_id-partitioned windows over
    * the bounded 7-day fan-out, then a 3-group rollup. All integer
    * arithmetic (products ≤ value_cents · 2n — far inside BIGINT).
    */
  def eventsAttributionPosition(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select($"event_id", $"user_id", $"event_type",
        unix_timestamp($"ts").as("ts_sec"), $"value")
    attributionPositionOn(ev)
  }

  /** Core over any (event_id, user_id, event_type, ts_sec, value)
    * frame — spec-testable on synthetic chains.
    */
  private[graft] def attributionPositionOn(ev: DataFrame): DataFrame = {
    val spark = ev.sparkSession
    import spark.implicits._
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"event_id".as("purchase_id"), $"user_id",
        $"ts_sec".as("p_ts_sec"),
        ($"value".cast("decimal(10,2)") * 100).cast("long").as("value_cents"))
    val touches = ev.filter($"event_type".isin("click", "view"))
      .select($"user_id".as("t_user_id"), $"event_id".as("touch_id"),
        $"event_type".as("touch_type"), $"ts_sec".as("t_ts_sec"))
    positionChannelRollupOn(purchases, touches)
      .filter($"n_credits" > 0)
      .orderBy($"channel")
  }

  /** The position model's channel rollup over an explicit (purchases,
    * touches) pair — UNordered and UNfiltered so the streaming fold can
    * merge its per-batch deltas additively; the batch entry applies the
    * n_credits > 0 filter and the ordering on top. The touch side may
    * contain touches from state carried across batches — the model is a
    * deterministic function of each purchase's qualifying touch SET, so
    * the crash-window retry (batch touches already resident, deduped
    * upstream) derives bit-identical credits.
    */
  private[graft] def positionChannelRollupOn(purchases0: DataFrame, touches: DataFrame): DataFrame = {
    val spark = purchases0.sparkSession
    import spark.implicits._
    // NONNEGATIVE-PURCHASE CONTRACT, enforced at the core so batch and
    // stream agree: for a negative value_cents (refund/chargeback) the
    // engines' integer division disagrees — Spark `div` truncates toward
    // zero, DuckDB `//` floors — so base/rem/leftover diverge and the
    // rr <= leftover top-up stops conserving the purchase. Refunds are
    // out of the position model's contract; the oracle SQL filters
    // identically, so the gate can never see the divergent branch.
    val purchases = purchases0.filter($"value_cents" >= 0)
    val joined = purchases.join(touches,
      $"user_id" === $"t_user_id" &&
        $"t_ts_sec" < $"p_ts_sec" &&
        $"t_ts_sec" >= $"p_ts_sec" - lookbackSec)
    val byPurchase = Window.partitionBy($"purchase_id")
    val pos = joined
      .withColumn("pos", row_number().over(byPurchase.orderBy($"t_ts_sec", $"touch_id")))
      .withColumn("n", count(lit(1)).over(byPurchase))
      .withColumn("w",
        when($"n" <= 2, lit(1L))
          .otherwise(when($"pos" === 1 || $"pos" === $"n", ($"n" - 2) * 2L).otherwise(lit(1L))))
      .withColumn("d", when($"n" === 1, 1L).when($"n" === 2, 2L).otherwise(($"n" - 2) * 5L))
      .withColumn("base", expr("(value_cents * w) div d"))
      .withColumn("rem", ($"value_cents" * $"w") % $"d")
    val credited = pos
      .withColumn("leftover", $"value_cents" - sum($"base").over(byPurchase))
      .withColumn("rr", row_number().over(byPurchase.orderBy($"rem".desc, $"pos")))
      .withColumn("credit_cents", $"base" + when($"rr" <= $"leftover", 1L).otherwise(0L))
    val channelCredits = credited
      .groupBy($"touch_type".as("channel"))
      .agg(count(lit(1)).as("n_credits"), sum($"credit_cents").as("attributed_cents"))
    val direct = purchases
      .join(credited.select($"purchase_id").distinct(), Seq("purchase_id"), "left_anti")
      .agg(count(lit(1)).as("n_credits"), sum($"value_cents").as("attributed_cents"))
      .select(lit("direct").as("channel"), $"n_credits",
        coalesce($"attributed_cents", lit(0L)).as("attributed_cents"))
    channelCredits.unionByName(direct)
  }

  val eventsAttributionPositionSql: String =
    s"""WITH ev AS (
      |  SELECT event_id, user_id, event_type,
      |    CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS ts_sec, value
      |  FROM events
      |), purchases AS (
      |  SELECT event_id AS purchase_id, user_id, ts_sec AS p_ts_sec,
      |    CAST(CAST(value AS DECIMAL(10,2)) * 100 AS BIGINT) AS value_cents
      |  FROM ev WHERE event_type = 'purchase'
      |    AND CAST(CAST(value AS DECIMAL(10,2)) * 100 AS BIGINT) >= 0
      |), touches AS (
      |  SELECT user_id AS t_user_id, event_id AS touch_id,
      |    event_type AS touch_type, ts_sec AS t_ts_sec
      |  FROM ev WHERE event_type IN ('click', 'view')
      |), joined AS (
      |  SELECT p.purchase_id, p.value_cents, t.touch_id, t.touch_type, t.t_ts_sec
      |  FROM purchases p JOIN touches t
      |    ON p.user_id = t.t_user_id
      |   AND t.t_ts_sec < p.p_ts_sec
      |   AND t.t_ts_sec >= p.p_ts_sec - ${lookbackSec}
      |), pos AS (
      |  SELECT *,
      |    row_number() OVER (PARTITION BY purchase_id ORDER BY t_ts_sec, touch_id) AS pos,
      |    COUNT(*) OVER (PARTITION BY purchase_id) AS n
      |  FROM joined
      |), weighted AS (
      |  SELECT *,
      |    CASE WHEN n <= 2 THEN 1
      |         WHEN pos = 1 OR pos = n THEN 2 * (n - 2) ELSE 1 END AS w,
      |    CASE WHEN n = 1 THEN 1 WHEN n = 2 THEN 2 ELSE 5 * (n - 2) END AS d
      |  FROM pos
      |), alloc AS (
      |  SELECT *,
      |    (value_cents * w) // d AS base,
      |    (value_cents * w) % d AS rem
      |  FROM weighted
      |), credited AS (
      |  SELECT *,
      |    value_cents - SUM(base) OVER (PARTITION BY purchase_id) AS leftover,
      |    row_number() OVER (PARTITION BY purchase_id ORDER BY rem DESC, pos) AS rr
      |  FROM alloc
      |), final_credits AS (
      |  SELECT touch_type AS channel,
      |    base + CASE WHEN rr <= leftover THEN 1 ELSE 0 END AS credit_cents
      |  FROM credited
      |), rollup_t AS (
      |  SELECT channel, COUNT(*) AS n_credits,
      |    CAST(SUM(credit_cents) AS BIGINT) AS attributed_cents
      |  FROM final_credits GROUP BY channel
      |  UNION ALL
      |  SELECT 'direct' AS channel, COUNT(*) AS n_credits,
      |    CAST(COALESCE(SUM(value_cents), 0) AS BIGINT) AS attributed_cents
      |  FROM purchases p
      |  WHERE NOT EXISTS (SELECT 1 FROM joined j WHERE j.purchase_id = p.purchase_id)
      |)
      |SELECT channel, CAST(n_credits AS BIGINT) AS n_credits, attributed_cents
      |FROM rollup_t WHERE n_credits > 0
      |ORDER BY channel""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_attribution"         -> (eventsAttribution _),
    "events_attribution_channel" -> (eventsAttributionChannel _),
    "events_attribution_position" -> (eventsAttributionPosition _)
  )

  val oracleSql: Map[String, String] = Map(
    "events_attribution"         -> eventsAttributionSql,
    "events_attribution_channel" -> eventsAttributionChannelSql,
    "events_attribution_position" -> eventsAttributionPositionSql
  )
}
