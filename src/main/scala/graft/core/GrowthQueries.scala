package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** §2 entry `dm_growth_accounting` — the monthly GROWTH-ACCOUNTING
  * decomposition (new / retained / resurrected / churned + the quick
  * ratio): the standard frame a growth team reads before any single
  * metric, because a flat MAU can hide a leaky bucket (high new + high
  * churned) that `events_user_growth`'s cumulative curve never shows.
  * Runs over the ORDERS stream (a customer is "active" in a month they
  * ordered — the 79-month calendar; the events table spans one month,
  * too short for lifecycle structure).
  * Definitions are the canonical ones: a user is NEW in their first
  * active month, RETAINED in month m if also active in m−1,
  * RESURRECTED if active before but not in m−1; a user active in m but
  * not in m+1 CHURNS in m+1 (only emitted through the corpus's last
  * month — beyond it churn is unknowable, the right-censoring edge).
  * Quick ratio = (new + resurrected) / churned.
  *
  * Scale shape: ONE corpus partial-agg distinct collapses events to the
  * (user, month) activity frame; both windows (lag for classification,
  * lead for churn) partition BY USER over their ≤ #months activity rows
  * — the sessionize discipline, never a global window; the last-month
  * censor rides a 1-row broadcast scalar; the final rollup groups the
  * ≤ months-sized status union. Month arithmetic is the integer index
  * y·12 + (m−1) — no engine date-convention in play after extraction.
  *
  * Exactness (hash-gate): activity, lag/lead gaps and all four counts
  * are pure integers; the quick ratio is ONE correctly-rounded divide,
  * NULL when nothing churned (both engines). The identity
  * new + retained + resurrected = MAU(m) holds by construction
  * (every active (user, month) row classifies exactly once) and is
  * spec-pinned beside hand-built lifecycles. Reference anchor: the
  * month-grain engagement charts (dashboard_queries.py:4-25
  * top-N by year/month) — this is the decomposition UNDER those
  * charts' audience totals.
  */
object GrowthQueries {

  /** The decomposition over a (user_id, ym) activity frame — split out
    * for the planted-lifecycle specs.
    */
  private[graft] def growthAccountingOn(um: DataFrame): DataFrame = {
    import um.sparkSession.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ym")
    val classified = um
      .withColumn("prev_ym", lag($"ym", 1).over(w))
      .withColumn("next_ym", lead($"ym", 1).over(w))
    val maxYm = um.agg(max($"ym").as("max_ym"))
    val status = classified.select($"ym",
      when($"prev_ym".isNull, "new")
        .when($"prev_ym" === $"ym" - 1L, "retained")
        .otherwise("resurrected").as("status"))
    val churn = classified
      .crossJoin(broadcast(maxYm))
      .filter(($"next_ym".isNull || $"next_ym" > $"ym" + 1L) && $"ym" < $"max_ym")
      .select(($"ym" + 1L).as("ym"), lit("churned").as("status"))
    status.union(churn)
      .groupBy($"ym").agg(
        sum(when($"status" === "new", 1L).otherwise(0L)).as("n_new"),
        sum(when($"status" === "retained", 1L).otherwise(0L)).as("n_retained"),
        sum(when($"status" === "resurrected", 1L).otherwise(0L)).as("n_resurrected"),
        sum(when($"status" === "churned", 1L).otherwise(0L)).as("n_churned"))
      .withColumn("mau", $"n_new" + $"n_retained" + $"n_resurrected")
      .withColumn("quick_ratio",
        when($"n_churned" > 0L,
          ($"n_new" + $"n_resurrected").cast("double") / $"n_churned".cast("double")))
      .select(expr("ym div 12").as("year"), (pmod($"ym", lit(12L)) + 1L).as("month"),
        $"mau", $"n_new", $"n_retained", $"n_resurrected", $"n_churned",
        $"quick_ratio")
      .orderBy($"year", $"month")
  }

  def dmGrowthAccounting(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    growthAccountingOn(Tables.orders(spark, dir)
      .select($"o_custkey".as("user_id"),
        (year($"o_orderdate") * 12 + month($"o_orderdate") - 1).cast("long").as("ym"))
      .distinct())
  }

  val dmGrowthAccountingSql: String =
    """WITH um AS (
      |  SELECT DISTINCT o_custkey AS user_id,
      |    CAST(year(CAST(o_orderdate AS TIMESTAMP)) * 12
      |      + month(CAST(o_orderdate AS TIMESTAMP)) - 1 AS BIGINT) AS ym
      |  FROM orders
      |), classified AS (
      |  SELECT user_id, ym,
      |    lag(ym) OVER (PARTITION BY user_id ORDER BY ym) AS prev_ym,
      |    lead(ym) OVER (PARTITION BY user_id ORDER BY ym) AS next_ym
      |  FROM um
      |), mx AS (SELECT MAX(ym) AS max_ym FROM um),
      |status AS (
      |  SELECT ym,
      |    CASE WHEN prev_ym IS NULL THEN 'new'
      |         WHEN prev_ym = ym - 1 THEN 'retained'
      |         ELSE 'resurrected' END AS status
      |  FROM classified
      |  UNION ALL
      |  SELECT ym + 1 AS ym, 'churned' AS status
      |  FROM classified CROSS JOIN mx
      |  WHERE (next_ym IS NULL OR next_ym > ym + 1) AND ym < max_ym
      |), rolled AS (
      |  SELECT ym,
      |    CAST(SUM(CASE WHEN status = 'new' THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
      |    CAST(SUM(CASE WHEN status = 'retained' THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
      |    CAST(SUM(CASE WHEN status = 'resurrected' THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected,
      |    CAST(SUM(CASE WHEN status = 'churned' THEN 1 ELSE 0 END) AS BIGINT) AS n_churned
      |  FROM status GROUP BY 1
      |)
      |SELECT ym // 12 AS year, ym % 12 + 1 AS month,
      |  n_new + n_retained + n_resurrected AS mau,
      |  n_new, n_retained, n_resurrected, n_churned,
      |  CASE WHEN n_churned > 0
      |    THEN CAST(n_new + n_resurrected AS DOUBLE) / CAST(n_churned AS DOUBLE)
      |  END AS quick_ratio
      |FROM rolled
      |ORDER BY year, month""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dm_growth_accounting" -> (dmGrowthAccounting _)
  )

  val oracleSql: Map[String, String] = Map(
    "dm_growth_accounting" -> dmGrowthAccountingSql
  )
}
