package graft.mart

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Recency-decayed "trending" ranking — the dashboard's "on a rise"
  * view next to the all-time top lists (dm_top_artists ranks lifetime
  * volume; this ranks exponentially-decayed volume, so a recent burst
  * outranks a faded back catalogue).
  *
  * Exactness: the half-life decay uses POWER-OF-TWO weights on WHOLE
  * WEEKS — weight = 2^(30−min(age_weeks,30)) is an exact BIGINT per
  * row, the per-artist score is an exact BIGINT sum (order- and
  * partition-proof where a float decay sum would accumulate
  * rounding differently per plan), and the reported double score is
  * ONE final division by 2^30. exp(−λ·age) with arbitrary λ is the
  * same operator with a float weight — the power-of-two form is what
  * makes it hash-checkable, and a real dashboard loses nothing from
  * week-granular half-lives.
  *
  * Shape: one fact scan with a map-side weight expression, one
  * groupBy(artist) after a broadcast dim join, TakeOrdered top-10.
  */
object TrendingQueries {

  def trendingArtists(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sup = Tables.supplier(spark, dir).select($"s_suppkey", $"s_name")
    val refDate = lit("2001-12-31").cast("timestamp")
    // age in whole weeks, clamped to 30 so the weight stays a BIGINT
    val ageWeeks = least(floor(datediff(refDate, $"l_shipdate") / 7.0).cast("long"), lit(30L))
    val weight = pow(lit(2.0), (lit(30L) - ageWeeks).cast("double")).cast("long")
    Tables.lineitem(spark, dir)
      .join(broadcast(sup), $"l_suppkey" === $"s_suppkey")
      .withColumn("w", weight)
      .groupBy($"s_name".as("artist"))
      .agg(count(lit(1)).as("plays"),
        sum($"w").as("score_scaled"))
      .withColumn("trend_score", $"score_scaled".cast("double") / 1073741824.0)
      .orderBy($"score_scaled".desc, $"artist")
      .limit(10)
  }

  val trendingArtistsSql: String =
    """WITH w AS (
      |  SELECT s_name,
      |    CAST(pow(2.0, 30 - LEAST(CAST(floor(date_diff('day', CAST(l_shipdate AS DATE), DATE '2001-12-31') / 7.0) AS BIGINT), 30)) AS BIGINT) AS w
      |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |)
      |SELECT s_name AS artist, CAST(COUNT(*) AS BIGINT) AS plays,
      |  CAST(SUM(w) AS BIGINT) AS score_scaled,
      |  CAST(CAST(SUM(w) AS BIGINT) AS DOUBLE) / 1073741824.0 AS trend_score
      |FROM w
      |GROUP BY s_name
      |ORDER BY score_scaled DESC, artist
      |LIMIT 10""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dm_trending_artists" -> (trendingArtists _)
  )

  val oracleSql: Map[String, String] = Map(
    "dm_trending_artists" -> trendingArtistsSql
  )
}
