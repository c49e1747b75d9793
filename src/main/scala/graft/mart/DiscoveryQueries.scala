package graft.mart

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Artist DISCOVERY rate — the dashboard's "how much new music am I
  * finding" view (the reference's yearly/monthly aggregates say how
  * MUCH was played; this says how much of it was NEW): per month,
  * the number of artists heard for the FIRST time that month vs the
  * month's total active artists.
  *
  * Shape: first-listen detection is one partial-agg min over the
  * (artist) grain — never a window over plays — then two bounded
  * month-grain rollups (new artists from the firsts table, active
  * artists as a distinct count) meet on the month key. The discovery
  * rate is ONE IEEE division of exact BIGINTs. Months output as
  * (year, month) ints — never DATE (§5 driver contract).
  */
object DiscoveryQueries {

  def artistDiscovery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sup = Tables.supplier(spark, dir).select($"s_suppkey", $"s_name")
    val plays = Tables.lineitem(spark, dir)
      .join(broadcast(sup), $"l_suppkey" === $"s_suppkey")
      .select($"s_name".as("artist"), $"l_shipdate".as("ts"))
    val firsts = plays.groupBy($"artist").agg(min($"ts").as("first_ts"))
      .groupBy(year($"first_ts").as("y"), month($"first_ts").as("m"))
      .agg(count(lit(1)).as("n_new_artists"))
    val active = plays
      .groupBy(year($"ts").as("y"), month($"ts").as("m"))
      .agg(countDistinct($"artist").as("n_active_artists"),
        count(lit(1)).as("n_plays"))
    active.join(firsts, Seq("y", "m"), "left")
      .select($"y".cast("long").as("year"), $"m".cast("long").as("month"),
        $"n_plays", $"n_active_artists",
        coalesce($"n_new_artists", lit(0L)).as("n_new_artists"))
      .withColumn("discovery_rate",
        $"n_new_artists".cast("double") / $"n_active_artists".cast("double"))
      .orderBy($"year", $"month")
  }

  val artistDiscoverySql: String =
    """WITH plays AS (
      |  SELECT s_name AS artist, l_shipdate AS ts
      |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |), firsts AS (
      |  SELECT CAST(year(first_ts) AS BIGINT) AS year, CAST(month(first_ts) AS BIGINT) AS month,
      |    CAST(COUNT(*) AS BIGINT) AS n_new_artists
      |  FROM (SELECT artist, MIN(ts) AS first_ts FROM plays GROUP BY artist)
      |  GROUP BY 1, 2
      |), active AS (
      |  SELECT CAST(year(ts) AS BIGINT) AS year, CAST(month(ts) AS BIGINT) AS month,
      |    CAST(COUNT(DISTINCT artist) AS BIGINT) AS n_active_artists,
      |    CAST(COUNT(*) AS BIGINT) AS n_plays
      |  FROM plays GROUP BY 1, 2
      |)
      |SELECT a.year, a.month, n_plays, n_active_artists,
      |  COALESCE(n_new_artists, 0) AS n_new_artists,
      |  CAST(COALESCE(n_new_artists, 0) AS DOUBLE) / CAST(n_active_artists AS DOUBLE)
      |    AS discovery_rate
      |FROM active a LEFT JOIN firsts f ON a.year = f.year AND a.month = f.month
      |ORDER BY a.year, a.month""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dm_artist_discovery" -> (artistDiscovery _)
  )

  val oracleSql: Map[String, String] = Map(
    "dm_artist_discovery" -> artistDiscoverySql
  )
}
