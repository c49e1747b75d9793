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

  /** §2 `dm_abc_analysis`: ABC / Pareto classification of the track
    * catalogue by cumulative revenue share — class A = the head tracks
    * covering the first 80% of revenue, B = the next 15%, C = the long
    * tail (the catalogue-management census behind "what fraction of the
    * library carries the business"; the Gini entry reports ONE
    * concentration number — this materializes the actionable partition).
    *
    * Exactness: classification by INTEGER CROSS-MULTIPLICATION —
    * `cum·100 ≤ total·80` over exact cents BIGINTs, so the class
    * boundary can never ride a float rounding (`cum/total ≤ 0.8` would);
    * the reported shares are ONE IEEE divide per class row. The
    * cumulative window runs over the per-track AGGREGATE (catalogue-
    * sized, the dm_top_artists class — never raw facts; a catalogue too
    * big for one task shards the rank two-level like user_rfm).
    */
  def dmAbcAnalysis(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val rev = Tables.lineitem(spark, dir)
      .select($"l_partkey".as("track_id"),
        ($"l_extendedprice".cast("decimal(12,2)") * 100).cast("long").as("cents"))
      .groupBy($"track_id").agg(sum($"cents").as("revenue_cents"))
    val tot = rev.agg(sum($"revenue_cents").as("total_cents"))
    val w = Window.partitionBy(pmod($"track_id", lit(1)))
      .orderBy($"revenue_cents".desc, $"track_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rev.crossJoin(broadcast(tot))
      .withColumn("cum_cents", sum($"revenue_cents").over(w))
      .withColumn("abc_class",
        when($"cum_cents" * 100 <= $"total_cents" * 80, "A")
          .when($"cum_cents" * 100 <= $"total_cents" * 95, "B")
          .otherwise("C"))
      .groupBy($"abc_class")
      .agg(count(lit(1)).as("n_tracks"),
        sum($"revenue_cents").as("revenue_cents"),
        max($"total_cents").as("total_cents"))
      .withColumn("revenue_share",
        $"revenue_cents".cast("double") / $"total_cents".cast("double"))
      .select($"abc_class", $"n_tracks", $"revenue_cents", $"revenue_share")
      .orderBy($"abc_class")
  }

  val dmAbcAnalysisSql: String =
    """WITH rev AS (
      |  SELECT l_partkey AS track_id,
      |    CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT) AS revenue_cents
      |  FROM lineitem GROUP BY 1
      |), tot AS (SELECT CAST(SUM(revenue_cents) AS BIGINT) AS total_cents FROM rev),
      |cum AS (
      |  SELECT track_id, revenue_cents, total_cents,
      |    CAST(SUM(revenue_cents) OVER (ORDER BY revenue_cents DESC, track_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_cents
      |  FROM rev CROSS JOIN tot
      |), classed AS (
      |  SELECT *,
      |    CASE WHEN cum_cents * 100 <= total_cents * 80 THEN 'A'
      |         WHEN cum_cents * 100 <= total_cents * 95 THEN 'B'
      |         ELSE 'C' END AS abc_class
      |  FROM cum
      |)
      |SELECT abc_class, COUNT(*) AS n_tracks,
      |  CAST(SUM(revenue_cents) AS BIGINT) AS revenue_cents,
      |  CAST(SUM(revenue_cents) AS DOUBLE) / CAST(MAX(total_cents) AS DOUBLE) AS revenue_share
      |FROM classed
      |GROUP BY abc_class
      |ORDER BY abc_class""".stripMargin

  /** §2 `dm_hhi_concentration`: monthly Herfindahl–Hirschman index of
    * artist listening concentration — Σ share² per month, plus the
    * effective number of artists 1/HHI (the diversity family's THIRD
    * lens: Gini ranks inequality, ABC materializes the partition, HHI
    * is the antitrust-standard single number whose inverse reads as
    * "listening behaved as if spread over N equal artists").
    * HHI = Σc²/(Σc)² — numerator and denominator are exact BIGINTs from
    * one (month, artist) partial-agg count table (map-side combine,
    * bounded by months×artists), each reported double is ONE IEEE
    * divide. effective_n = (Σc)²/Σc² — the reciprocal computed as its
    * OWN single divide of the same exact integers, not 1/hhi (dividing
    * the rounded double would compound two roundings and drift the
    * gate).
    */
  def dmHhiConcentration(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val counts = MartQueries.listeningFacts(spark, dir)
      .select(($"ts_year" * 100 + $"ts_month").as("mk"), $"l_suppkey".as("artist_id"))
      .groupBy($"mk", $"artist_id").agg(count(lit(1)).as("c"))
    counts.groupBy($"mk")
      .agg(count(lit(1)).as("n_artists"),
        sum($"c").as("total_listens"),
        sum($"c" * $"c").as("sum_sq"))
      .withColumn("hhi",
        $"sum_sq".cast("double") / ($"total_listens" * $"total_listens").cast("double"))
      .withColumn("effective_n",
        ($"total_listens" * $"total_listens").cast("double") / $"sum_sq".cast("double"))
      .select($"mk".as("month_key"), $"n_artists", $"total_listens", $"hhi", $"effective_n")
      .orderBy($"month_key")
  }

  val dmHhiConcentrationSql: String =
    """WITH fh AS (
      |  SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT) AS mk,
      |    l_suppkey AS artist_id
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |), counts AS (
      |  SELECT mk, artist_id, CAST(COUNT(*) AS BIGINT) AS c FROM fh GROUP BY 1, 2
      |)
      |SELECT mk AS month_key, COUNT(*) AS n_artists,
      |  CAST(SUM(c) AS BIGINT) AS total_listens,
      |  CAST(SUM(c * c) AS DOUBLE)
      |    / CAST(SUM(c) * SUM(c) AS DOUBLE) AS hhi,
      |  CAST(SUM(c) * SUM(c) AS DOUBLE)
      |    / CAST(SUM(c * c) AS DOUBLE) AS effective_n
      |FROM counts
      |GROUP BY mk
      |ORDER BY month_key""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dm_artist_discovery" -> (artistDiscovery _),
    "dm_abc_analysis" -> (dmAbcAnalysis _),
    "dm_hhi_concentration" -> (dmHhiConcentration _)
  )

  val oracleSql: Map[String, String] = Map(
    "dm_artist_discovery" -> artistDiscoverySql,
    "dm_abc_analysis" -> dmAbcAnalysisSql,
    "dm_hhi_concentration" -> dmHhiConcentrationSql
  )
}
