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

  /** §2 `dm_top_movers`: month-over-month RANK MOVERS — the "risers and
    * fallers" dashboard view next to the level-based top lists
    * (dm_top_artists ranks volume, dm_trending_artists decayed volume;
    * this ranks the CHANGE in competitive position): artists ranked by
    * listens within each of the two most recent observed months, joined
    * on artist, top-10 by absolute rank delta. `delta = rank_prev −
    * rank_cur` is positive for risers — exact integers end-to-end, no
    * float enters the entry at all.
    *
    * Shape: one fact scan → (month, artist) partial-agg counts; the
    * two-month dim is a TakeOrdered 2-row broadcast; the per-month rank
    * window partitions on the month tag (group size = #artists — the
    * dm_top_artists class; two-level sharded rank is the drop-in at a
    * scale where one month's artist census outgrows a task); movers cut
    * by TakeOrdered-10 with the rank window over survivors only.
    */
  def dmTopMovers(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val monthly = MartQueries.listeningFacts(spark, dir)
      .select(($"ts_year" * 100 + $"ts_month").as("mk"), $"l_suppkey".as("artist_id"))
      .groupBy($"mk", $"artist_id").agg(count(lit(1)).as("n_listens"))
    val mk2 = monthly.select($"mk").distinct()
      .orderBy($"mk".desc).limit(2)
      .withColumn("which", row_number().over(
        Window.partitionBy(pmod($"mk", lit(1))).orderBy($"mk".desc)))
    val ranked = monthly.join(broadcast(mk2), Seq("mk"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy($"which").orderBy($"n_listens".desc, $"artist_id")))
    val cur = ranked.filter($"which" === 1)
      .select($"artist_id", $"n_listens".as("n_cur"), $"rnk".as("rank_cur"))
    val prev = ranked.filter($"which" === 2)
      .select($"artist_id", $"n_listens".as("n_prev"), $"rnk".as("rank_prev"))
    val sup = Tables.supplier(spark, dir).select($"s_suppkey".as("artist_id"), $"s_name".as("artist"))
    cur.join(prev, Seq("artist_id"))
      .withColumn("delta", $"rank_prev" - $"rank_cur")
      .orderBy(abs($"delta").desc, $"artist_id")
      .limit(10)
      .join(broadcast(sup), Seq("artist_id"))
      .withColumn("mover_rank", row_number().over(
        Window.partitionBy(pmod($"rank_cur", lit(1)))
          .orderBy(abs($"delta").desc, $"artist_id")).cast("long"))
      .select($"artist_id", $"artist", $"n_prev", $"n_cur",
        $"rank_prev", $"rank_cur", $"delta", $"mover_rank")
      .orderBy($"mover_rank")
  }

  val dmTopMoversSql: String =
    """WITH fh AS (
      |  SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT) AS mk,
      |    l_suppkey AS artist_id
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |), monthly AS (
      |  SELECT mk, artist_id, COUNT(*) AS n_listens FROM fh GROUP BY 1, 2
      |), mk2 AS (
      |  SELECT mk, row_number() OVER (ORDER BY mk DESC) AS which
      |  FROM (SELECT DISTINCT mk FROM monthly) ORDER BY mk DESC LIMIT 2
      |), ranked AS (
      |  SELECT m.artist_id, m.n_listens, k.which,
      |    row_number() OVER (PARTITION BY k.which ORDER BY m.n_listens DESC, m.artist_id) AS rnk
      |  FROM monthly m JOIN mk2 k ON m.mk = k.mk
      |), cur AS (
      |  SELECT artist_id, n_listens AS n_cur, rnk AS rank_cur FROM ranked WHERE which = 1
      |), prev AS (
      |  SELECT artist_id, n_listens AS n_prev, rnk AS rank_prev FROM ranked WHERE which = 2
      |), j AS (
      |  SELECT cur.artist_id, n_prev, n_cur, rank_prev, rank_cur,
      |    rank_prev - rank_cur AS delta
      |  FROM cur JOIN prev ON cur.artist_id = prev.artist_id
      |), top AS (
      |  SELECT *, CAST(row_number() OVER (ORDER BY abs(delta) DESC, artist_id) AS BIGINT) AS mover_rank
      |  FROM j ORDER BY abs(delta) DESC, artist_id LIMIT 10
      |)
      |SELECT artist_id, s_name AS artist, CAST(n_prev AS BIGINT) AS n_prev,
      |  CAST(n_cur AS BIGINT) AS n_cur,
      |  CAST(rank_prev AS BIGINT) AS rank_prev, CAST(rank_cur AS BIGINT) AS rank_cur,
      |  CAST(delta AS BIGINT) AS delta, mover_rank
      |FROM top JOIN supplier ON artist_id = s_suppkey
      |ORDER BY mover_rank""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dm_trending_artists" -> (trendingArtists _),
    "dm_top_movers" -> (dmTopMovers _)
  )

  val oracleSql: Map[String, String] = Map(
    "dm_trending_artists" -> trendingArtistsSql,
    "dm_top_movers" -> dmTopMoversSql
  )
}
