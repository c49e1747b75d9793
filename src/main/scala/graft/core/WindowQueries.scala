package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Window-function coverage + the remaining dashboard shapes. */
object WindowQueries {

  /** Full window-function suite over the fact stream: running totals,
    * lag deltas, rank families, and distribution functions — the
    * "Wrapped-style" per-user timeline analytics, one shuffle on user_id.
    */
  def windowSuite(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .filter($"event_type" === "purchase")
      .select($"user_id", $"event_id", unix_timestamp($"ts").as("ts_sec"),
        $"value".cast("decimal(10,2)").as("v"))
    val w = Window.partitionBy($"user_id").orderBy($"ts_sec", $"event_id")
    val wAll = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.select(
        $"user_id", $"event_id", $"ts_sec",
        $"v".cast("double").as("value"),
        sum($"v").over(wAll).cast("double").as("running_total"),
        ($"ts_sec" - lag($"ts_sec", 1).over(w)).as("sec_since_prev"),
        row_number().over(w).as("purchase_seq"),
        rank().over(Window.partitionBy($"user_id").orderBy($"v".desc, $"event_id")).as("value_rank"),
        ntile(4).over(w).as("quartile"),
        // explicit floor: DuckDB's double→BIGINT cast rounds, Spark's truncates
        floor(cume_dist().over(Window.partitionBy($"user_id").orderBy($"ts_sec", $"event_id")) * 1000000.0)
          .cast("long").as("cume_dist_ppm"))
      .orderBy($"user_id", $"purchase_seq")
  }

  val windowSuiteSql: String =
    """WITH ev AS (
      |  SELECT user_id, event_id,
      |    CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS ts_sec,
      |    CAST(value AS DECIMAL(10,2)) AS v
      |  FROM events WHERE event_type = 'purchase'
      |)
      |SELECT user_id, event_id, ts_sec,
      |  CAST(v AS DOUBLE) AS value,
      |  CAST(SUM(v) OVER (PARTITION BY user_id ORDER BY ts_sec, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
      |  ts_sec - lag(ts_sec) OVER (PARTITION BY user_id ORDER BY ts_sec, event_id) AS sec_since_prev,
      |  row_number() OVER (PARTITION BY user_id ORDER BY ts_sec, event_id) AS purchase_seq,
      |  rank() OVER (PARTITION BY user_id ORDER BY v DESC, event_id) AS value_rank,
      |  ntile(4) OVER (PARTITION BY user_id ORDER BY ts_sec, event_id) AS quartile,
      |  CAST(floor(cume_dist() OVER (PARTITION BY user_id ORDER BY ts_sec, event_id) * 1000000.0) AS BIGINT) AS cume_dist_ppm
      |FROM ev
      |ORDER BY user_id, purchase_seq""".stripMargin

  /** Pure filter-scan-sum (TPC-H Q6 shape): everything pushes to the scan. */
  def q6Forecast(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .filter(
        $"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
          $"l_shipdate" < lit("1997-01-01").cast("timestamp") &&
          $"l_discount" >= 0.05 && $"l_discount" <= 0.07 && $"l_quantity" < 24)
      .agg(sum($"l_extendedprice".cast("decimal(12,2)") * $"l_discount".cast("decimal(4,2)"))
        .cast("double").as("revenue"),
        count(lit(1)).as("n_rows"))
  }

  val q6Sql: String =
    """SELECT
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_rows
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""".stripMargin

  /** Edit-distance near-dup pairs: same (lang, n_chars) block — true dups
    * share a length, so the block is tiny and the O(len²) Levenshtein runs
    * on a bounded candidate set.
    */
  def dedupEditDistance(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val t = Tables.documents(spark, dir).select($"doc_id", $"lang", $"n_chars", $"text")
    val a = t.select($"lang", $"n_chars", $"doc_id".as("a"), $"text".as("ta"))
    val b = t.select($"lang", $"n_chars", $"doc_id".as("b"), $"text".as("tb"))
    a.join(b, Seq("lang", "n_chars"))
      .filter($"a" < $"b")
      .withColumn("edit_dist", levenshtein($"ta", $"tb"))
      .filter($"edit_dist" <= 50)
      .select($"lang", $"a", $"b", $"n_chars", $"edit_dist")
      .orderBy($"lang", $"a", $"b")
  }

  val dedupEditDistanceSql: String =
    """SELECT a.lang, a.doc_id AS a, b.doc_id AS b, a.n_chars,
      |  levenshtein(a.text, b.text) AS edit_dist
      |FROM documents a
      |JOIN documents b ON a.lang = b.lang AND a.n_chars = b.n_chars
      |  AND a.doc_id < b.doc_id
      |WHERE levenshtein(a.text, b.text) <= 50
      |ORDER BY 1, 2, 3""".stripMargin

  /** Dashboard part-of-day × weekend rollup joining BOTH generated dims
    * (date + time), the reference's dim_time.part_of_day analytics.
    */
  def partOfDayAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select($"event_id", $"ts", $"value".cast("decimal(10,2)").as("v"))
    val dd = graft.etl.EtlQueries.dimDate(spark, dir).select($"date", $"is_weekend")
    val dt = graft.etl.EtlQueries.dimTime(spark, dir).select($"time_id", $"part_of_day")
    ev.join(broadcast(dd), date_trunc("day", $"ts") === $"date")
      .join(broadcast(dt), (hour($"ts") * 60 + minute($"ts")) === $"time_id")
      .groupBy($"part_of_day", $"is_weekend")
      .agg(count(lit(1)).as("n_events"), sum($"v").cast("double").as("total_value"))
      .orderBy($"part_of_day", $"is_weekend")
  }

  val partOfDayAggSql: String =
    """WITH dd AS (
      |  SELECT CAST(d AS TIMESTAMP) AS date, isodow(d) IN (6,7) AS is_weekend
      |  FROM generate_series(DATE '2018-01-01', DATE '2030-12-31', INTERVAL 1 DAY) t(d)
      |), dt AS (
      |  SELECT t AS time_id,
      |    CASE WHEN t // 60 >= 6 AND t // 60 < 12 THEN 'morning'
      |         WHEN t // 60 >= 12 AND t // 60 < 18 THEN 'afternoon'
      |         WHEN t // 60 >= 18 AND t // 60 < 23 THEN 'evening'
      |         ELSE 'night' END AS part_of_day
      |  FROM generate_series(0, 1439) s(t)
      |), ev AS (
      |  SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, CAST(value AS DECIMAL(10,2)) AS v
      |  FROM events
      |)
      |SELECT part_of_day, is_weekend,
      |  COUNT(*) AS n_events, CAST(SUM(v) AS DOUBLE) AS total_value
      |FROM ev
      |JOIN dd ON date_trunc('day', ts) = dd.date
      |JOIN dt ON hour(ts) * 60 + minute(ts) = dt.time_id
      |GROUP BY part_of_day, is_weekend
      |ORDER BY part_of_day, is_weekend""".stripMargin

  /** Time-RANGE frames — the rolling-feature shape [[windowSuite]]'s ROWS
    * frames and rank family don't cover: per-user trailing-1-hour event
    * count and value sum at every event (rate-limit counters, rolling ML
    * features). RANGE BETWEEN 3599 PRECEDING over the epoch-second key —
    * value-based frames include peers identically in both engines, and the
    * DECIMAL value sum keeps the window total order-independent. Window
    * partitioned by user_id (state per task bounded by one user's horizon;
    * the repo-wide no-unpartitioned-window guard applies).
    */
  def windowTimeRange(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"sec").rangeBetween(-3599, 0)
    Tables.events(spark, dir)
      .select($"user_id", $"event_id", $"ts".cast("long").as("sec"),
        $"value".cast("decimal(12,2)").as("v"))
      .withColumn("n_1h", count(lit(1)).over(w))
      .withColumn("sum_1h", sum($"v").over(w).cast("double"))
      .select($"user_id", $"event_id", $"sec", $"n_1h", $"sum_1h")
      .orderBy($"user_id", $"sec", $"event_id")
  }

  val windowTimeRangeSql: String =
    """SELECT user_id, event_id, sec, n_1h, sum_1h FROM (
      |  SELECT user_id, event_id,
      |    CAST(floor(epoch(ts)) AS BIGINT) AS sec,
      |    COUNT(*) OVER w AS n_1h,
      |    CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER w AS DOUBLE) AS sum_1h
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
      |    RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW)
      |)
      |ORDER BY user_id, sec, event_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "window_suite"        -> (windowSuite _),
    "window_time_range"   -> (windowTimeRange _),
    "q6_forecast"         -> (q6Forecast _),
    "dedup_edit_distance" -> (dedupEditDistance _),
    "dm_part_of_day_agg"  -> (partOfDayAgg _)
  )

  val oracleSql: Map[String, String] = Map(
    "window_suite"        -> windowSuiteSql,
    "window_time_range"   -> windowTimeRangeSql,
    "q6_forecast"         -> q6Sql,
    "dedup_edit_distance" -> dedupEditDistanceSql,
    "dm_part_of_day_agg"  -> partOfDayAggSql
  )
}
