package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Core analytics: the engine's bread-and-butter scan/join/agg/window
  * queries, shaped like the reference's warehouse workload
  * (star-schema fact scans + dimension joins + ranked aggregation).
  *
  * Oracle-parity note: row-level sums are computed on DECIMAL (exact,
  * associative — safe under any partitioning), cast to double only at the
  * end. Ratios are a single double division of identical inputs, so Spark
  * and DuckDB agree bit-for-bit.
  */
object CoreQueries {

  private def dec(c: Column, p: Int = 12, s: Int = 2): Column = c.cast(s"decimal($p,$s)")

  /** Wide aggregation over the fact table (TPC-H Q1 shape). */
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li    = Tables.lineitem(spark, dir)
    val qty   = dec($"l_quantity")
    val price = dec($"l_extendedprice")
    val omd   = dec(lit(1.0) - $"l_discount", 4, 2) // one minus discount
    val opt   = dec(lit(1.0) + $"l_tax", 4, 2)      // one plus tax
    li.filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sum(qty).cast("double").as("sum_qty"),
        sum(price).cast("double").as("sum_base_price"),
        sum(price * omd).cast("double").as("sum_disc_price"),
        sum(price * omd * opt).cast("double").as("sum_charge"),
        (sum(qty).cast("double") / count(lit(1))).as("avg_qty"),
        (sum(price).cast("double") / count(lit(1))).as("avg_price"),
        (sum(dec($"l_discount", 4, 2)).cast("double") / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order")
      )
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  val q1Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1.0 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1.0 - l_discount AS DECIMAL(4,2)) * CAST(1.0 + l_tax AS DECIMAL(4,2))) AS DOUBLE) AS sum_charge,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
      |  CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Segment revenue top-N: 3-way join + agg + deterministic top 10
    * (TPC-H Q3 shape). Customer (small) is broadcast; the orders⋈lineitem
    * join shuffles on orderkey — the natural 100 TB plan.
    */
  def q3ShippingPriority(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cust = Tables.customer(spark, dir).filter($"c_mktsegment" === "BUILDING")
    val ord  = Tables.orders(spark, dir).filter($"o_orderdate" < lit("1998-03-15").cast("timestamp"))
    val li   = Tables.lineitem(spark, dir).filter($"l_shipdate" > lit("1998-03-15").cast("timestamp"))
    val rev  = dec($"l_extendedprice") * dec(lit(1.0) - $"l_discount", 4, 2)
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(cust), $"o_custkey" === $"c_custkey")
      .groupBy($"l_orderkey", $"o_orderdate", $"o_orderpriority")
      .agg(sum(rev).cast("double").as("revenue"))
      .select($"l_orderkey", $"revenue", $"o_orderdate".as("orderdate"), $"o_orderpriority")
      .orderBy($"revenue".desc, $"l_orderkey")
      .limit(10)
  }

  val q3Sql: String =
    """SELECT l_orderkey,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1.0 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
      |  o_orderdate AS orderdate, o_orderpriority
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
      |GROUP BY l_orderkey, orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin

  /** Local-supplier volume: 6-way star join (TPC-H Q5 shape). All dims
    * (region, nation, customer, supplier) broadcast; only orders⋈lineitem
    * shuffles.
    */
  def q5LocalSupplier(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val reg  = Tables.region(spark, dir).filter($"r_name" === "ASIA")
    val nat  = Tables.nation(spark, dir)
    val cust = Tables.customer(spark, dir)
    val sup  = Tables.supplier(spark, dir)
    val ord = Tables.orders(spark, dir)
      .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
        $"o_orderdate" < lit("1998-01-01").cast("timestamp"))
    val li  = Tables.lineitem(spark, dir)
    val rev = dec($"l_extendedprice") * dec(lit(1.0) - $"l_discount", 4, 2)
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(sup), $"l_suppkey" === $"s_suppkey")
      .join(broadcast(cust),
        $"o_custkey" === $"c_custkey" && $"c_nationkey" === $"s_nationkey")
      .join(broadcast(nat), $"s_nationkey" === $"n_nationkey")
      .join(broadcast(reg), $"n_regionkey" === $"r_regionkey")
      .groupBy($"n_name")
      .agg(sum(rev).cast("double").as("revenue"))
      .orderBy($"revenue".desc, $"n_name")
  }

  val q5Sql: String =
    """SELECT n_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1.0 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  /** Gap-based sessionization over the event stream (30-minute inactivity
    * gap), the batch twin of streaming.SessionizeStream. One shuffle on
    * user_id; lag + running-sum windows share that partitioning.
    * Sub-second timestamp precision differs across engines (Spark µs vs
    * DuckDB ns), so gap math is done on whole epoch-seconds.
    */
  def sessionizeEvents(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select($"user_id", $"event_id", $"value",
        unix_timestamp($"ts").as("ts_sec")) // whole seconds: engine-agnostic
    val byUser  = Window.partitionBy($"user_id").orderBy($"ts_sec", $"event_id")
    val newSess = when(
      $"ts_sec" - lag($"ts_sec", 1).over(byUser) > lit(1800), lit(1)
    ).otherwise(lit(0))
    ev.withColumn("is_new", when(lag($"ts_sec", 1).over(byUser).isNull, lit(1)).otherwise(newSess))
      .withColumn("session_seq", sum($"is_new").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy($"user_id", $"session_seq")
      .agg(
        count(lit(1)).as("n_events"),
        min($"ts_sec").as("session_start_sec"),
        max($"ts_sec").as("session_end_sec"),
        sum(dec($"value", 10, 2)).cast("double").as("session_value")
      )
      .orderBy($"user_id", $"session_seq")
  }

  val sessionizeSql: String =
    """WITH ev AS (
      |  SELECT user_id, event_id, value,
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
      |  SELECT *, CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_sec, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
      |  FROM flagged
      |)
      |SELECT user_id, session_seq,
      |  COUNT(*) AS n_events,
      |  MIN(ts_sec) AS session_start_sec,
      |  MAX(ts_sec) AS session_end_sec,
      |  CAST(SUM(CAST(value AS DECIMAL(10,2))) AS DOUBLE) AS session_value
      |FROM sessions
      |GROUP BY user_id, session_seq
      |ORDER BY user_id, session_seq""".stripMargin

  /** Tumbling-window aggregation — the batch twin of the streaming
    * pipeline's windowed agg (same semantics, so streaming output can be
    * verified against it).
    */
  def streamWindowedAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .groupBy(
        window($"ts", "1 hour")("start").cast("timestamp").as("window_start"),
        $"event_type")
      .agg(
        count(lit(1)).as("n_events"),
        sum(dec($"value", 10, 2)).cast("double").as("total_value"),
        countDistinct($"user_id").as("distinct_users"))
      .orderBy($"window_start", $"event_type")
  }

  val streamWindowedAggSql: String =
    """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start, event_type,
      |  COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(10,2))) AS DOUBLE) AS total_value,
      |  COUNT(DISTINCT user_id) AS distinct_users
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin


  /** Small-quantity threshold (TPC-H Q17 shape): rows under 20% of their
    * part's average quantity. The correlated aggregate is a window over the
    * part key — decimal-exact sum/count so the threshold is engine-stable.
    */
  def q17SmallQuantity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"l_partkey")
    Tables.lineitem(spark, dir)
      .select($"l_partkey", dec($"l_quantity").as("qty"), dec($"l_extendedprice").as("price"))
      .withColumn("avg_qty", sum($"qty").over(w).cast("double") / count(lit(1)).over(w))
      .filter($"qty".cast("double") < $"avg_qty" * 0.2)
      .agg(
        (sum($"price").cast("double") / 7.0).as("avg_yearly"),
        count(lit(1)).as("n_small"))
  }

  val q17Sql: String =
    """WITH t AS (
      |  SELECT l_partkey,
      |    CAST(l_quantity AS DECIMAL(12,2)) AS qty,
      |    CAST(l_extendedprice AS DECIMAL(12,2)) AS price,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) OVER (PARTITION BY l_partkey) AS DOUBLE)
      |      / COUNT(*) OVER (PARTITION BY l_partkey) AS avg_qty
      |  FROM lineitem
      |)
      |SELECT CAST(SUM(price) AS DOUBLE) / 7.0 AS avg_yearly,
      |  COUNT(*) AS n_small
      |FROM t
      |WHERE CAST(qty AS DOUBLE) < avg_qty * 0.2""".stripMargin

  /** Promo-revenue ratio (TPC-H Q14 shape): conditional aggregation ratio
    * with a broadcast part join — decimal sums, one double division.
    */
  def q14PromoRevenue(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pt  = Tables.part(spark, dir).select($"p_partkey", $"p_type")
    val rev = dec($"l_extendedprice") * dec(lit(1.0) - $"l_discount", 4, 2)
    Tables.lineitem(spark, dir)
      .filter($"l_shipdate" >= lit("1997-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1997-04-01").cast("timestamp"))
      .join(broadcast(pt), $"l_partkey" === $"p_partkey")
      .agg(
        (sum(when($"p_type" === "PROMO", rev).otherwise(lit(0).cast("decimal(12,2)"))).cast("double") * 100.0 /
          sum(rev).cast("double")).as("promo_revenue_pct"),
        count(lit(1)).as("n_rows"))
  }

  val q14Sql: String =
    """SELECT
      |  CAST(SUM(CASE WHEN p_type = 'PROMO'
      |    THEN CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1.0 - l_discount AS DECIMAL(4,2))
      |    ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) * 100.0
      |    / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1.0 - l_discount AS DECIMAL(4,2))) AS DOUBLE)
      |    AS promo_revenue_pct,
      |  COUNT(*) AS n_rows
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary"  -> (q1PricingSummary _),
    "q3_shipping_priority" -> (q3ShippingPriority _),
    "q5_local_supplier"   -> (q5LocalSupplier _),
    "q17_small_quantity"  -> (q17SmallQuantity _),
    "q14_promo_revenue"   -> (q14PromoRevenue _),
    "sessionize_events"   -> (sessionizeEvents _),
    "stream_windowed_agg" -> (streamWindowedAgg _)
  )

  val oracleSql: Map[String, String] = Map(
    "q1_pricing_summary"  -> q1Sql,
    "q3_shipping_priority" -> q3Sql,
    "q5_local_supplier"   -> q5Sql,
    "q17_small_quantity"  -> q17Sql,
    "q14_promo_revenue"   -> q14Sql,
    "sessionize_events"   -> sessionizeSql,
    "stream_windowed_agg" -> streamWindowedAggSql
  )
}
