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

  /** TPC-H Q4 shape — the EXISTS SEMI-JOIN aggregate: orders in a date
    * window counted per priority when at least one of their lineitems
    * shipped after the order date (the testdata's stand-in for
    * commit-date lateness; the schema carries no l_commitdate). The
    * correlated EXISTS plans as ONE LeftSemi hash join — the probe side
    * never duplicates (an order with 5 qualifying lineitems counts once,
    * with no post-join distinct), which is the whole point of the shape.
    */
  def q4OrderPriority(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ords = Tables.orders(spark, dir)
      .filter($"o_orderdate" >= "1996-01-01" && $"o_orderdate" < "1997-01-01")
    val li = Tables.lineitem(spark, dir).select($"l_orderkey", $"l_shipdate")
    ords.join(li,
        ords("o_orderkey") === li("l_orderkey") && li("l_shipdate") > ords("o_orderdate"),
        "left_semi")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy($"o_orderpriority")
  }

  val q4Sql: String =
    """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
      |FROM orders o
      |WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
      |  AND EXISTS (
      |    SELECT 1 FROM lineitem l
      |    WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** TPC-H Q13 shape — the OUTER-JOIN count distribution: how many
    * customers placed 0, 1, 2, … orders (urgent orders excluded, the
    * comment-filter stand-in). The zero bucket only exists because the
    * join is LEFT OUTER — count(o_orderkey) ignores the null from a
    * customer with no match; then the bounded second aggregate groups
    * customers by their count. Two partial-agg groupBys, no window.
    */
  def q13CustomerDistribution(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cust = Tables.customer(spark, dir).select($"c_custkey")
    val ords = Tables.orders(spark, dir)
      .filter($"o_orderpriority" =!= "1-URGENT")
      .select($"o_custkey", $"o_orderkey")
    cust.join(ords, cust("c_custkey") === ords("o_custkey"), "left")
      .groupBy($"c_custkey")
      .agg(count($"o_orderkey").as("c_count"))
      .groupBy($"c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy($"custdist".desc, $"c_count".desc)
  }

  val q13Sql: String =
    """SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
      |FROM (
      |  SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
      |  FROM customer LEFT OUTER JOIN orders
      |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      |  GROUP BY c_custkey
      |)
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** TPC-H Q21 shape — the SEMI + ANTI join chain: suppliers whose
    * lineitem was the LAST to ship in a MULTI-supplier order (the
    * kept-everyone-waiting supplier; wait semantics adapted to the
    * schema's ship dates). Three relations of the same lineitem table:
    * mine, someone-else's (EXISTS → LeftSemi), someone-else's-shipped-
    * after-mine (NOT EXISTS → LeftAnti) — each a hash join on
    * l_orderkey, the classic exists/not-exists pair as physical join
    * types rather than subquery re-execution.
    */
  def q21WaitingSupplier(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_suppkey", $"l_shipdate")
    val mine = li.select($"l_orderkey", $"l_suppkey", $"l_shipdate")
    val others = li.select($"l_orderkey".as("o2_orderkey"), $"l_suppkey".as("o2_suppkey"),
      $"l_shipdate".as("o2_shipdate"))
    val multi = mine.join(others,
      $"l_orderkey" === $"o2_orderkey" && $"l_suppkey" =!= $"o2_suppkey", "left_semi")
    val last = multi.join(others,
      $"l_orderkey" === $"o2_orderkey" && $"l_suppkey" =!= $"o2_suppkey" &&
        $"o2_shipdate" > $"l_shipdate", "left_anti")
    val sup = Tables.supplier(spark, dir).select($"s_suppkey", $"s_name", $"s_nationkey")
    val nat = Tables.nation(spark, dir).select($"n_nationkey", $"n_name")
    last.join(broadcast(sup), $"l_suppkey" === $"s_suppkey")
      .join(broadcast(nat), $"s_nationkey" === $"n_nationkey")
      .groupBy($"n_name", $"s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy($"numwait".desc, $"n_name", $"s_name")
  }

  val q21Sql: String =
    """SELECT n_name, s_name, CAST(COUNT(*) AS BIGINT) AS numwait
      |FROM lineitem l1
      |JOIN supplier ON l1.l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE EXISTS (
      |    SELECT 1 FROM lineitem l2
      |    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (
      |    SELECT 1 FROM lineitem l3
      |    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      |      AND l3.l_shipdate > l1.l_shipdate)
      |GROUP BY n_name, s_name
      |ORDER BY numwait DESC, n_name, s_name""".stripMargin

  /** TPC-H Q22 shape — ANTI join + scalar subquery: customers with an
    * account balance above the positive-balance average (the scalar
    * aggregate enters the plan as a broadcast 1-row cross, never a
    * per-row re-execution) who have placed NO orders (LeftAnti), rolled
    * up per nation (the schema's stand-in for the phone country code).
    * The no-orders set is empty in this testdata (every customer
    * ordered), so the anti-join side is the URGENT slice — same LeftAnti
    * plan, non-vacuous gate (the r8 bloom-dedup lesson).
    */
  def q22GlobalSales(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cust = Tables.customer(spark, dir)
      .select($"c_custkey", $"c_nationkey", $"c_acctbal")
    // threshold = exact decimal sum → ONE IEEE division (§5: AVG(DECIMAL)
    // carries engine-specific result scales; this form is bit-identical)
    val avgBal = cust.filter($"c_acctbal" > 0.0)
      .agg((sum($"c_acctbal".cast("decimal(18,2)")).cast("double") /
        count(lit(1)).cast("double")).as("avg_bal"))
    val ords = Tables.orders(spark, dir)
      .filter($"o_orderpriority" === "1-URGENT").select($"o_custkey")
    cust.crossJoin(broadcast(avgBal))
      .filter($"c_acctbal" > $"avg_bal")
      .join(ords, cust("c_custkey") === ords("o_custkey"), "left_anti")
      .groupBy($"c_nationkey")
      .agg(count(lit(1)).as("numcust"),
        sum($"c_acctbal".cast("decimal(18,2)")).cast("double").as("totacctbal"))
      .orderBy($"c_nationkey")
  }

  val q22Sql: String =
    """WITH a AS (
      |  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
      |    / CAST(COUNT(*) AS DOUBLE) AS avg_bal
      |  FROM customer WHERE c_acctbal > 0.0
      |)
      |SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS numcust,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
      |FROM customer CROSS JOIN a
      |WHERE c_acctbal > avg_bal
      |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      |GROUP BY c_nationkey
      |ORDER BY c_nationkey""".stripMargin

  /** TPC-H Q7 shape — the TWO-SIDED dimension alias join: revenue
    * between nation PAIRS, where the same nation table enters the plan
    * twice (supplier side and customer side) under different aliases and
    * the pair predicate keeps both directions of one chosen pair. Both
    * nation broadcasts are tiny; the fact chain shuffles once on
    * orderkey — aliasing dims costs nothing but a second broadcast.
    */
  def q7VolumeShipping(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li  = Tables.lineitem(spark, dir)
      .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1998-01-01").cast("timestamp"))
    val ord = Tables.orders(spark, dir).select($"o_orderkey", $"o_custkey")
    val sup = Tables.supplier(spark, dir).select($"s_suppkey", $"s_nationkey")
    val cus = Tables.customer(spark, dir).select($"c_custkey", $"c_nationkey")
    val n1 = Tables.nation(spark, dir).select($"n_nationkey".as("n1_key"), $"n_name".as("supp_nation"))
    val n2 = Tables.nation(spark, dir).select($"n_nationkey".as("n2_key"), $"n_name".as("cust_nation"))
    val rev = dec($"l_extendedprice") * dec(lit(1.0) - $"l_discount", 4, 2)
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(sup), $"l_suppkey" === $"s_suppkey")
      .join(broadcast(cus), $"o_custkey" === $"c_custkey")
      .join(broadcast(n1), $"s_nationkey" === $"n1_key")
      .join(broadcast(n2), $"c_nationkey" === $"n2_key")
      .filter(($"supp_nation" === "NATION_3" && $"cust_nation" === "NATION_7") ||
        ($"supp_nation" === "NATION_7" && $"cust_nation" === "NATION_3"))
      .withColumn("l_year", year($"l_shipdate").cast("long"))
      .groupBy($"supp_nation", $"cust_nation", $"l_year")
      .agg(sum(rev).cast("double").as("revenue"))
      .orderBy($"supp_nation", $"cust_nation", $"l_year")
  }

  val q7Sql: String =
    """SELECT supp_nation, cust_nation, l_year,
      |  CAST(SUM(volume) AS DOUBLE) AS revenue
      |FROM (
      |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |    CAST(year(l_shipdate) AS BIGINT) AS l_year,
      |    CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1.0 - l_discount AS DECIMAL(4,2)) AS volume
      |  FROM lineitem
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |  WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
      |      OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
      |    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      |)
      |GROUP BY supp_nation, cust_nation, l_year
      |ORDER BY supp_nation, cust_nation, l_year""".stripMargin

  /** TPC-H Q18 shape — the HAVING-threshold semi join: orders whose
    * total lineitem quantity exceeds a threshold, re-joined to the fact
    * chain for reporting. The qualifying-key set comes from one
    * partial-agg groupBy + filter (HAVING), then drives a LeftSemi join —
    * the aggregate never re-computes per probe row.
    */
  def q18LargeOrders(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir)
    val big = li.groupBy($"l_orderkey")
      .agg(sum(dec($"l_quantity")).as("sum_qty"))
      .filter($"sum_qty" > 150)
      .select($"l_orderkey".as("big_okey"))
    val ord = Tables.orders(spark, dir)
    val cus = Tables.customer(spark, dir).select($"c_custkey", $"c_name")
    ord.join(big, ord("o_orderkey") === big("big_okey"), "left_semi")
      .join(li, ord("o_orderkey") === li("l_orderkey"))
      .join(broadcast(cus), $"o_custkey" === $"c_custkey")
      .groupBy($"c_name", $"o_orderkey", $"o_orderdate", $"o_totalprice")
      .agg(sum(dec($"l_quantity")).cast("double").as("total_qty"))
      .orderBy($"o_totalprice".desc, $"o_orderkey")
      .limit(100)
  }

  val q18Sql: String =
    """SELECT c_name, o_orderkey, o_orderdate, o_totalprice,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
      |FROM orders
      |JOIN lineitem ON o_orderkey = l_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE o_orderkey IN (
      |  SELECT l_orderkey FROM lineitem
      |  GROUP BY l_orderkey
      |  HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 150)
      |GROUP BY c_name, o_orderkey, o_orderdate, o_totalprice
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 100""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q7_volume_shipping"  -> (q7VolumeShipping _),
    "q18_large_orders"    -> (q18LargeOrders _),
    "q4_order_priority"   -> (q4OrderPriority _),
    "q13_customer_distribution" -> (q13CustomerDistribution _),
    "q21_waiting_supplier" -> (q21WaitingSupplier _),
    "q22_global_sales"    -> (q22GlobalSales _),
    "q1_pricing_summary"  -> (q1PricingSummary _),
    "q3_shipping_priority" -> (q3ShippingPriority _),
    "q5_local_supplier"   -> (q5LocalSupplier _),
    "q17_small_quantity"  -> (q17SmallQuantity _),
    "q14_promo_revenue"   -> (q14PromoRevenue _),
    "sessionize_events"   -> (sessionizeEvents _),
    "stream_windowed_agg" -> (streamWindowedAgg _)
  )

  val oracleSql: Map[String, String] = Map(
    "q7_volume_shipping"  -> q7Sql,
    "q18_large_orders"    -> q18Sql,
    "q4_order_priority"   -> q4Sql,
    "q13_customer_distribution" -> q13Sql,
    "q21_waiting_supplier" -> q21Sql,
    "q22_global_sales"    -> q22Sql,
    "q1_pricing_summary"  -> q1Sql,
    "q3_shipping_priority" -> q3Sql,
    "q5_local_supplier"   -> q5Sql,
    "q17_small_quantity"  -> q17Sql,
    "q14_promo_revenue"   -> q14Sql,
    "sessionize_events"   -> sessionizeSql,
    "stream_windowed_agg" -> streamWindowedAggSql
  )
}
