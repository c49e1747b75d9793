package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** The remaining classic TPC-H join/agg shapes, adapted to the testdata
  * star schema (which carries no partsupp table and no
  * l_shipmode/l_commitdate/p_container columns — each adaptation keeps
  * the QUERY SHAPE, the thing the engine is graded on, and swaps the
  * missing column for a present one with the same role).
  *
  * Shapes covered here: correlated argmin-per-group re-join (Q2),
  * conditional market-share ratio inside a year rollup (Q8), multi-dim
  * profit rollup (Q9), returned-item top-N report (Q10), two-class
  * CASE-counting on a lateness predicate (Q12), scalar-max view join
  * (Q15), distinct-count-with-exclusion rollup (Q16), and the
  * OR-of-ANDs pushdown predicate (Q19).
  *
  * Same oracle-parity discipline as CoreQueries: row-level money math on
  * DECIMAL (exact, associative — partitioning-proof), cast to double at
  * the end; ratios are ONE IEEE division of identical inputs.
  */
object TpchMore {

  private def dec(c: Column, p: Int = 12, s: Int = 2): Column = c.cast(s"decimal($p,$s)")

  /** TPC-H Q2 shape — the correlated ARGMIN-per-group re-join: for each
    * small part, the supplier(s) that shipped it at the minimum unit
    * price. The correlated `= (SELECT MIN ...)` subquery plans as ONE
    * partial-agg groupBy + an equi-join back on (part, exact min) — the
    * aggregate is never re-executed per probe row, and both sides of the
    * min comparison are the SAME IEEE division, so equality is
    * engine-stable. No partsupp table in this schema: lineitem is the
    * part↔supplier bridge and extendedprice/quantity the supplycost.
    */
  def q2ArgminSupplier(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pt = Tables.part(spark, dir)
      .filter($"p_type" === "SMALL" && $"p_size" <= 15)
      .select($"p_partkey", $"p_brand")
    val up = Tables.lineitem(spark, dir)
      .join(broadcast(pt), $"l_partkey" === $"p_partkey")
      .select($"l_partkey", $"p_brand", $"l_suppkey",
        ($"l_extendedprice" / $"l_quantity").as("unit_price"))
    val mn = up.groupBy($"l_partkey".as("mn_partkey"))
      .agg(min($"unit_price").as("min_price"))
    val sup = Tables.supplier(spark, dir).select($"s_suppkey", $"s_name")
    up.join(mn, $"l_partkey" === $"mn_partkey" && $"unit_price" === $"min_price")
      .join(broadcast(sup), $"l_suppkey" === $"s_suppkey")
      .select($"l_partkey".as("p_partkey"), $"p_brand", $"s_name", $"min_price")
      .distinct()
      .orderBy($"p_partkey", $"s_name")
  }

  val q2Sql: String =
    """WITH up AS (
      |  SELECT l_partkey, p_brand, l_suppkey,
      |    l_extendedprice / l_quantity AS unit_price
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE p_type = 'SMALL' AND p_size <= 15
      |), mn AS (
      |  SELECT l_partkey AS mn_partkey, MIN(unit_price) AS min_price
      |  FROM up GROUP BY 1
      |)
      |SELECT DISTINCT up.l_partkey AS p_partkey, up.p_brand, s_name, min_price
      |FROM up
      |JOIN mn ON up.l_partkey = mn_partkey AND up.unit_price = mn.min_price
      |JOIN supplier ON up.l_suppkey = s_suppkey
      |ORDER BY p_partkey, s_name""".stripMargin

  /** TPC-H Q8 shape — national MARKET SHARE per year: of all ASIA-region
    * promo-part revenue, the fraction supplied by one nation. The
    * numerator is a conditional decimal sum inside the same rollup as
    * the denominator (one pass, no second join), and the share is one
    * double division of two exact decimal sums.
    */
  def q8MarketShare(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pt  = Tables.part(spark, dir).filter($"p_type" === "PROMO").select($"p_partkey")
    val reg = Tables.region(spark, dir).filter($"r_name" === "ASIA")
    val nat = Tables.nation(spark, dir)
    val natCust = nat.join(broadcast(reg), $"n_regionkey" === $"r_regionkey")
      .select($"n_nationkey".as("cn_key"))
    val natSup = Tables.nation(spark, dir)
      .select($"n_nationkey".as("sn_key"), $"n_name".as("supp_nation"))
    val cus = Tables.customer(spark, dir).select($"c_custkey", $"c_nationkey")
    val sup = Tables.supplier(spark, dir).select($"s_suppkey", $"s_nationkey")
    val ord = Tables.orders(spark, dir).select($"o_orderkey", $"o_custkey", $"o_orderdate")
    val rev = dec($"l_extendedprice") * dec(lit(1.0) - $"l_discount", 4, 2)
    Tables.lineitem(spark, dir)
      .join(broadcast(pt), $"l_partkey" === $"p_partkey")
      .join(ord, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(cus), $"o_custkey" === $"c_custkey")
      .join(broadcast(natCust), $"c_nationkey" === $"cn_key", "left_semi")
      .join(broadcast(sup), $"l_suppkey" === $"s_suppkey")
      .join(broadcast(natSup), $"s_nationkey" === $"sn_key")
      .withColumn("o_year", year($"o_orderdate").cast("long"))
      .groupBy($"o_year")
      .agg(
        (sum(when($"supp_nation" === "NATION_3", rev).otherwise(lit(0).cast("decimal(12,2)"))).cast("double") /
          sum(rev).cast("double")).as("mkt_share"),
        sum(rev).cast("double").as("total_revenue"))
      .orderBy($"o_year")
  }

  val q8Sql: String =
    """SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
      |  CAST(SUM(CASE WHEN n2.n_name = 'NATION_3'
      |    THEN CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1.0 - l_discount AS DECIMAL(4,2))
      |    ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
      |    / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1.0 - l_discount AS DECIMAL(4,2))) AS DOUBLE)
      |    AS mkt_share,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1.0 - l_discount AS DECIMAL(4,2))) AS DOUBLE)
      |    AS total_revenue
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation n2 ON s_nationkey = n2.n_nationkey
      |WHERE p_type = 'PROMO'
      |  AND c_nationkey IN (
      |    SELECT n_nationkey FROM nation JOIN region ON n_regionkey = r_regionkey
      |    WHERE r_name = 'ASIA')
      |GROUP BY 1
      |ORDER BY 1""".stripMargin

  /** TPC-H Q9 shape — the PROFIT rollup over (supplier nation, year):
    * revenue minus cost across a part+supplier+orders join chain. No
    * ps_supplycost in this schema; p_retailprice·quantity is the cost
    * leg (same role: a per-part unit cost scaled by quantity). Part
    * filter on the name, dims broadcast, one orderkey shuffle.
    */
  def q9Profit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pt = Tables.part(spark, dir).filter($"p_name".contains("gear"))
      .select($"p_partkey", $"p_retailprice")
    val sup = Tables.supplier(spark, dir).select($"s_suppkey", $"s_nationkey")
    val nat = Tables.nation(spark, dir).select($"n_nationkey", $"n_name")
    val ord = Tables.orders(spark, dir).select($"o_orderkey", $"o_orderdate")
    val amount =
      dec($"l_extendedprice") * dec(lit(1.0) - $"l_discount", 4, 2) -
        dec($"p_retailprice") * dec($"l_quantity")
    Tables.lineitem(spark, dir)
      .join(broadcast(pt), $"l_partkey" === $"p_partkey")
      .join(broadcast(sup), $"l_suppkey" === $"s_suppkey")
      .join(broadcast(nat), $"s_nationkey" === $"n_nationkey")
      .join(ord, $"l_orderkey" === $"o_orderkey")
      .withColumn("o_year", year($"o_orderdate").cast("long"))
      .groupBy($"n_name".as("nation"), $"o_year")
      .agg(sum(amount).cast("double").as("sum_profit"))
      .orderBy($"nation", $"o_year".desc)
  }

  val q9Sql: String =
    """SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1.0 - l_discount AS DECIMAL(4,2))
      |    - CAST(p_retailprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
      |    AS sum_profit
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN orders ON l_orderkey = o_orderkey
      |WHERE p_name LIKE '%gear%'
      |GROUP BY 1, 2
      |ORDER BY nation, o_year DESC""".stripMargin

  /** TPC-H Q10 shape — the RETURNED-ITEM report: top 20 customers by
    * lost revenue on returned lineitems in one order quarter. GroupBy on
    * the customer grain carries the report columns; the top-N is a
    * TakeOrdered with a full tie-break, never a global sort.
    */
  def q10ReturnedItems(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ord = Tables.orders(spark, dir)
      .filter($"o_orderdate" >= lit("1997-01-01").cast("timestamp") &&
        $"o_orderdate" < lit("1997-04-01").cast("timestamp"))
      .select($"o_orderkey", $"o_custkey")
    val cus = Tables.customer(spark, dir)
      .select($"c_custkey", $"c_name", $"c_acctbal", $"c_nationkey")
    val nat = Tables.nation(spark, dir).select($"n_nationkey", $"n_name")
    val rev = dec($"l_extendedprice") * dec(lit(1.0) - $"l_discount", 4, 2)
    Tables.lineitem(spark, dir).filter($"l_returnflag" === "R")
      .join(ord, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(cus), $"o_custkey" === $"c_custkey")
      .join(broadcast(nat), $"c_nationkey" === $"n_nationkey")
      .groupBy($"c_custkey", $"c_name", $"c_acctbal", $"n_name")
      .agg(sum(rev).cast("double").as("revenue"))
      .orderBy($"revenue".desc, $"c_custkey")
      .limit(20)
  }

  val q10Sql: String =
    """SELECT c_custkey, c_name, c_acctbal, n_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1.0 - l_discount AS DECIMAL(4,2))) AS DOUBLE)
      |    AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE l_returnflag = 'R'
      |  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
      |GROUP BY c_custkey, c_name, c_acctbal, n_name
      |ORDER BY revenue DESC, c_custkey
      |LIMIT 20""".stripMargin

  /** TPC-H Q12 shape — two-class CASE counting on a join predicate: late
    * shipments (shipped > 60 days after the order date — the schema's
    * stand-in for the receipt/commit lag) split into high- vs
    * low-priority order counts per linestatus. One join, one CASE pair,
    * one rollup.
    */
  def q12LateShipments(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ord = Tables.orders(spark, dir).select($"o_orderkey", $"o_orderdate", $"o_orderpriority")
    val hi = $"o_orderpriority" === "1-URGENT" || $"o_orderpriority" === "2-HIGH"
    Tables.lineitem(spark, dir)
      .join(ord, $"l_orderkey" === $"o_orderkey")
      .filter($"l_shipdate" > $"o_orderdate" + expr("INTERVAL 60 DAYS"))
      .groupBy($"l_linestatus")
      .agg(
        sum(when(hi, lit(1L)).otherwise(lit(0L))).as("high_line_count"),
        sum(when(hi, lit(0L)).otherwise(lit(1L))).as("low_line_count"))
      .orderBy($"l_linestatus")
  }

  val q12Sql: String =
    """SELECT l_linestatus,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
      |    AS high_line_count,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT)
      |    AS low_line_count
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
      |GROUP BY l_linestatus
      |ORDER BY l_linestatus""".stripMargin

  /** TPC-H Q15 shape — the SCALAR-MAX view join: per-supplier quarter
    * revenue, keeping the supplier(s) equal to the maximum. The revenue
    * "view" is computed ONCE (one groupBy), the max is a 1-row broadcast
    * cross, and the equality compares two copies of the same exact
    * decimal-sum-cast double — engine-stable, no re-execution.
    */
  def q15TopSupplier(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val rev = dec($"l_extendedprice") * dec(lit(1.0) - $"l_discount", 4, 2)
    val revenue = Tables.lineitem(spark, dir)
      .filter($"l_shipdate" >= lit("1997-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1997-04-01").cast("timestamp"))
      .groupBy($"l_suppkey")
      .agg(sum(rev).cast("double").as("total_revenue"))
    val mx = revenue.agg(max($"total_revenue").as("max_revenue"))
    val sup = Tables.supplier(spark, dir).select($"s_suppkey", $"s_name")
    revenue.crossJoin(broadcast(mx))
      .filter($"total_revenue" === $"max_revenue")
      .join(broadcast(sup), $"l_suppkey" === $"s_suppkey")
      .select($"s_suppkey", $"s_name", $"total_revenue")
      .orderBy($"s_suppkey")
  }

  val q15Sql: String =
    """WITH revenue AS (
      |  SELECT l_suppkey,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1.0 - l_discount AS DECIMAL(4,2))) AS DOUBLE)
      |      AS total_revenue
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
      |  GROUP BY l_suppkey
      |)
      |SELECT s_suppkey, s_name, total_revenue
      |FROM revenue JOIN supplier ON l_suppkey = s_suppkey
      |WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
      |ORDER BY s_suppkey""".stripMargin

  /** TPC-H Q16 shape — DISTINCT-count with an exclusion anti-join: how
    * many distinct suppliers ship each (brand, type, size) part class,
    * excluding one brand and excluding in-debt suppliers (the complaint
    * list's stand-in: s_acctbal < 0, a NOT IN → LeftAnti against a tiny
    * key set). lineitem is the part↔supplier bridge (no partsupp table);
    * the distinct count shuffles once on the class grain.
    */
  def q16SupplierCnt(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pt = Tables.part(spark, dir)
      .filter($"p_brand" =!= "Brand#5" && $"p_size".isin(1, 4, 9, 14, 19, 24, 29, 34))
      .select($"p_partkey", $"p_brand", $"p_type", $"p_size")
    val badSup = Tables.supplier(spark, dir).filter($"s_acctbal" < 0.0)
      .select($"s_suppkey".as("bad_suppkey"))
    Tables.lineitem(spark, dir).select($"l_partkey", $"l_suppkey")
      .join(broadcast(pt), $"l_partkey" === $"p_partkey")
      .join(broadcast(badSup), $"l_suppkey" === $"bad_suppkey", "left_anti")
      .groupBy($"p_brand", $"p_type", $"p_size")
      .agg(countDistinct($"l_suppkey").as("supplier_cnt"))
      .orderBy($"supplier_cnt".desc, $"p_brand", $"p_type", $"p_size")
  }

  val q16Sql: String =
    """SELECT p_brand, p_type, p_size,
      |  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |WHERE p_brand <> 'Brand#5'
      |  AND p_size IN (1, 4, 9, 14, 19, 24, 29, 34)
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
      |GROUP BY p_brand, p_type, p_size
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  /** TPC-H Q19 shape — the OR-of-ANDs DISJUNCTIVE predicate: three
    * brand/size/quantity bands unioned by OR inside one scan. The join
    * keys stay conjunctive (Catalyst extracts l_partkey = p_partkey as
    * the equi-join condition; the disjunction becomes a post-join
    * filter), so the scan is pruned and the join hash-based — the
    * classic test that an engine doesn't fall back to a nested loop on
    * OR predicates.
    */
  def q19DisjunctivePred(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pt = Tables.part(spark, dir).select($"p_partkey", $"p_brand", $"p_size")
    val rev = dec($"l_extendedprice") * dec(lit(1.0) - $"l_discount", 4, 2)
    val band1 = $"p_brand" === "Brand#12" && $"p_size".between(1, 5)  && $"l_quantity".between(1, 11)
    val band2 = $"p_brand" === "Brand#23" && $"p_size".between(1, 10) && $"l_quantity".between(10, 20)
    val band3 = $"p_brand" === "Brand#34" && $"p_size".between(1, 15) && $"l_quantity".between(20, 30)
    Tables.lineitem(spark, dir)
      .join(broadcast(pt), $"l_partkey" === $"p_partkey")
      .filter(band1 || band2 || band3)
      .agg(sum(rev).cast("double").as("revenue"), count(lit(1)).as("n_rows"))
  }

  val q19Sql: String =
    """SELECT
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1.0 - l_discount AS DECIMAL(4,2))) AS DOUBLE)
      |    AS revenue,
      |  CAST(COUNT(*) AS BIGINT) AS n_rows
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1 AND 11)
      |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
      |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)""".stripMargin

  /** TPC-H Q11 shape — group-level HAVING against a GLOBAL scalar: per
    * part, one nation's inventory value (decimal-exact), kept only when
    * it exceeds a fraction of the nation's total. The total enters as a
    * broadcast 1-row cross (computed once, never per group); both sides
    * of the threshold compare are exact decimal sums cast to double, so
    * the cut is engine-stable. No partsupp: the (part, supplier)
    * shipment value from lineitem is the stock-value stand-in.
    */
  def q11ImportantStock(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sup = Tables.supplier(spark, dir).filter($"s_nationkey" === 3)
      .select($"s_suppkey")
    val ps = Tables.lineitem(spark, dir)
      .join(broadcast(sup), $"l_suppkey" === $"s_suppkey", "left_semi")
      .groupBy($"l_partkey")
      .agg(sum(dec($"l_extendedprice")).as("value_dec"))
    val total = ps.agg(sum($"value_dec").cast("double").as("total_value"))
    ps.crossJoin(broadcast(total))
      .filter($"value_dec".cast("double") > $"total_value" * 0.002)
      .select($"l_partkey", $"value_dec".cast("double").as("part_value"))
      .orderBy($"part_value".desc, $"l_partkey")
  }

  val q11Sql: String =
    """WITH ps AS (
      |  SELECT l_partkey, SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS value_dec
      |  FROM lineitem
      |  WHERE l_suppkey IN (SELECT s_suppkey FROM supplier WHERE s_nationkey = 3)
      |  GROUP BY l_partkey
      |), total AS (
      |  SELECT CAST(SUM(value_dec) AS DOUBLE) AS total_value FROM ps
      |)
      |SELECT l_partkey, CAST(value_dec AS DOUBLE) AS part_value
      |FROM ps CROSS JOIN total
      |WHERE CAST(value_dec AS DOUBLE) > total_value * 0.002
      |ORDER BY part_value DESC, l_partkey""".stripMargin

  /** TPC-H Q20 shape — the NESTED SEMI-JOIN chain: suppliers who carry
    * a dominant share of some part's total shipped quantity (>30% — the
    * excess/concentration screen; availqty>half-of-sold adapted to the
    * schema). Two partial aggregates of the same fact table meet on the
    * part key, the threshold survivors' supplier keys drive a LeftSemi
    * into the supplier dim — the qualifying set never re-computes per
    * probe row, and the supplier table is never joined to the fact.
    */
  def q20ExcessSuppliers(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir)
    val tot = li.groupBy($"l_partkey".as("t_partkey"))
      .agg(sum(dec($"l_quantity")).as("part_qty"),
        countDistinct($"l_suppkey").as("n_supp"))
    val bySupp = li.groupBy($"l_partkey", $"l_suppkey")
      .agg(sum(dec($"l_quantity")).as("supp_qty"))
    // relative concentration (share > 2.5x the part's fair share): an
    // absolute share cut dilutes away as supplier counts grow with the
    // corpus — this form stays non-vacuous at every SF (the r8
    // vacuous-gate lesson applied to thresholds, not just predicates)
    val heavy = bySupp.join(tot, $"l_partkey" === $"t_partkey")
      .filter($"supp_qty".cast("double") * $"n_supp".cast("double") >
        $"part_qty".cast("double") * 2.5)
      .select($"l_suppkey")
    val nat = Tables.nation(spark, dir).select($"n_nationkey", $"n_name")
    Tables.supplier(spark, dir)
      .join(heavy, $"s_suppkey" === heavy("l_suppkey"), "left_semi")
      .join(broadcast(nat), $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey", $"s_name", $"n_name")
      .orderBy($"s_suppkey")
  }

  val q20Sql: String =
    """WITH tot AS (
      |  SELECT l_partkey AS t_partkey, SUM(CAST(l_quantity AS DECIMAL(12,2))) AS part_qty,
      |    CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supp
      |  FROM lineitem GROUP BY 1
      |), by_supp AS (
      |  SELECT l_partkey, l_suppkey, SUM(CAST(l_quantity AS DECIMAL(12,2))) AS supp_qty
      |  FROM lineitem GROUP BY 1, 2
      |), heavy AS (
      |  SELECT l_suppkey FROM by_supp JOIN tot ON l_partkey = t_partkey
      |  WHERE CAST(supp_qty AS DOUBLE) * CAST(n_supp AS DOUBLE) > CAST(part_qty AS DOUBLE) * 2.5
      |)
      |SELECT s_suppkey, s_name, n_name
      |FROM supplier
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE s_suppkey IN (SELECT l_suppkey FROM heavy)
      |ORDER BY s_suppkey""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q2_argmin_supplier"   -> (q2ArgminSupplier _),
    "q8_market_share"      -> (q8MarketShare _),
    "q9_profit"            -> (q9Profit _),
    "q10_returned_items"   -> (q10ReturnedItems _),
    "q12_late_shipments"   -> (q12LateShipments _),
    "q15_top_supplier"     -> (q15TopSupplier _),
    "q16_supplier_cnt"     -> (q16SupplierCnt _),
    "q19_disjunctive_pred" -> (q19DisjunctivePred _),
    "q11_important_stock"  -> (q11ImportantStock _),
    "q20_excess_suppliers" -> (q20ExcessSuppliers _)
  )

  val oracleSql: Map[String, String] = Map(
    "q2_argmin_supplier"   -> q2Sql,
    "q8_market_share"      -> q8Sql,
    "q9_profit"            -> q9Sql,
    "q10_returned_items"   -> q10Sql,
    "q12_late_shipments"   -> q12Sql,
    "q15_top_supplier"     -> q15Sql,
    "q16_supplier_cnt"     -> q16Sql,
    "q19_disjunctive_pred" -> q19Sql,
    "q11_important_stock"  -> q11Sql,
    "q20_excess_suppliers" -> q20Sql
  )
}
