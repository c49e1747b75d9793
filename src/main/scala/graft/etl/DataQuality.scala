package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Data-quality profiling and constraint checking — the Deequ-shaped
  * validation stage every continuously-loaded warehouse and training-data
  * pipeline runs before facts land (the reference's transformer cleans and
  * validates row-by-row in pandas, scripts/transform_scripts/
  * transformer.py:1; this is that gate as distributed aggregates).
  *
  * Both entries are ONE scan each: the profile stacks the profiled
  * columns map-side and runs two chained partial-agg hash aggregates
  * (see [[dqProfileOn]] — the naive per-column countDistinct EXPAND plan
  * was measured ~10 s warm at sf0.1 and removed); the constraint suite
  * folds every check into a single multi-aggregate pass (violation
  * counts as conditional sums, the uniqueness check as count −
  * countDistinct). Exact longs and strings only → both entries are
  * DuckDB oracle hash-exact, with the SQL generated from the same
  * column/check lists as the Spark side so the two engines cannot drift.
  *
  * Scale notes: the profile's shuffle is bounded by distinct values per
  * column (map-side combine collapses repeats); for near-unique columns
  * at 100 TB the drop-in relaxation is the HLL sketch column
  * ([[graft.core.MiscQueries]]'s sketch_distinct_hll machinery) — same
  * output shape, mergeable state. Constraint checks are pure conditional
  * sums: map-side combine, one row out.
  */
object DataQuality {

  /** (name, column) pairs profiled: the integral keys and the low-card
    * string dims — min/max computed NUMERICALLY first, then cast to
    * string for the uniform output shape (casting before min would
    * compare lexicographically: "10" < "9").
    */
  private val profileCols: Seq[String] =
    Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_returnflag", "l_linestatus")

  /** §2 entry `dq_profile`: per-column null counts, exact distinct
    * counts, min/max over lineitem — one corpus scan.
    */
  def dqProfile(spark: SparkSession, dir: String): DataFrame =
    dqProfileOn(Tables.lineitem(spark, dir))

  /** The string-typed members of [[profileCols]]; the rest are integral
    * (profiled through a long channel so min/max stay numeric and the
    * string cast of the result matches the direct cast of the int min).
    */
  private val stringProfileCols = Set("l_returnflag", "l_linestatus")

  /** Core over any lineitem-shaped frame (injectable for the planted-
    * violation spec).
    *
    * Plan shape (round-9 rewrite): the obvious `countDistinct per column
    * in one aggregate` plans as an EXPAND — every input row multiplies
    * ×|columns| through a single hash aggregate, measured ~10 s warm at
    * sf0.1 and ruinous at 100 TB. Instead the columns STACK map-side into
    * (col_name, vlong, vstr) rows and flow through TWO chained partial-agg
    * hash aggregates: groupBy (col, value) → per-value counts (map-side
    * combine collapses duplicates before the exchange, so the shuffle is
    * bounded by DISTINCT values, not rows), then groupBy (col) where the
    * null-group's count IS the null count, the non-null group count IS the
    * distinct count, and min/max over distinct values equal min/max over
    * all. Same single corpus scan (spec-asserted), same exact output. For
    * a near-unique column at extreme scale the (col, value) shuffle is
    * corpus-sized — there the HLL sketch column (sketch_distinct_hll
    * machinery) is the drop-in relaxation, same output shape.
    */
  private[graft] def dqProfileOn(li: DataFrame): DataFrame = {
    import li.sparkSession.implicits._
    val stacked = li.select(explode(array(profileCols.map { c =>
      if (stringProfileCols(c))
        struct(lit(c).as("col_name"), lit(null).cast("long").as("vlong"),
          col(c).cast("string").as("vstr"))
      else
        struct(lit(c).as("col_name"), col(c).cast("long").as("vlong"),
          lit(null).cast("string").as("vstr"))
    }: _*)).as("s")).select($"s.col_name", $"s.vlong", $"s.vstr")
    stacked
      .groupBy($"col_name", $"vlong", $"vstr").agg(count(lit(1)).as("cnt"))
      .groupBy($"col_name")
      .agg(
        sum($"cnt").as("n_rows"),
        sum(when($"vlong".isNull && $"vstr".isNull, $"cnt").otherwise(0L)).as("n_null"),
        sum(when($"vlong".isNotNull || $"vstr".isNotNull, 1L).otherwise(0L)).as("n_distinct"),
        coalesce(min($"vlong").cast("string"), min($"vstr")).as("min_val"),
        coalesce(max($"vlong").cast("string"), max($"vstr")).as("max_val"))
      .select($"col_name", $"n_rows", $"n_null", $"n_distinct", $"min_val", $"max_val")
      .orderBy($"col_name")
  }

  val dqProfileSql: String = {
    val branches = profileCols.map { c =>
      s"""SELECT '$c' AS col_name, (SELECT COUNT(*) FROM lineitem) AS n_rows,
         |  CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
         |  COUNT(DISTINCT $c) AS n_distinct,
         |  CAST(min($c) AS VARCHAR) AS min_val,
         |  CAST(max($c) AS VARCHAR) AS max_val
         |FROM lineitem""".stripMargin
    }
    branches.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
  }

  /** The constraint suite, shared between the Spark and SQL sides as
    * (name, violation-predicate SQL): a row violates when the predicate
    * is TRUE. The uniqueness check is separate (not row-local).
    */
  private val rowChecks: Seq[(String, String)] = Seq(
    "l_orderkey_not_null"    -> "l_orderkey IS NULL",
    "l_linenumber_positive"  -> "NOT (l_linenumber >= 1) OR l_linenumber IS NULL",
    "l_quantity_in_1_50"     -> "NOT (l_quantity >= 1 AND l_quantity <= 50) OR l_quantity IS NULL",
    "l_returnflag_in_domain" -> "l_returnflag NOT IN ('A', 'N', 'R') OR l_returnflag IS NULL",
    "l_linestatus_in_domain" -> "l_linestatus NOT IN ('O', 'F') OR l_linestatus IS NULL")

  /** §2 entry `dq_constraints`: the whole check suite in one scan — each
    * row-local check a conditional sum, the composite-key uniqueness
    * check as count − countDistinct(orderkey, linenumber); one row per
    * constraint with its violation count and verdict.
    */
  def dqConstraints(spark: SparkSession, dir: String): DataFrame =
    dqConstraintsOn(Tables.lineitem(spark, dir))

  /** Core over any lineitem-shaped frame (injectable for the planted-
    * violation spec). */
  private[graft] def dqConstraintsOn(li: DataFrame): DataFrame = {
    import li.sparkSession.implicits._
    val aggs: Seq[Column] =
      rowChecks.map { case (name, pred) =>
        sum(when(expr(pred), 1L).otherwise(0L)).as(name)
      } :+ (count(lit(1)) - countDistinct(struct($"l_orderkey", $"l_linenumber")))
        // struct, not the varargs form: countDistinct(a, b) silently drops
        // rows where EITHER key is null, while DuckDB's (a, b) row keeps
        // them — a null-keyed duplicate must still count as a violation
        .as("pk_unique_orderkey_linenumber")
    val one = li.agg(aggs.head, aggs.tail: _*).localCheckpoint()
    val names = rowChecks.map(_._1) :+ "pk_unique_orderkey_linenumber"
    names.map { n =>
      one.select(lit(n).as("constraint_name"), col(n).cast("long").as("n_violations"))
    }.reduce(_ unionByName _)
      .select($"constraint_name", $"n_violations",
        ($"n_violations" === 0L).as("ok"))
      .orderBy($"constraint_name")
  }

  val dqConstraintsSql: String = {
    val branches = rowChecks.map { case (name, pred) =>
      s"""SELECT '$name' AS constraint_name,
         |  CAST(SUM(CASE WHEN $pred THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
         |FROM lineitem""".stripMargin
    } :+
      s"""SELECT 'pk_unique_orderkey_linenumber' AS constraint_name,
         |  CAST(COUNT(*) - COUNT(DISTINCT (l_orderkey, l_linenumber)) AS BIGINT) AS n_violations
         |FROM lineitem""".stripMargin
    s"""WITH checks AS (
       |${branches.mkString("", "\nUNION ALL\n", "")}
       |)
       |SELECT constraint_name, n_violations, n_violations = 0 AS ok
       |FROM checks ORDER BY constraint_name""".stripMargin
  }

  /** Distribution-DRIFT detection between two corpus windows — the
    * monitoring gate a continuously-fed pipeline runs beside the static
    * constraint checks: has the event-type mix shifted since the reference
    * window? The log splits at the 50% LSN watermark (event_id is the
    * ingest sequence); per event type the CURRENT window's observed count
    * is held against the count EXPECTED under the reference window's mix,
    * and the chi-squared contribution (o−e)²/e decides the per-type flag
    * (3.84 = χ²₁ at 95%).
    *
    * Exactness discipline (§5): expected and contribution are each ONE
    * IEEE division of exact BIGINT products —
    *   e = (cur_total·ref_n) / ref_total,
    *   contribution = (o·ref_total − cur_total·ref_n)² / (ref_n·ref_total)
    * — no float accumulates across rows, so both doubles (and the flag
    * comparisons on them) hash-match DuckDB bit-for-bit. The integer
    * products bound: counts ≤ 2³¹ keep the squared numerator under 2⁶³;
    * beyond that the counts downscale by a common factor first (the
    * fraction is scale-invariant). Scale: two bounded groupBys (≤ #types
    * rows each) joined broadcast — one corpus scan, map-side split.
    */
  def dqDriftChi2(spark: SparkSession, dir: String): DataFrame = {
    val (ref, cur) = refCurCounts(spark, dir)
    chi2On(ref, cur)
  }

  /** The two windows' per-type count tables (50% LSN watermark split) —
    * also the fixture the streaming screen's parity spec replays.
    */
  private[graft] def refCurCounts(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    import spark.implicits._
    val ev = Tables.events(spark, dir).select($"event_id", $"event_type")
    val maxId = ev.agg(max($"event_id").as("max_id"))
    val tagged = ev.crossJoin(broadcast(maxId))
      .withColumn("is_ref", $"event_id" * 2 <= $"max_id")
    (tagged.filter($"is_ref").groupBy($"event_type").agg(count(lit(1)).as("ref_n")),
      tagged.filter(!$"is_ref").groupBy($"event_type").agg(count(lit(1)).as("cur_n")))
  }

  /** Scoring core over (event_type, ref_n) × (event_type, cur_n) count
    * tables — SHARED verbatim with the streaming screen
    * ([[graft.streaming.DriftStream]]), so a backfilled and a streamed
    * corpus can never disagree on a verdict.
    */
  private[graft] def chi2On(ref: DataFrame, cur: DataFrame): DataFrame = {
    import ref.sparkSession.implicits._
    val refTot = ref.agg(sum($"ref_n").as("ref_total"))
    val curTot = cur.agg(sum($"cur_n").as("cur_total"))
    ref.join(cur, Seq("event_type"), "full")
      .na.fill(0L, Seq("ref_n", "cur_n"))
      .crossJoin(broadcast(refTot)).crossJoin(broadcast(curTot))
      .withColumn("expected",
        ($"cur_total" * $"ref_n").cast("double") / $"ref_total".cast("double"))
      .withColumn("contribution",
        (($"cur_n" * $"ref_total" - $"cur_total" * $"ref_n")
          * ($"cur_n" * $"ref_total" - $"cur_total" * $"ref_n")).cast("double")
          / ($"ref_n" * $"ref_total").cast("double"))
      .withColumn("drifted", $"contribution" >= 3.84)
      .select($"event_type", $"ref_n", $"cur_n", $"expected", $"contribution", $"drifted")
      .orderBy($"event_type")
  }

  val dqDriftChi2Sql: String =
    """WITH m AS (
      |  SELECT MAX(event_id) AS max_id FROM events
      |), ref AS (
      |  SELECT event_type, COUNT(*) AS ref_n FROM events, m
      |  WHERE event_id * 2 <= max_id GROUP BY event_type
      |), cur AS (
      |  SELECT event_type, COUNT(*) AS cur_n FROM events, m
      |  WHERE event_id * 2 > max_id GROUP BY event_type
      |), rt AS (SELECT CAST(SUM(ref_n) AS BIGINT) AS ref_total FROM ref),
      |ct AS (SELECT CAST(SUM(cur_n) AS BIGINT) AS cur_total FROM cur)
      |SELECT COALESCE(ref.event_type, cur.event_type) AS event_type,
      |  CAST(COALESCE(ref_n, 0) AS BIGINT) AS ref_n,
      |  CAST(COALESCE(cur_n, 0) AS BIGINT) AS cur_n,
      |  CAST(cur_total * COALESCE(ref_n, 0) AS DOUBLE) / CAST(ref_total AS DOUBLE) AS expected,
      |  CAST((COALESCE(cur_n, 0) * ref_total - cur_total * COALESCE(ref_n, 0))
      |      * (COALESCE(cur_n, 0) * ref_total - cur_total * COALESCE(ref_n, 0)) AS DOUBLE)
      |    / CAST(COALESCE(ref_n, 0) * ref_total AS DOUBLE) AS contribution,
      |  CAST((COALESCE(cur_n, 0) * ref_total - cur_total * COALESCE(ref_n, 0))
      |      * (COALESCE(cur_n, 0) * ref_total - cur_total * COALESCE(ref_n, 0)) AS DOUBLE)
      |    / CAST(COALESCE(ref_n, 0) * ref_total AS DOUBLE) >= 3.84 AS drifted
      |FROM ref FULL OUTER JOIN cur USING (event_type)
      |CROSS JOIN rt CROSS JOIN ct
      |ORDER BY event_type""".stripMargin

  /** JOIN-KEY SKEW profile — the diagnostic that decides whether a join
    * needs salting (the skew_salted_join / skew_salted_topk remedies
    * assume someone measured the disease first): per candidate join key
    * of the fact table, the top-10 heaviest values with their exact
    * share of rows and their multiple of the fair share (share ×
    * distinct-key count — the number AQE's skew threshold and a salt
    * factor are chosen from). One groupBy per key column, totals as
    * broadcast 1-row crosses, TakeOrdered top-10 per key; every ratio
    * is ONE IEEE division of exact BIGINTs.
    */
  def dqKeySkew(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val li = graft.Tables.lineitem(spark, dir)
    val keys = Seq("l_suppkey", "l_partkey", "l_orderkey")
    val perKey = keys.map { k =>
      val counts = li.groupBy(col(k).as("key_value")).agg(count(lit(1)).as("cnt"))
      val tot = counts.agg(sum($"cnt").as("total"), count(lit(1)).as("n_keys"))
      counts.crossJoin(broadcast(tot))
        .orderBy($"cnt".desc, $"key_value")
        .limit(10)
        .withColumn("key_column", lit(k))
    }
    perKey.reduce(_.unionByName(_))
      .withColumn("share", $"cnt".cast("double") / $"total".cast("double"))
      .withColumn("x_fair", ($"cnt" * $"n_keys").cast("double") / $"total".cast("double"))
      .withColumn("rank", row_number().over(
        Window.partitionBy($"key_column").orderBy($"cnt".desc, $"key_value")))
      .select($"key_column", $"rank", $"key_value", $"cnt", $"total", $"n_keys",
        $"share", $"x_fair")
      .orderBy($"key_column", $"rank")
  }

  val dqKeySkewSql: String = {
    def one(k: String): String =
      s"""SELECT '$k' AS key_column, rank, key_value, cnt, total, n_keys,
         |  CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE) AS share,
         |  CAST(cnt * n_keys AS DOUBLE) / CAST(total AS DOUBLE) AS x_fair
         |FROM (
         |  SELECT key_value, cnt, total, n_keys,
         |    row_number() OVER (ORDER BY cnt DESC, key_value) AS rank
         |  FROM (
         |    SELECT $k AS key_value, CAST(COUNT(*) AS BIGINT) AS cnt FROM lineitem GROUP BY 1
         |  ) CROSS JOIN (
         |    SELECT CAST(COUNT(*) AS BIGINT) AS total,
         |      CAST(COUNT(DISTINCT $k) AS BIGINT) AS n_keys FROM lineitem
         |  )
         |) WHERE rank <= 10""".stripMargin
    Seq("l_suppkey", "l_partkey", "l_orderkey").map(one)
      .mkString("", "\nUNION ALL\n", "\nORDER BY key_column, rank")
  }

  /** FRESHNESS / staleness screen per event type — the SLA check a
    * continuously-fed pipeline runs beside drift (drift asks "did the
    * mix change?"; freshness asks "did a feed silently STOP?"): each
    * type's arrival cadence (median day-gap between active days, exact
    * rank selection — interpolating quantile functions would never
    * hash-match) is compared with how far the type lags the corpus
    * frontier; a type is stale when its silence exceeds 3× its own
    * typical cadence — a per-type adaptive threshold, so a weekly feed
    * isn't paged daily and a secondly feed isn't given a week. No wall
    * clock anywhere: "now" is the corpus max day (the delta_load
    * watermark device), so the entry is deterministic and oracle-able.
    * One distinct (type, day) aggregate (≤ types×days rows) feeds a
    * per-type gap window — bounded by calendar, never corpus size.
    *
    * The median join is a LEFT join (round-10 fix): a type with a single
    * active day has NO gap rows, and an inner join would silently drop
    * it from the report — exactly the "feed appeared once then went
    * dark" case a staleness screen exists to catch. Such a type is
    * emitted with `median_gap_days` NULL and judged against the default
    * daily cadence (stale when more than 3 days behind the frontier).
    */
  def dqFreshness(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    freshnessOn(Tables.events(spark, dir)
      .select($"event_type", to_date($"ts").as("day")).distinct())
  }

  /** Core over any distinct (event_type, day) frame (injectable for the
    * planted single-active-day spec).
    */
  private[graft] def freshnessOn(daily: DataFrame): DataFrame = {
    val spark = daily.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val mx = daily.agg(max($"day").as("frontier"))
    val wg = Window.partitionBy($"event_type").orderBy($"day")
    val gaps = daily
      .withColumn("gap", datediff($"day", lag($"day", 1).over(wg)))
      .filter($"gap".isNotNull)
    val wr = Window.partitionBy($"event_type").orderBy($"gap", $"day")
    val med = gaps
      .withColumn("rn", row_number().over(wr))
      .withColumn("n", count(lit(1)).over(Window.partitionBy($"event_type")))
      .filter($"rn" === ceil($"n" * 0.5).cast("int"))
      .select($"event_type", $"gap".cast("long").as("median_gap_days"))
    val last = daily.groupBy($"event_type")
      .agg(max($"day").as("last_day"), count(lit(1)).as("n_active_days"))
    last.join(med, Seq("event_type"), "left")
      .crossJoin(broadcast(mx))
      .select($"event_type",
        date_format($"last_day", "yyyy-MM-dd").as("last_day"),
        $"n_active_days",
        $"median_gap_days",
        datediff($"frontier", $"last_day").cast("long").as("days_behind"))
      .withColumn("stale", $"days_behind" > coalesce($"median_gap_days", lit(1L)) * 3)
      .orderBy($"event_type")
  }

  val dqFreshnessSql: String =
    """WITH daily AS (
      |  SELECT DISTINCT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
      |  FROM events
      |), mx AS (
      |  SELECT MAX(day) AS frontier FROM daily
      |), gaps AS (
      |  SELECT event_type, day,
      |    date_diff('day', lag(day) OVER (PARTITION BY event_type ORDER BY day), day) AS gap
      |  FROM daily
      |), g AS (
      |  SELECT event_type, gap, day,
      |    row_number() OVER (PARTITION BY event_type ORDER BY gap, day) AS rn,
      |    COUNT(*) OVER (PARTITION BY event_type) AS n
      |  FROM gaps WHERE gap IS NOT NULL
      |), med AS (
      |  SELECT event_type, CAST(gap AS BIGINT) AS median_gap_days
      |  FROM g WHERE rn = CAST(ceil(n * 0.5) AS INTEGER)
      |), last AS (
      |  SELECT event_type, MAX(day) AS last_day,
      |    CAST(COUNT(*) AS BIGINT) AS n_active_days
      |  FROM daily GROUP BY event_type
      |)
      |SELECT l.event_type, strftime(l.last_day, '%Y-%m-%d') AS last_day,
      |  l.n_active_days, m.median_gap_days,
      |  CAST(date_diff('day', l.last_day, frontier) AS BIGINT) AS days_behind,
      |  CAST(date_diff('day', l.last_day, frontier) AS BIGINT)
      |    > COALESCE(m.median_gap_days, 1) * 3 AS stale
      |FROM last l LEFT JOIN med m USING (event_type) CROSS JOIN mx
      |ORDER BY l.event_type""".stripMargin

  /** Benford first-significant-digit literals, log10(1 + 1/d) for
    * d = 1..9, fixed to 15 significant digits. Shared as LITERALS with
    * the oracle SQL (both engines parse the identical decimal literal to
    * the identical double) — computing log10 at runtime would tie the
    * gate to two libms agreeing on a transcendental.
    */
  private[graft] val benfordP: Seq[(Int, Double)] = Seq(
    1 -> 0.301029995663981, 2 -> 0.176091259055681, 3 -> 0.124938736608300,
    4 -> 0.096910013008056, 5 -> 0.079181246047625, 6 -> 0.066946789630613,
    7 -> 0.057991946977687, 8 -> 0.051152522447381, 9 -> 0.045757490560675)

  /** §2 `dq_benford`: Benford's-law first-digit screen over order totals
    * — the classic fabricated-data / unit-mixup tripwire for a
    * continuously-loaded fact table (a feed that switches currency units
    * or starts emitting synthetic fill shifts this histogram long before
    * range checks fire).
    *
    * Digit extraction is engine-agnostic INTEGER string formatting:
    * `substr(CAST(cents AS STRING), 1, 1)` of the exact cents BIGINT
    * (decimal→string of a whole number formats identically in Spark and
    * DuckDB; double→string would not). Expected shares are the
    * [[benfordP]] literals; `expected_n` and the χ² contribution are a
    * fixed IEEE tree over (exact count, literal) — deterministic across
    * engines, the Neyman-sigma discipline. One scan, 9-row output via
    * the broadcast digit dim (digits with zero observations survive the
    * left join): map-side combine collapses the scan to ≤9 partial rows
    * per partition, so the shuffle is O(partitions), corpus-size-free.
    */
  def dqBenford(spark: SparkSession, dir: String): DataFrame =
    benfordOn(orderDigitCountsOf(Tables.orders(spark, dir)))

  /** First-digit counts of a slice of the orders feed — counts are
    * mergeable by addition, which is what lets the streaming screen
    * ([[graft.streaming.DriftStream.benfordFold]]) fold per-batch counts
    * into cumulative state and serve through [[benfordOn]] bit-equal to
    * the batch entry.
    */
  private[graft] def orderDigitCountsOf(orders: DataFrame): DataFrame = {
    import orders.sparkSession.implicits._
    orders
      .select(($"o_totalprice".cast("decimal(12,2)") * 100).cast("long").as("cents"))
      .filter($"cents" > 0)
      .withColumn("digit", substring($"cents".cast("string"), 1, 1).cast("int"))
      .groupBy($"digit").agg(count(lit(1)).as("n_obs"))
  }

  /** Scoring core over a (digit, n_obs) count table — SHARED by the
    * batch entry and the streaming serve, so a streamed and a backfilled
    * feed can never disagree on the screen's verdicts.
    */
  private[graft] def benfordOn(obs: DataFrame): DataFrame = {
    import obs.sparkSession.implicits._
    val digits = benfordP.toDF("digit", "benford_p")
    val tot = obs.agg(sum($"n_obs").as("n_total"))
    // hint the BUILDABLE side: digits is the PRESERVED side of the left
    // join, which Spark refuses to broadcast-build (HintErrorLogger would
    // warn and ignore a hint there); obs is ≤ 9 rows post-agg
    digits.join(broadcast(obs), Seq("digit"), "left")
      .na.fill(0L, Seq("n_obs"))
      .crossJoin(broadcast(tot))
      .withColumn("expected_n", $"n_total".cast("double") * $"benford_p")
      .withColumn("contribution",
        ($"n_obs".cast("double") - $"expected_n") *
          ($"n_obs".cast("double") - $"expected_n") / $"expected_n")
      .select($"digit", $"n_obs", $"benford_p", $"expected_n", $"contribution")
      .orderBy($"digit")
  }

  val dqBenfordSql: String = {
    val dim = benfordP.map { case (d, p) => s"($d, $p)" }.mkString(", ")
    s"""WITH dim(digit, benford_p) AS (VALUES $dim),
      |obs AS (
      |  SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS INTEGER) AS digit,
      |    COUNT(*) AS n_obs
      |  FROM (
      |    SELECT CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
      |    FROM orders
      |  ) WHERE cents > 0
      |  GROUP BY 1
      |), tot AS (SELECT CAST(SUM(n_obs) AS BIGINT) AS n_total FROM obs)
      |SELECT dim.digit, CAST(COALESCE(n_obs, 0) AS BIGINT) AS n_obs, benford_p,
      |  CAST(n_total AS DOUBLE) * benford_p AS expected_n,
      |  (CAST(COALESCE(n_obs, 0) AS DOUBLE) - CAST(n_total AS DOUBLE) * benford_p)
      |    * (CAST(COALESCE(n_obs, 0) AS DOUBLE) - CAST(n_total AS DOUBLE) * benford_p)
      |    / (CAST(n_total AS DOUBLE) * benford_p) AS contribution
      |FROM dim LEFT JOIN obs ON dim.digit = obs.digit CROSS JOIN tot
      |ORDER BY dim.digit""".stripMargin
  }

  /** §2 `dq_duplicate_payments`: duplicate-charge screen — order pairs
    * from the SAME customer for the EXACT same amount within a 7-day
    * window (the classic double-submit / retry-double-charge audit every
    * payment ledger runs; exact-amount equality plus time proximity is
    * the standard first-pass signature). Pair generation is an
    * equi-join on (customer, amount-cents) — never amount-range — so
    * the shuffle key is maximally selective and fan-out is bounded by
    * per-(customer, amount) multiplicity; the day-window predicate and
    * canonical a<b ordering are post-join filters. Output one row per
    * suspect pair with both order keys, the shared cents, and the gap
    * in days — exact integers end-to-end.
    */
  def dqDuplicatePayments(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, dir)
      .select($"o_orderkey", $"o_custkey",
        ($"o_totalprice".cast("decimal(12,2)") * 100).cast("long").as("cents"),
        datediff(to_date($"o_orderdate"), lit("1992-01-01").cast("date")).cast("long").as("day_num"))
    duplicatePaymentsOn(o)
  }

  /** Detector core over any (o_orderkey, o_custkey, cents, day_num)
    * frame — spec-proven on planted double-charges (the clean synthetic
    * ledger legitimately yields an EMPTY report: ~1 order per customer
    * per 8 months at 2-decimal amounts makes an exact-amount 7-day
    * coincidence vanishingly unlikely, and the gate hash-checks the
    * empty answer like dedup_exact's).
    */
  private[graft] def duplicatePaymentsOn(o: DataFrame): DataFrame = {
    import o.sparkSession.implicits._
    val a = o.select($"o_custkey", $"cents", $"o_orderkey".as("key_a"), $"day_num".as("day_a"))
    val b = o.select($"o_custkey", $"cents", $"o_orderkey".as("key_b"), $"day_num".as("day_b"))
    a.join(b, Seq("o_custkey", "cents"))
      .filter($"key_a" < $"key_b" && abs($"day_a" - $"day_b") <= 7)
      .select($"o_custkey".as("cust_id"), $"key_a", $"key_b", $"cents",
        abs($"day_a" - $"day_b").as("gap_days"))
      .orderBy($"cust_id", $"key_a", $"key_b")
  }

  val dqDuplicatePaymentsSql: String =
    """WITH o AS (
      |  SELECT o_orderkey, o_custkey,
      |    CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
      |    CAST(date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS day_num
      |  FROM orders
      |)
      |SELECT a.o_custkey AS cust_id, a.o_orderkey AS key_a, b.o_orderkey AS key_b,
      |  a.cents, abs(a.day_num - b.day_num) AS gap_days
      |FROM o a JOIN o b
      |  ON a.o_custkey = b.o_custkey AND a.cents = b.cents
      | AND a.o_orderkey < b.o_orderkey
      | AND abs(a.day_num - b.day_num) <= 7
      |ORDER BY cust_id, key_a, key_b""".stripMargin

  /** §2 `dq_velocity_screen`: purchase-VELOCITY screen — each user's
    * peak trailing-24 h purchase count and when it peaked, flagged at
    * ≥ 3 (the rate-limit audit beside the duplicate-payment screen:
    * that one catches the same charge twice, this catches too many
    * charges too fast — card-testing / runaway-retry signatures that
    * are all DIFFERENT amounts). One user-partitioned RANGE window over
    * purchases only (the window_time_range device — per-user fan-in
    * bounded by purchase rate × 24 h), then the per-user peak via a
    * rank window on the same partitioning (earliest window wins ties,
    * deterministic); exact integers end-to-end, one boolean flag.
    */
  def dqVelocityScreen(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val p = Tables.events(spark, dir)
      .filter($"event_type" === "purchase")
      .select($"user_id", $"event_id", unix_timestamp($"ts").as("t"))
    val wRange = Window.partitionBy($"user_id").orderBy($"t").rangeBetween(-86399, 0)
    val counted = p.withColumn("n_24h", count(lit(1)).over(wRange))
    val wPick = Window.partitionBy($"user_id")
      .orderBy($"n_24h".desc, $"t", $"event_id")
    counted.withColumn("rn", row_number().over(wPick))
      .filter($"rn" === 1)
      .select($"user_id", $"n_24h".as("peak_24h"), $"t".as("peak_at_sec"),
        ($"n_24h" >= 3).as("flagged"))
      .orderBy($"user_id")
  }

  val dqVelocityScreenSql: String =
    """WITH p AS (
      |  SELECT user_id, event_id,
      |    CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS t
      |  FROM events WHERE event_type = 'purchase'
      |), counted AS (
      |  SELECT user_id, event_id, t,
      |    COUNT(*) OVER (PARTITION BY user_id ORDER BY t
      |      RANGE BETWEEN 86399 PRECEDING AND CURRENT ROW) AS n_24h
      |  FROM p
      |), picked AS (
      |  SELECT *, row_number() OVER (PARTITION BY user_id
      |    ORDER BY n_24h DESC, t, event_id) AS rn
      |  FROM counted
      |)
      |SELECT user_id, CAST(n_24h AS BIGINT) AS peak_24h, t AS peak_at_sec,
      |  n_24h >= 3 AS flagged
      |FROM picked WHERE rn = 1
      |ORDER BY user_id""".stripMargin

  /** §2 `dq_bot_regularity`: inter-event-time REGULARITY screen — per
    * user, the coefficient of variation of consecutive event gaps,
    * flagged when suspiciously LOW (humans are bursty — a Poisson-ish
    * arrival process has cv ≈ 1; schedulers and replay bots tick, so
    * cv « 1 is the automation signature the velocity screen can't see:
    * a slow, perfectly regular scraper never trips a rate limit).
    * Gaps are exact integer seconds from one user-partitioned lag
    * window; n, Σg, Σg² are exact BIGINT sufficient statistics (the
    * Welch discipline), and mean / variance / cv are one fixed IEEE
    * tree mirrored token-for-token in the oracle — the doubles
    * hash-match. Users with < 5 gaps are reported unflagged-by-rule
    * (insufficient evidence ≠ innocent, the flag column says which).
    */
  def dqBotRegularity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"user_id").orderBy($"t", $"event_id")
    val gaps = Tables.events(spark, dir)
      .select($"user_id", $"event_id", unix_timestamp($"ts").as("t"))
      .withColumn("gap", $"t" - lag($"t", 1).over(w))
      .filter($"gap".isNotNull)
    val nD = $"n_gaps".cast("double")
    val sD = $"s".cast("double")
    val qD = $"q".cast("double")
    gaps.groupBy($"user_id")
      .agg(count(lit(1)).as("n_gaps"), sum($"gap").as("s"),
        sum($"gap" * $"gap").as("q"))
      .withColumn("mean_gap", sD / nD)
      .withColumn("cv_gap",
        sqrt((nD * qD - sD * sD) / (nD * (nD - 1.0))) / ($"mean_gap"))
      .withColumn("flagged", $"n_gaps" >= 5 && $"cv_gap" < 0.85)
      .select($"user_id", $"n_gaps", $"mean_gap", $"cv_gap", $"flagged")
      .orderBy($"user_id")
  }

  val dqBotRegularitySql: String =
    """WITH g AS (
      |  SELECT user_id,
      |    t - lag(t) OVER (PARTITION BY user_id ORDER BY t, event_id) AS gap
      |  FROM (SELECT user_id, event_id,
      |          CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS t
      |        FROM events)
      |), stats AS (
      |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_gaps,
      |    CAST(SUM(gap) AS BIGINT) AS s, CAST(SUM(gap * gap) AS BIGINT) AS q
      |  FROM g WHERE gap IS NOT NULL GROUP BY user_id
      |), d AS (
      |  SELECT user_id, n_gaps,
      |    CAST(n_gaps AS DOUBLE) AS nd, CAST(s AS DOUBLE) AS sd, CAST(q AS DOUBLE) AS qd
      |  FROM stats
      |), m AS (
      |  SELECT user_id, n_gaps, sd / nd AS mean_gap,
      |    sqrt((nd * qd - sd * sd) / (nd * (nd - 1.0))) / (sd / nd) AS cv_gap
      |  FROM d
      |)
      |SELECT user_id, n_gaps, mean_gap, cv_gap,
      |  n_gaps >= 5 AND cv_gap < 0.85 AS flagged
      |FROM m
      |ORDER BY user_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dq_bot_regularity" -> (dqBotRegularity _),
    "dq_velocity_screen" -> (dqVelocityScreen _),
    "dq_duplicate_payments" -> (dqDuplicatePayments _),
    "dq_freshness"   -> (dqFreshness _),
    "dq_profile"     -> (dqProfile _),
    "dq_constraints" -> (dqConstraints _),
    "dq_drift_chi2"  -> (dqDriftChi2 _),
    "dq_key_skew"    -> (dqKeySkew _),
    "dq_benford"     -> (dqBenford _)
  )

  val oracleSql: Map[String, String] = Map(
    "dq_bot_regularity" -> dqBotRegularitySql,
    "dq_velocity_screen" -> dqVelocityScreenSql,
    "dq_duplicate_payments" -> dqDuplicatePaymentsSql,
    "dq_freshness"   -> dqFreshnessSql,
    "dq_profile"     -> dqProfileSql,
    "dq_constraints" -> dqConstraintsSql,
    "dq_drift_chi2"  -> dqDriftChi2Sql,
    "dq_key_skew"    -> dqKeySkewSql,
    "dq_benford"     -> dqBenfordSql
  )
}
