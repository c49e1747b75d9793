package graft.core

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.Tables

/** Set operations, pivot, sketches, and a typed custom Aggregator. */
object MiscQueries {

  /** INTERSECT / EXCEPT / UNION over key sets (the reference's staged-vs-
    * core reconciliation, as set algebra): one labeled row stream.
    */
  def setOpsSuite(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val active  = Tables.events(spark, dir)
      .filter($"event_type" === "purchase").select($"user_id").distinct()
    val core    = Tables.supplier(spark, dir).select($"s_suppkey".as("user_id"))
    val both    = active.intersect(core).withColumn("relation", lit("purchaser_in_core"))
    val onlyNew = active.except(core).withColumn("relation", lit("purchaser_only"))
    val onlyDim = core.except(active).withColumn("relation", lit("core_only"))
    both.unionAll(onlyNew).unionAll(onlyDim)
      .orderBy($"relation", $"user_id")
  }

  val setOpsSuiteSql: String =
    """WITH active AS (
      |  SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
      |), core AS (
      |  SELECT s_suppkey AS user_id FROM supplier
      |)
      |SELECT * FROM (
      |  SELECT user_id, 'purchaser_in_core' AS relation FROM (SELECT user_id FROM active INTERSECT SELECT user_id FROM core)
      |  UNION ALL
      |  SELECT user_id, 'purchaser_only' AS relation FROM (SELECT user_id FROM active EXCEPT SELECT user_id FROM core)
      |  UNION ALL
      |  SELECT user_id, 'core_only' AS relation FROM (SELECT user_id FROM core EXCEPT SELECT user_id FROM active)
      |)
      |ORDER BY relation, user_id""".stripMargin

  /** Event-type pivot per user bucket (wide dashboard matrix): explicit
    * pivot values keep the output schema static — the scalable form (a
    * dynamic pivot would need a driver-side distinct pass).
    */
  def pivotEventTypes(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .select(($"user_id" % 10).as("user_bucket"), $"event_type")
      .groupBy($"user_bucket")
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy($"user_bucket")
  }

  val pivotEventTypesSql: String =
    """SELECT user_id % 10 AS user_bucket,
      |  COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
      |  COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error,
      |  COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
      |  COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
      |  COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view
      |FROM events
      |GROUP BY 1
      |ORDER BY user_bucket""".stripMargin

  /** Typed custom Aggregator (the Aggregator[IN, BUF, OUT] extension path):
    * decimal-exact weighted mean — sums are associative longs (cents ×
    * quantity), so the result is identical under any partitioning and
    * oracle-checkable.
    */
  object WeightedMeanAgg extends Aggregator[(Long, Long), (Long, Long), Double] {
    override def zero: (Long, Long) = (0L, 0L)
    override def reduce(b: (Long, Long), a: (Long, Long)): (Long, Long) =
      (b._1 + a._1 * a._2, b._2 + a._2)
    override def merge(x: (Long, Long), y: (Long, Long)): (Long, Long) =
      (x._1 + y._1, x._2 + y._2)
    override def finish(r: (Long, Long)): Double =
      if (r._2 == 0) 0.0 else r._1.toDouble / r._2.toDouble
    override def bufferEncoder: Encoder[(Long, Long)] = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Quantity-weighted mean price (in cents) per return flag, via the
    * registered typed Aggregator.
    */
  def aggWeightedMean(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val wm = udaf(WeightedMeanAgg)
    Tables.lineitem(spark, dir)
      .select($"l_returnflag",
        // cents: exact long arithmetic end-to-end
        floor($"l_extendedprice" * 100.0 + 0.5).cast("long").as("price_cents"),
        $"l_quantity".cast("long").as("qty"))
      .groupBy($"l_returnflag")
      .agg(wm($"price_cents", $"qty").as("weighted_mean_cents"),
        sum($"qty").as("total_qty"))
      .orderBy($"l_returnflag")
  }

  val aggWeightedMeanSql: String =
    """SELECT l_returnflag,
      |  CAST(SUM(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) * CAST(l_quantity AS BIGINT)) AS DOUBLE)
      |    / CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS weighted_mean_cents,
      |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** Distinct-count sketches (HLL++): the approximate path next to the
    * exact distinct counts — rows-only (approximation is engine-specific
    * by design); accuracy pinned by SketchSpec instead.
    */
  def sketchDistinct(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .groupBy($"event_type")
      .agg(
        countDistinct($"user_id").as("exact_users"),
        approx_count_distinct($"user_id", 0.02).as("approx_users"),
        count(lit(1)).as("n_events"))
      .orderBy($"event_type")
  }

  /** Quantile sketches (KLL-style percentile_approx) beside the exact
    * sort-based percentile — rows-only (sketch internals are
    * engine-specific); SketchSpec pins the approximation error. The sketch
    * is the 100 TB path: mergeable, bounded-memory partial aggregation,
    * while exact percentile buffers each group's values.
    */
  def sketchPercentile(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .groupBy($"event_type")
      .agg(
        expr("percentile(value, 0.5)").as("exact_p50"),
        percentile_approx($"value", lit(0.5), lit(10000)).as("approx_p50"),
        expr("percentile(value, 0.95)").as("exact_p95"),
        percentile_approx($"value", lit(0.95), lit(10000)).as("approx_p95"),
        count(lit(1)).as("n_events"))
      .orderBy($"event_type")
  }

  /** Count-min-sketch heavy hitters: the CMS is built as ONE distributed,
    * mergeable aggregation over every token occurrence (bounded d×w counter
    * array per partial — the 100 TB path for frequency estimation: the
    * sketch never grows with cardinality, unlike the exact groupBy whose
    * state is O(distinct tokens)). The exact top-k (orderBy+limit →
    * TakeOrderedAndProject) rides beside it as ground truth; the k
    * surviving tokens are estimated locally against the collected sketch —
    * a bounded k-row driver read, same footing as the k-means state read.
    * Rows-only by design (sketch internals are engine-specific); the CMS
    * one-sided error bound (exact ≤ est ≤ exact + ε·N) is pinned by
    * SketchSpec.
    */
  def sketchHeavyHitters(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val eps = 0.0001
    val toks = Tables.documents(spark, dir)
      .select(explode(split(lower(trim($"text")), " +")).as("token"))
    val skBytes = toks
      .agg(count_min_sketch($"token", lit(eps), lit(0.99), lit(42)).as("sk"))
      .head().getAs[Array[Byte]]("sk")
    val sketch = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(skBytes))
    val top = toks.groupBy($"token").agg(count(lit(1)).as("exact_n"))
      .orderBy($"exact_n".desc, $"token").limit(20)
      .collect() // bounded: k = 20 rows
    val est = top.map(r =>
      (r.getString(0), r.getLong(1), sketch.estimateCount(r.getString(0))))
    spark.createDataFrame(est.toSeq).toDF("token", "exact_n", "est_n")
      .orderBy($"exact_n".desc, $"token")
  }

  /** Sketch set-algebra: distinct-user INTERSECTION per event-type pair by
    * inclusion–exclusion over mergeable DataSketches HLL sketches —
    * |A∩B| ≈ est(A) + est(B) − est(A∪B), with the union estimated from
    * `hll_union` of the two types' sketches, never from re-scanning rows.
    *
    * This is the sketch family's missing set operation: [[sketchDistinct]]
    * answers "how many distinct users per type"; this answers "how many do
    * BOTH X and Y" — the audience-overlap question — without the
    * self-join-on-user the exact form needs.
    *
    * Scale shape: ONE corpus scan building T partial-merged sketches
    * (shuffle = T × 16 KiB sketch blobs at lgK=14, regardless of row
    * count); the T² pairing is a broadcast cross of T rows. The exact_*
    * columns are the verification twin (the distinct self-join they need
    * is the cost the sketch path avoids) — at 100 TB they'd be dropped and
    * SketchSpec's error pin is the contract: ±3σ HLL error compounds
    * through inclusion–exclusion to ~2.4% of the UNION size at lgK=14.
    */
  def sketchDistinctIntersect(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val perType = Tables.events(spark, dir)
      .groupBy($"event_type")
      .agg(hll_sketch_agg($"user_id", lit(14)).as("sk"),
        countDistinct($"user_id").as("exact_n"))
    val a = perType.select($"event_type".as("type_a"), $"sk".as("sk_a"), $"exact_n".as("exact_a"))
    val b = perType.select($"event_type".as("type_b"), $"sk".as("sk_b"), $"exact_n".as("exact_b"))
    val est = a.crossJoin(broadcast(b)).filter($"type_a" < $"type_b")
      .withColumn("approx_a", hll_sketch_estimate($"sk_a"))
      .withColumn("approx_b", hll_sketch_estimate($"sk_b"))
      .withColumn("approx_union", hll_sketch_estimate(hll_union($"sk_a", $"sk_b")))
      .withColumn("approx_both",
        greatest($"approx_a" + $"approx_b" - $"approx_union", lit(0L)))
    val tu = Tables.events(spark, dir).select($"event_type", $"user_id").distinct()
    val exactBoth = tu.as("x").join(tu.as("y"), Seq("user_id"))
      .filter($"x.event_type" < $"y.event_type")
      .groupBy($"x.event_type".as("type_a"), $"y.event_type".as("type_b"))
      .agg(countDistinct($"user_id").as("exact_both"))
    est.join(exactBoth, Seq("type_a", "type_b"), "left")
      .na.fill(0L, Seq("exact_both"))
      .select($"type_a", $"type_b", $"exact_a", $"exact_b", $"exact_both",
        $"approx_a", $"approx_b", $"approx_both")
      .orderBy($"type_a", $"type_b")
  }

  /** Sketch set-DIFFERENCE — the third set-algebra operation beside the
    * intersection entry: per ordered type pair, the identities active in
    * A but not B, |A\B| = |A∪B| − |B| by inclusion–exclusion over the
    * SAME mergeable HLL sketches (one union, no compounded intersection
    * error). The identity is the USER-DAY (user active with that type
    * that day) — "days with views but no purchase", the funnel-diagnosis
    * subtraction; plain user-grain audiences are fully nested on this
    * corpus (every user touches every type — a vacuous difference), and
    * the user-day grain is also the cardinality that actually explodes
    * at 100 TB, which is what the sketch path exists for. Answered from
    * T 16 KiB sketch blobs instead of a corpus self-join; exact twin
    * columns ride along and SketchSpec pins the error bound.
    */
  def sketchDistinctDiff(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val userDay = ($"user_id" * 100000L +
      datediff(to_date($"ts"), lit("1970-01-01").cast("date"))).as("uday")
    val perType = Tables.events(spark, dir)
      .select($"event_type", userDay)
      .groupBy($"event_type")
      .agg(hll_sketch_agg($"uday", lit(14)).as("sk"),
        countDistinct($"uday").as("exact_n"))
    val a = perType.select($"event_type".as("type_a"), $"sk".as("sk_a"), $"exact_n".as("exact_a"))
    val b = perType.select($"event_type".as("type_b"), $"sk".as("sk_b"), $"exact_n".as("exact_b"))
    val est = a.crossJoin(broadcast(b)).filter($"type_a" =!= $"type_b")
      .withColumn("approx_b", hll_sketch_estimate($"sk_b"))
      .withColumn("approx_union", hll_sketch_estimate(hll_union($"sk_a", $"sk_b")))
      .withColumn("approx_only_a", greatest($"approx_union" - $"approx_b", lit(0L)))
    // exact |A\B| per ordered pair: A's user-days anti-joined against
    // B's over the collapsed (type, uday) table — the corpus-sized twin
    // the sketch path replaces at 100 TB
    val tu = Tables.events(spark, dir)
      .select($"event_type",
        ($"user_id" * 100000L +
          datediff(to_date($"ts"), lit("1970-01-01").cast("date"))).as("uday"))
      .distinct()
    val pairs = a.select($"type_a").crossJoin(broadcast(b.select($"type_b")))
      .filter($"type_a" =!= $"type_b")
    val exactDiff = pairs
      .join(tu.select($"event_type".as("type_a"), $"uday"), Seq("type_a"))
      .join(tu.select($"event_type".as("type_b"), $"uday"),
        Seq("type_b", "uday"), "left_anti")
      .groupBy($"type_a", $"type_b").agg(count(lit(1)).as("exact_only_a"))
    est.select($"type_a", $"type_b", $"exact_a", $"exact_b", $"approx_only_a")
      .join(exactDiff, Seq("type_a", "type_b"), "left")
      .na.fill(0L, Seq("exact_only_a"))
      .select($"type_a", $"type_b", $"exact_a", $"exact_b",
        $"exact_only_a", $"approx_only_a")
      .orderBy($"type_a", $"type_b")
  }

  /** Exact per-group MODE (most frequent value) — the aggregate DuckDB
    * ships natively and Spark lacks: each user's dominant event type.
    * Two partial-agg stages, no per-row window: (user, type) counts, then
    * `max(struct(cnt, type))` per user — both map-side-combining groupBys,
    * so the exchange carries one row per (group, partition) twice and the
    * plan survives any corpus size. Tie-break: the LARGEST type
    * lexicographically (what the struct max yields — deterministic, and
    * mirrored in the oracle's ORDER BY cnt DESC, type DESC rank).
    */
  def aggModeExact(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .groupBy($"user_id", $"event_type").agg(count(lit(1)).as("cnt"))
      .groupBy($"user_id")
      .agg(max(struct($"cnt", $"event_type")).as("_m"),
        sum($"cnt").as("n_events"))
      .select($"user_id", $"_m.event_type".as("mode_event_type"),
        $"_m.cnt".as("mode_count"), $"n_events")
      .orderBy($"user_id")
  }

  val aggModeExactSql: String =
    """WITH c AS (
      |  SELECT user_id, event_type, COUNT(*) AS cnt
      |  FROM events GROUP BY user_id, event_type
      |), r AS (
      |  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY cnt DESC, event_type DESC) AS rn,
      |    CAST(SUM(cnt) OVER (PARTITION BY user_id) AS BIGINT) AS n_events
      |  FROM c
      |)
      |SELECT user_id, event_type AS mode_event_type, CAST(cnt AS BIGINT) AS mode_count, n_events
      |FROM r WHERE rn = 1
      |ORDER BY user_id""".stripMargin

  /** Manually SALTED skewed join, result-identical to the plain join —
    * the hot-key treatment for a fact⋈dim join where one dim key owns a
    * disproportionate share of fact rows (AQE's skew-join splits
    * post-shuffle partitions; salting splits the KEY itself, the form
    * that also works mid-pipeline and under bucketing): the fact side
    * salts each row into one of 8 sub-keys by a hash of its row id, the
    * dim side replicates ×8 (dims are the small side by definition), and
    * the equi-join runs on (key, salt) — a hot customer's rows now spread
    * over 8 reducer partitions. The aggregate AFTER the join re-merges
    * the salt split; the oracle is the UNSALTED join+agg, so
    * result-identity is hash-checked, the skew_salted_topk discipline on
    * the join axis.
    */
  def skewSaltedJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val salts = 8
    val fact = Tables.orders(spark, dir)
      .select($"o_custkey", $"o_totalprice",
        pmod(xxhash64($"o_orderkey"), lit(salts.toLong)).as("_salt"))
    val dim = Tables.customer(spark, dir)
      .select($"c_custkey", $"c_nationkey")
      .withColumn("_salt", explode(array((0 until salts).map(s => lit(s.toLong)): _*)))
    fact.join(dim, fact("o_custkey") === dim("c_custkey") && fact("_salt") === dim("_salt"))
      .groupBy($"c_nationkey")
      .agg(count(lit(1)).as("n_orders"),
        sum($"o_totalprice".cast("decimal(18,2)")).cast("double").as("revenue"))
      .orderBy($"c_nationkey")
  }

  val skewSaltedJoinSql: String =
    """SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_nationkey
      |ORDER BY c_nationkey""".stripMargin

  /** Wrapped-style per-user annual summary — the composite dashboard row
    * the reference's yearly views feed (dm_ddl.sql yearly_agg +
    * top-functions, composed per user): lifetime totals, dominant event
    * type (the mode machinery), active-day count, and event span. One
    * pass builds the (user, type) counts; everything else is partial-agg
    * rollups of it or of the (user, day) collapse — no per-event window.
    */
  def dmWrappedSummary(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
    val byType = ev.groupBy($"user_id", $"event_type").agg(
      count(lit(1)).as("cnt"),
      sum($"value".cast("decimal(18,2)")).as("val"))
    val core = byType.groupBy($"user_id").agg(
      max(struct($"cnt", $"event_type")).as("_m"),
      sum($"cnt").as("n_events"),
      sum($"val").cast("double").as("total_value"))
    val days = ev.select($"user_id", to_date($"ts").as("d")).distinct()
      .groupBy($"user_id").agg(count(lit(1)).as("n_active_days"),
        min($"d").cast("timestamp").as("first_day"),
        max($"d").cast("timestamp").as("last_day"))
    core.join(days, Seq("user_id"))
      .select($"user_id", $"n_events", $"total_value",
        $"_m.event_type".as("top_event_type"), $"_m.cnt".as("top_event_count"),
        $"n_active_days", $"first_day", $"last_day",
        datediff($"last_day", $"first_day").cast("long").as("span_days"))
      .orderBy($"user_id")
  }

  val dmWrappedSummarySql: String =
    """WITH bt AS (
      |  SELECT user_id, event_type, COUNT(*) AS cnt,
      |    SUM(CAST(value AS DECIMAL(18,2))) AS val
      |  FROM events GROUP BY user_id, event_type
      |), r AS (
      |  SELECT user_id, event_type, cnt,
      |    row_number() OVER (PARTITION BY user_id ORDER BY cnt DESC, event_type DESC) AS rn
      |  FROM bt
      |), core AS (
      |  SELECT user_id, CAST(SUM(cnt) AS BIGINT) AS n_events,
      |    CAST(SUM(val) AS DOUBLE) AS total_value
      |  FROM bt GROUP BY user_id
      |), days AS (
      |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_active_days,
      |    CAST(MIN(d) AS TIMESTAMP) AS first_day, CAST(MAX(d) AS TIMESTAMP) AS last_day
      |  FROM (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events)
      |  GROUP BY user_id
      |)
      |SELECT c.user_id, c.n_events, c.total_value,
      |  r.event_type AS top_event_type, CAST(r.cnt AS BIGINT) AS top_event_count,
      |  d.n_active_days, d.first_day, d.last_day,
      |  CAST(date_diff('day', CAST(d.first_day AS DATE), CAST(d.last_day AS DATE)) AS BIGINT) AS span_days
      |FROM core c
      |JOIN r ON r.user_id = c.user_id AND r.rn = 1
      |JOIN days d ON d.user_id = c.user_id
      |ORDER BY c.user_id""".stripMargin

  /** Overlapping-interval UNION per user — "how long was the user
    * actually listening", counting overlapping plays once (the interval
    * coalescing shape: sessionize groups by GAPS; this merges by
    * OVERLAP — a user running two streams at once double-counts in
    * every sum(duration) mart metric, and this is the exact
    * correction). Each event is an interval [ts, ts+value] (value = the
    * play duration in whole seconds — floor, mirrored in both engines);
    * merge is the classic sweep: an interval starts a new island when
    * its start exceeds the running max end of everything before it
    * (cummax window, rows unbounded-preceding to -1), island id = a
    * running sum of the flags, covered time = max(end) − min(start) per
    * island. All integer arithmetic on epoch seconds — hash-exact.
    * Windows are user-partitioned; islands never cross users.
    */
  def eventsIntervalsUnion(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(spark, dir)
      .select($"user_id", $"event_id",
        unix_timestamp($"ts").as("s"),
        (unix_timestamp($"ts") + floor($"value").cast("long")).as("e"))
    val wo = Window.partitionBy($"user_id").orderBy($"s", $"e", $"event_id")
    val prevMaxE = max($"e").over(wo.rowsBetween(Window.unboundedPreceding, -1))
    val flagged = ev.withColumn("new_island",
      when(prevMaxE.isNull || $"s" > prevMaxE, 1L).otherwise(0L))
    val islands = flagged.withColumn("island",
      sum($"new_island").over(wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val merged = islands.groupBy($"user_id", $"island")
      .agg(min($"s").as("is"), max($"e").as("ie"), count(lit(1)).as("n"))
    merged.groupBy($"user_id")
      .agg(sum($"n").as("n_events"),
        count(lit(1)).as("n_merged_intervals"),
        sum($"ie" - $"is").as("covered_sec"),
        (max($"ie") - min($"is")).as("span_sec"))
      .orderBy($"user_id")
  }

  val eventsIntervalsUnionSql: String =
    """WITH ev AS (
      |  SELECT user_id, event_id,
      |    CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS s,
      |    CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)
      |      + CAST(floor(value) AS BIGINT) AS e
      |  FROM events
      |), flagged AS (
      |  SELECT *, CASE WHEN max(e) OVER w IS NULL OR s > max(e) OVER w
      |    THEN 1 ELSE 0 END AS new_island
      |  FROM ev
      |  WINDOW w AS (PARTITION BY user_id ORDER BY s, e, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |), islands AS (
      |  SELECT *, SUM(new_island) OVER (PARTITION BY user_id ORDER BY s, e, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      |  FROM flagged
      |), merged AS (
      |  SELECT user_id, island, MIN(s) AS i_s, MAX(e) AS i_e, COUNT(*) AS n
      |  FROM islands GROUP BY 1, 2
      |)
      |SELECT user_id, CAST(SUM(n) AS BIGINT) AS n_events,
      |  CAST(COUNT(*) AS BIGINT) AS n_merged_intervals,
      |  CAST(SUM(i_e - i_s) AS BIGINT) AS covered_sec,
      |  CAST(MAX(i_e) - MIN(i_s) AS BIGINT) AS span_sec
      |FROM merged
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_intervals_union" -> (eventsIntervalsUnion _),
    "set_ops_suite"         -> (setOpsSuite _),
    "dm_pivot_event_types"  -> (pivotEventTypes _),
    "agg_weighted_mean"     -> (aggWeightedMean _),
    "agg_mode_exact"        -> (aggModeExact _),
    "skew_salted_join"      -> (skewSaltedJoin _),
    "dm_wrapped_summary"    -> (dmWrappedSummary _),
    "sketch_distinct_hll"   -> (sketchDistinct _),
    "sketch_percentile_kll" -> (sketchPercentile _),
    "sketch_heavy_hitters"  -> (sketchHeavyHitters _),
    "sketch_distinct_intersect" -> (sketchDistinctIntersect _),
    "sketch_distinct_diff"  -> (sketchDistinctDiff _)
  )

  val oracleSql: Map[String, String] = Map(
    "events_intervals_union" -> eventsIntervalsUnionSql,
    "set_ops_suite"        -> setOpsSuiteSql,
    "dm_pivot_event_types" -> pivotEventTypesSql,
    "agg_weighted_mean"    -> aggWeightedMeanSql,
    "agg_mode_exact"       -> aggModeExactSql,
    "skew_salted_join"     -> skewSaltedJoinSql,
    "dm_wrapped_summary"   -> dmWrappedSummarySql
  )
}
