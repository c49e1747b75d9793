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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "set_ops_suite"         -> (setOpsSuite _),
    "dm_pivot_event_types"  -> (pivotEventTypes _),
    "agg_weighted_mean"     -> (aggWeightedMean _),
    "sketch_distinct_hll"   -> (sketchDistinct _),
    "sketch_percentile_kll" -> (sketchPercentile _)
  )

  val oracleSql: Map[String, String] = Map(
    "set_ops_suite"        -> setOpsSuiteSql,
    "dm_pivot_event_types" -> pivotEventTypesSql,
    "agg_weighted_mean"    -> aggWeightedMeanSql
  )
}
