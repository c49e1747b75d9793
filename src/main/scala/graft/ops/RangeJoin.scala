package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Range (interval) join: for each probe row, every interval that contains
  * its timestamp — the engine operator behind campaign/window attribution
  * and validity-interval lookups.
  *
  * Spark plans a raw `probe.ts BETWEEN start AND end` join predicate as a
  * BroadcastNestedLoopJoin (O(probes × intervals) compares, and a driver
  * OOM once the intervals side outgrows the broadcast budget). The
  * scale-safe composition discretizes time into buckets at least as wide
  * as the longest interval:
  *
  *   - each interval replicates to the buckets it overlaps — bounded by
  *     ceil(maxLen / W) + 1 = 2 copies when W ≥ maxLen;
  *   - each probe belongs to exactly ONE bucket, so the bucket equi-join
  *     emits every qualifying (probe, interval) pair exactly once — no
  *     post-join dedup — and the exact range predicate drops same-bucket
  *     near-misses;
  *   - the plan is one hash-exchange per side on the bucket key (AQE can
  *     still pick broadcast when a side is genuinely small), never a
  *     nested-loop: candidate work is bucket occupancy, not n·m.
  *
  * Intervals here are derived deterministically from `orders`: every 97th
  * order opens a window of 1–30 days; probes are all order dates. The
  * DuckDB oracle is the plain BETWEEN join, so the bucketed plan is held
  * to exact-hash equality with the naive semantics.
  */
object RangeJoin {

  /** Bucket width in days; must be ≥ the longest interval (30 days). */
  private val BucketDays = 31

  private def epochDay(c: Column): Column =
    datediff(to_date(c), lit("1970-01-01").cast("date"))

  /** General API: probes gain one output row per containing interval.
    * `intervals` must carry inclusive [start_ts, end_ts] timestamp bounds;
    * `maxLenDays` bounds end_ts - start_ts and sizes the bucket width.
    */
  def rangeJoin(probes: DataFrame, probeTs: String, intervals: DataFrame,
      maxLenDays: Int): DataFrame = {
    val w = maxLenDays + 1
    val iBuck = intervals.withColumn("_bucket",
      explode(sequence(
        floor(epochDay(col("start_ts")) / w),
        floor(epochDay(col("end_ts")) / w))))
    val pBuck = probes.withColumn("_bucket", floor(epochDay(col(probeTs)) / w))
    pBuck.join(iBuck, Seq("_bucket"))
      .filter(col(probeTs) >= col("start_ts") && col(probeTs) <= col("end_ts"))
      .drop("_bucket")
  }

  /** The same bucketed composition over an INTEGER domain with extra
    * equi-keys — the general core behind media-timeline alignment
    * ([[Multimodal.multimodalAvAlign]]): probes join intervals that
    * contain them AND share `keys` (e.g. the same media_id). Bucket key =
    * (keys, floor(value / bucketWidth)); `bucketWidth` must be ≥ the
    * longest interval so each interval replicates to ≤ 2 buckets. Each
    * probe sits in exactly one bucket → every qualifying pair emitted
    * exactly once, no dedup; the exact predicate drops same-bucket
    * near-misses; the plan is a hash equi-join, never a nested loop.
    */
  def rangeJoinNumericKeyed(probes: DataFrame, probeCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      bucketWidth: Long, keys: Seq[String]): DataFrame = {
    val iBuck = intervals.withColumn("_bucket",
      explode(sequence(
        floor(col(startCol) / bucketWidth),
        floor(col(endCol) / bucketWidth))))
    val pBuck = probes.withColumn("_bucket", floor(col(probeCol) / bucketWidth))
    pBuck.join(iBuck, keys :+ "_bucket")
      .filter(col(probeCol) >= col(startCol) && col(probeCol) <= col(endCol))
      .drop("_bucket")
  }

  /** Per-interval order count and revenue: every 97th order opens a
    * [o_orderdate, o_orderdate + (key div 97) mod 30 + 1 days] window;
    * all orders whose date falls inside are attributed to it.
    */
  def rangeJoinIntervals(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ords = Tables.orders(spark, dir)
      .select($"o_orderkey", $"o_orderdate", $"o_totalprice")
    val intervals = ords
      .filter(pmod($"o_orderkey", lit(97)) === 0)
      .select(
        $"o_orderkey".as("interval_id"),
        $"o_orderdate".as("start_ts"),
        expr("timestampadd(DAY, CAST(pmod(o_orderkey DIV 97, 30) + 1 AS INT), o_orderdate)")
          .as("end_ts"))
    rangeJoin(ords, "o_orderdate", intervals, maxLenDays = 30)
      .groupBy($"interval_id", $"start_ts", $"end_ts")
      .agg(
        count(lit(1)).as("n_orders"),
        sum($"o_totalprice".cast("decimal(18,2)")).cast("double").as("revenue"))
      .orderBy($"interval_id")
  }

  val rangeJoinIntervalsSql: String =
    """WITH iv AS (
      |  SELECT o_orderkey AS interval_id, o_orderdate AS start_ts,
      |    o_orderdate + to_days(CAST((o_orderkey // 97) % 30 + 1 AS INTEGER)) AS end_ts
      |  FROM orders WHERE o_orderkey % 97 = 0
      |)
      |SELECT interval_id, start_ts, end_ts,
      |  CAST(COUNT(*) AS BIGINT) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM iv JOIN orders ON o_orderdate BETWEEN start_ts AND end_ts
      |GROUP BY 1, 2, 3
      |ORDER BY interval_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "range_join_intervals" -> (rangeJoinIntervals _)
  )

  val oracleSql: Map[String, String] = Map(
    "range_join_intervals" -> rangeJoinIntervalsSql
  )
}
