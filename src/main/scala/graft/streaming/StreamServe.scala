package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** §2 entries `events_markov_transitions_served` /
  * `events_value_corr_served` / `dq_drift_chi2_served` — the remaining
  * streamed-state analytics promoted to driver-gated entries (round 10,
  * completing the [[ForecastServe]] pattern): each folds its events
  * through the real streaming fold in event-id-split batches (the
  * ingest job — first call per (session, dir), pre-built outside the
  * bench's timed region) and then SERVES from the committed StateFold
  * state through the shared batch cores. Because streamed == backfilled
  * is bit-exact for all three (MarkovStreamSpec / StatsStreamSpec /
  * DriftSpec), each entry is held to its batch twin's DuckDB oracle
  * VERBATIM — the driver gate itself proves serve-from-state == rescan
  * for the whole streamed-analytics surface, not just the forecast
  * trio.
  */
object StreamServe {

  private val built =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String, String), String]

  private def statePathFor(spark: SparkSession, dir: String, kind: String)
      (fold: (SparkSession, String, String) => Unit): String =
    built.synchronized {
      built.getOrElseUpdate((spark, dir, kind), {
        val p = s"${System.getProperty("java.io.tmpdir")}/graft_${kind}_state_" +
          graft.Tables.dirKey(dir) +
          "_" + ProcessHandle.current().pid() +
          "_" + Integer.toHexString(System.identityHashCode(spark))
        fold(spark, dir, p)
        p
      })
    }

  /** Three event-id-ordered batches — the MarkovStreamSpec split (the
    * markov fold's delivery contract is event-time order per user
    * across batches, which event-id order satisfies on this data).
    */
  private def foldInThirds(spark: SparkSession, dir: String,
      fold: (DataFrame, Long) => Unit): Unit = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
    val maxId = ev.agg(max($"event_id")).head().getLong(0)
    val cuts = Seq(maxId / 3, 2 * maxId / 3, maxId)
    cuts.zip(-1L +: cuts.dropRight(1)).zipWithIndex.foreach { case ((hi, lo), i) =>
      fold(ev.filter($"event_id" > lo && $"event_id" <= hi), i.toLong)
    }
  }

  def markovServed(spark: SparkSession, dir: String): DataFrame =
    MarkovStream.serveTransitions(spark,
      statePathFor(spark, dir, "markov") { (s, d, p) =>
        foldInThirds(s, d, (b, i) => MarkovStream.markovFold(b, p, i))
      })

  def corrServed(spark: SparkSession, dir: String): DataFrame =
    StatsStream.serveCorr(spark,
      statePathFor(spark, dir, "corr") { (s, d, p) =>
        foldInThirds(s, d, (b, i) => StatsStream.corrFold(b, p, i))
      })

  /** The drift screen's CURRENT window (post-50%-LSN events) folded
    * through the stream; the static reference window comes from the
    * shared batch split, exactly as the batch entry computes it.
    */
  def driftServed(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val path = statePathFor(spark, dir, "drift") { (s, d, p) =>
      val ev = Tables.events(s, d)
      val maxId = ev.agg(max($"event_id")).head().getLong(0)
      // two batches over the current window (LSN > 50%)
      val mid = maxId / 2
      val q3 = mid + (maxId - mid) / 2
      Seq((mid, q3, 0L), (q3, maxId, 1L)).foreach { case (lo, hi, i) =>
        DriftStream.driftFold(
          ev.filter($"event_id" * 2 > maxId && $"event_id" > lo && $"event_id" <= hi),
          p, i)
      }
    }
    val (ref, _) = graft.etl.DataQuality.refCurCounts(spark, dir)
    DriftStream.serveDrift(spark, path, ref)
  }

  /** The Benford screen folded from a two-batch order feed (split at the
    * half order-key watermark) and served from state — bit-equal to the
    * batch entry because counts merge additively through the shared
    * [[graft.etl.DataQuality.benfordOn]] core.
    */
  def benfordServed(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val path = statePathFor(spark, dir, "benford") { (s, d, p) =>
      val ord = Tables.orders(s, d)
      val maxId = ord.agg(max($"o_orderkey")).head().getLong(0)
      val mid = maxId / 2
      DriftStream.benfordFold(ord.filter($"o_orderkey" <= mid), p, 0L)
      DriftStream.benfordFold(ord.filter($"o_orderkey" > mid), p, 1L)
    }
    DriftStream.serveBenford(spark, path)
  }

  /** Last-touch channel credits folded through the bucketed-touch
    * stream (event-id thirds satisfy the per-user event-time delivery
    * contract) and served from the StateFold rollup — held to the
    * batch entry's oracle verbatim (round 11, the one analytics family
    * that lacked a served twin).
    */
  def attributionChannelServed(spark: SparkSession, dir: String): DataFrame =
    AttributionStream.serveChannels(spark,
      statePathFor(spark, dir, "attribution") { (s, d, p) =>
        foldInThirds(s, d, (b, i) => AttributionStream.attributionFold(b, p, i))
      })

  /** The retention bitmaps folded from event-id thirds (delivery order
    * is irrelevant here — the state is a day SET and union commutes)
    * and served through the shared batch core — held to the batch
    * entry's oracle verbatim.
    */
  def retentionBitmapServed(spark: SparkSession, dir: String): DataFrame =
    RetentionStream.serveRetention(spark,
      statePathFor(spark, dir, "retention") { (s, d, p) =>
        foldInThirds(s, d, (b, i) => RetentionStream.retentionFold(b, p, i))
      })

  /** The position-model rollup served from the SAME folded attribution
    * state as the last-touch entry — one touch store, two credit
    * models; held to the batch position entry's oracle verbatim.
    */
  def attributionPositionServed(spark: SparkSession, dir: String): DataFrame =
    AttributionStream.servePositionChannels(spark,
      statePathFor(spark, dir, "attribution") { (s, d, p) =>
        foldInThirds(s, d, (b, i) => AttributionStream.attributionFold(b, p, i))
      })

  /** Welch t, Mann–Whitney U and Kolmogorov–Smirnov D served from ONE
    * folded value-histogram state (the A/B state family — histogram
    * counts merge additively; all three tests project from it through
    * the shared batch cores) — held to the batch entries' oracles
    * verbatim.
    */
  def abWelchServed(spark: SparkSession, dir: String): DataFrame =
    AbStream.serveWelch(spark,
      statePathFor(spark, dir, "ab") { (s, d, p) =>
        foldInThirds(s, d, (b, i) => AbStream.histFold(b, p, i))
      })

  def abMannWhitneyServed(spark: SparkSession, dir: String): DataFrame =
    AbStream.serveMannWhitney(spark,
      statePathFor(spark, dir, "ab") { (s, d, p) =>
        foldInThirds(s, d, (b, i) => AbStream.histFold(b, p, i))
      })

  def abKsServed(spark: SparkSession, dir: String): DataFrame =
    AbStream.serveKs(spark,
      statePathFor(spark, dir, "ab") { (s, d, p) =>
        foldInThirds(s, d, (b, i) => AbStream.histFold(b, p, i))
      })

  /** The group-sequential readout served from the DAILY per-arm moments
    * state (its own fold — the histogram state has no time axis); every
    * interim peek reads ≤ types × days state rows, never the corpus —
    * the monitoring cadence in its native streaming habitat.
    */
  def abSequentialServed(spark: SparkSession, dir: String): DataFrame =
    AbStream.serveSequential(spark,
      statePathFor(spark, dir, "abdaily") { (s, d, p) =>
        foldInThirds(s, d, (b, i) => AbStream.dailyMomentsFold(b, p, i))
      })

  /** Monthly growth accounting served from the streamed (customer,
    * order-month) activity set — the orders-side state family member;
    * two o_orderkey-half batches (set union commutes, any split works);
    * held to the batch entry's oracle verbatim.
    */
  def growthAccountingServed(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val path = statePathFor(spark, dir, "growth") { (s, d, p) =>
      val ord = Tables.orders(s, d)
      val maxId = ord.agg(max($"o_orderkey")).head().getLong(0)
      val mid = maxId / 2
      GrowthStream.growthFold(ord.filter($"o_orderkey" <= mid), p, 0L)
      GrowthStream.growthFold(ord.filter($"o_orderkey" > mid), p, 1L)
    }
    GrowthStream.serveGrowth(spark, path)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dm_growth_accounting_served"  -> (growthAccountingServed _),
    "events_ab_welch_served"       -> (abWelchServed _),
    "events_ab_mannwhitney_served" -> (abMannWhitneyServed _),
    "events_ab_ks_served"          -> (abKsServed _),
    "events_ab_sequential_served"  -> (abSequentialServed _),
    "events_attribution_position_served" -> (attributionPositionServed _),
    "events_retention_bitmap_served"   -> (retentionBitmapServed _),
    "events_markov_transitions_served" -> (markovServed _),
    "events_value_corr_served"         -> (corrServed _),
    "dq_drift_chi2_served"             -> (driftServed _),
    "dq_benford_served"                -> (benfordServed _),
    "events_attribution_channel_served" -> (attributionChannelServed _)
  )

  /** The batch twins' oracles verbatim — serve-from-state is bit-equal. */
  val oracleSql: Map[String, String] = Map(
    "dm_growth_accounting_served"  -> graft.core.GrowthQueries.dmGrowthAccountingSql,
    "events_ab_welch_served"       -> graft.core.StatsQueries.eventsAbWelchSql,
    "events_ab_mannwhitney_served" -> graft.core.RankTests.eventsAbMannWhitneySql,
    "events_ab_ks_served"          -> graft.core.RankTests.eventsAbKsSql,
    "events_ab_sequential_served"  -> graft.core.RankTests.eventsAbSequentialSql,
    "events_markov_transitions_served" -> graft.core.EngagementQueries.eventsMarkovTransitionsSql,
    "events_value_corr_served"         -> graft.core.StatsQueries.eventsValueCorrSql,
    "dq_drift_chi2_served"             -> graft.etl.DataQuality.dqDriftChi2Sql,
    "dq_benford_served"                -> graft.etl.DataQuality.dqBenfordSql,
    "events_attribution_channel_served" ->
      graft.core.AttributionQueries.eventsAttributionChannelSql,
    "events_retention_bitmap_served" ->
      graft.core.BehaviorQueries.eventsRetentionBitmapSql,
    "events_attribution_position_served" ->
      graft.core.AttributionQueries.eventsAttributionPositionSql
  )
}
