package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming A/B state — ONE value-histogram fold feeding BOTH
  * experiment tests: per (event_type, value-cents) the per-arm counts
  * (c_a, c_b). Histogram counts are mergeable by plain addition, so the
  * fold is exact under any batch split; the Welch sufficient statistics
  * DERIVE from the histogram (n = Σc, Σy = Σc·y, Σy² = Σc·y² — the same
  * integers the batch entry sums row-wise), and Mann–Whitney consumes
  * the histogram directly (its first step IS this collapse). Both serve
  * through the SHARED batch cores ([[graft.core.StatsQueries.welchFrom]]
  * / [[graft.core.RankTests.mannWhitneyFromHist]]), so streamed ==
  * backfilled is BIT-IDENTICAL and the served entries are held to the
  * batch DuckDB oracles verbatim.
  *
  * State discipline is [[StateFold.guarded]] (versioned commit: retry
  * no-ops, stale state fails loudly). State size is DOMAIN-bounded —
  * ≤ types × distinct cents rows (the bound that makes the batch
  * entry's rank window cheap makes the state small), merged as a LAZY
  * union + groupBy inside the guarded fold: no driver collect of the
  * histogram, the RetentionStream discipline for beyond-trivial state.
  */
object AbStream {

  def abSink(events: DataFrame, statePath: String, runTag: String = "default"): DataStreamWriter[Row] =
    events.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        histFold(batch, statePath, batchId, runTag)
      }

  /** The per-batch body, factored out for direct testing. Expects the
    * raw events schema; derives (event_type, arm, y_c) exactly as the
    * batch entries do.
    */
  private[graft] def histFold(batch: DataFrame, statePath: String, batchId: Long,
      runTag: String = "default"): Unit =
    if (!batch.isEmpty) {
      val spark = batch.sparkSession
      import spark.implicits._
      val batchHist = batch
        .select($"event_type", pmod($"user_id", lit(2)).as("arm"),
          ($"value".cast("decimal(10,2)") * 100).cast("long").as("y_c"))
        .groupBy($"event_type", $"y_c").agg(
          sum(when($"arm" === 0, 1L).otherwise(0L)).as("c_a"),
          sum(when($"arm" === 1, 1L).otherwise(0L)).as("c_b"))
      StateFold.guarded(spark, statePath, batchId, runTag) { prev =>
        prev.map(_.select($"event_type", $"y_c", $"c_a", $"c_b")
            .unionByName(batchHist)).getOrElse(batchHist)
          .groupBy($"event_type", $"y_c")
          .agg(sum($"c_a").as("c_a"), sum($"c_b").as("c_b"))
      }
    }

  private def stateHist(spark: SparkSession, statePath: String): DataFrame = {
    import spark.implicits._
    StateFold.readState(spark, statePath)
      .getOrElse(throw new IllegalStateException(s"no committed A/B state at $statePath"))
      .select($"event_type", $"y_c", $"c_a", $"c_b")
  }

  /** Welch t-test from the folded histogram — identical to the batch
    * entry on the same corpus: the sufficient statistics below are the
    * SAME exact integers the batch computes row-wise.
    */
  def serveWelch(spark: SparkSession, statePath: String): DataFrame = {
    import spark.implicits._
    graft.core.StatsQueries.welchFrom(
      stateHist(spark, statePath).groupBy($"event_type").agg(
        sum($"c_a").as("n_a"),
        sum($"c_a" * $"y_c").as("sy_a"),
        sum($"c_a" * $"y_c" * $"y_c").as("syy_a"),
        sum($"c_b").as("n_b"),
        sum($"c_b" * $"y_c").as("sy_b"),
        sum($"c_b" * $"y_c" * $"y_c").as("syy_b")))
  }

  /** Mann–Whitney U from the folded histogram — the state IS the value
    * grain the batch entry collapses to.
    */
  def serveMannWhitney(spark: SparkSession, statePath: String): DataFrame =
    graft.core.RankTests.mannWhitneyFromHist(stateHist(spark, statePath))

  /** Kolmogorov–Smirnov D from the folded histogram — the third test
    * the one histogram fold serves: both ECDFs are running sums over
    * the state rows, nothing beyond the histogram is needed.
    */
  def serveKs(spark: SparkSession, statePath: String): DataFrame =
    graft.core.RankTests.ksFromHist(stateHist(spark, statePath))

  /** §2 entry `events_ab_sequential_served` state — the DAILY per-arm
    * moments fold beside the value-histogram state: per (event_type,
    * day) the six Welch sufficient statistics (n/Σcents/Σcents² per
    * arm), mergeable by plain addition so the fold is exact under any
    * batch split. The histogram state cannot serve the sequential
    * readout (it has no time axis); conversely the look grid depends on
    * the corpus's FULL day span, which only the reader knows — so the
    * state keeps day grain (≤ types × days rows) and look assignment
    * happens at serve time inside the shared batch tail
    * ([[graft.core.RankTests.sequentialFromDaily]]). This is the
    * interim-monitoring shape in its native habitat: the experiment
    * platform folds each day's events as they land and every peek at
    * the boundary reads ONLY this bounded state, never the corpus.
    */
  def abDailySink(events: DataFrame, statePath: String,
      runTag: String = "default"): DataStreamWriter[Row] =
    events.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        dailyMomentsFold(batch, statePath, batchId, runTag)
      }

  private[graft] def dailyMomentsFold(batch: DataFrame, statePath: String,
      batchId: Long, runTag: String = "default"): Unit =
    if (!batch.isEmpty) {
      val spark = batch.sparkSession
      import spark.implicits._
      val cols = Seq($"dn_a", $"dsy_a", $"dsyy_a", $"dn_b", $"dsy_b", $"dsyy_b")
      val batchDaily = batch
        .select($"event_type", pmod($"user_id", lit(2)).as("arm"),
          to_date($"ts").as("day"),
          $"value".cast("decimal(10,2)").as("y"))
        .withColumn("y_c", ($"y" * 100).cast("long"))
        .withColumn("yy_4", ($"y" * $"y" * 10000).cast("long"))
        .groupBy($"event_type", $"day").agg(
          sum(when($"arm" === 0, 1L).otherwise(0L)).as("dn_a"),
          sum(when($"arm" === 0, $"y_c").otherwise(0L)).as("dsy_a"),
          sum(when($"arm" === 0, $"yy_4").otherwise(0L)).as("dsyy_a"),
          sum(when($"arm" === 1, 1L).otherwise(0L)).as("dn_b"),
          sum(when($"arm" === 1, $"y_c").otherwise(0L)).as("dsy_b"),
          sum(when($"arm" === 1, $"yy_4").otherwise(0L)).as("dsyy_b"))
      StateFold.guarded(spark, statePath, batchId, runTag) { prev =>
        prev.map(_.select(($"event_type" +: $"day" +: cols): _*)
            .unionByName(batchDaily)).getOrElse(batchDaily)
          .groupBy($"event_type", $"day")
          .agg(sum($"dn_a").as("dn_a"), sum($"dsy_a").as("dsy_a"),
            sum($"dsyy_a").as("dsyy_a"), sum($"dn_b").as("dn_b"),
            sum($"dsy_b").as("dsy_b"), sum($"dsyy_b").as("dsyy_b"))
      }
    }

  /** The group-sequential readout from the folded daily state — the
    * span scalars derive from the state's own day bounds (one ≤ 1-row
    * driver pull), then the SHARED batch tail runs over ≤ types × days
    * rows; held to the batch entry's DuckDB oracle verbatim.
    */
  def serveSequential(spark: SparkSession, statePath: String): DataFrame = {
    import spark.implicits._
    val daily = StateFold.readState(spark, statePath)
      .getOrElse(throw new IllegalStateException(
        s"no committed A/B daily state at $statePath"))
      .select($"event_type", $"day", $"dn_a", $"dsy_a", $"dsyy_a",
        $"dn_b", $"dsy_b", $"dsyy_b")
    val b = daily.agg(min($"day").as("mn"), max($"day").as("mx")).head()
    val (mn, spanP) =
      if (b.isNullAt(0)) (java.sql.Date.valueOf("1970-01-01"), 1L)
      else {
        val mnL = b.getDate(0).toLocalDate
        (java.sql.Date.valueOf(mnL), java.time.temporal.ChronoUnit.DAYS
          .between(mnL, b.getDate(1).toLocalDate) + 1L)
      }
    graft.core.RankTests.sequentialFromDaily(daily, lit(mn), lit(spanP))
  }
}
