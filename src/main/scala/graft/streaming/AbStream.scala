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
}
