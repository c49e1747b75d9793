package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming exact statistics — the continuous form of
  * [[graft.core.StatsQueries.eventsValueCorr]]: each micro-batch's
  * exact sufficient statistics (n, Σx, Σx², scaled-long Σy, Σy², Σxy —
  * the SHARED [[graft.core.StatsQueries.suffStatsOn]] pass) fold into
  * persisted state by PLAIN ADDITION (sufficient statistics are
  * mergeable by construction — the whole point of choosing them as the
  * state representation), and the Pearson/OLS estimators are recomputed
  * from state on demand through the SHARED
  * [[graft.core.StatsQueries.corrFrom]] core — so a streamed and a
  * backfilled corpus produce BIT-IDENTICAL statistics (exact integer
  * state + one shared IEEE tree; StatsStreamSpec pins it).
  *
  * State discipline is [[StateFold.guarded]] (round 10: the shared
  * helper replaces the hand-rolled guard): per-type sums commit
  * atomically under a versioned dir — retry no-ops, stale state fails
  * loudly, a crash mid-commit cannot lose prior sums. State is
  * ≤ #event-types rows; the only distributed pass per batch is the
  * batch's own bounded groupBy.
  */
object StatsStream {

  def corrSink(events: DataFrame, statePath: String, runTag: String = "default"): DataStreamWriter[Row] =
    events.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        corrFold(batch, statePath, batchId, runTag)
      }

  /** The per-batch body, factored out for direct testing. Expects the
    * raw events schema; derives (event_type, x, y) exactly as the batch
    * entry does.
    */
  private[graft] def corrFold(batch: DataFrame, statePath: String, batchId: Long,
      runTag: String = "default"): Unit =
    if (!batch.isEmpty) {
      val spark = batch.sparkSession
      import spark.implicits._
      val xy = batch.select($"event_type", hour($"ts").cast("long").as("x"),
        $"value".cast("decimal(10,2)").as("y"))
      // ≤ #types rows — the bounded-pull contract
      val batchStats: Seq[(String, Long, Long, Long, Long, Long, Long)] =
        graft.core.StatsQueries.suffStatsOn(xy)
          .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq
      StateFold.guarded(spark, statePath, batchId, runTag) { prev =>
        val prevSums = prev.map(
          _.select($"event_type", $"n", $"sx", $"sxx", $"sy_c", $"syy_4", $"sxy_c")
            .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq)
          .getOrElse(Seq.empty)
        (prevSums ++ batchStats)
          .groupBy(_._1).map { case (t, rs) =>
            (t, rs.map(_._2).sum, rs.map(_._3).sum, rs.map(_._4).sum,
              rs.map(_._5).sum, rs.map(_._6).sum, rs.map(_._7).sum)
          }.toSeq
          .toDF("event_type", "n", "sx", "sxx", "sy_c", "syy_4", "sxy_c")
      }
    }

  /** Current statistics from the folded state, through the shared
    * estimator core — identical to the batch entry on the same corpus.
    */
  def serveCorr(spark: SparkSession, statePath: String): DataFrame = {
    import spark.implicits._
    graft.core.StatsQueries.corrFrom(
      StateFold.readState(spark, statePath)
        .getOrElse(throw new IllegalStateException(s"no committed stats state at $statePath"))
        .select($"event_type", $"n", $"sx", $"sxx", $"sy_c", $"syy_4", $"sxy_c"))
  }
}
