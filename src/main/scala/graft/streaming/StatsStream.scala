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
  * State discipline is [[DriftStream.driftFold]]'s (the anomalyFold
  * contract): per-type sums AND the (batch id, run tag) guard live in
  * ONE overwritten table — a retry of the committed batch no-ops, stale
  * state fails loudly, the guard cannot commit separately from the sums
  * it guards. State is ≤ #event-types rows; the only distributed pass
  * per batch is the batch's own bounded groupBy.
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
      val statePq = s"$statePath/state"
      val p = new org.apache.hadoop.fs.Path(statePq)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val prev: Seq[(String, String, Long, Long, Long, Long, Long, Long, Long, String)] =
        if (fs.exists(p) && fs.listStatus(p).nonEmpty)
          spark.read.parquet(statePq)
            .select($"kind", $"event_type", $"n", $"sx", $"sxx", $"sy_c", $"syy_4", $"sxy_c",
              $"last_batch_id", $"run_tag")
            .as[(String, String, Long, Long, Long, Long, Long, Long, Long, String)]
            .collect().toSeq
        else Seq.empty
      val meta = prev.find(_._1 == "meta").map(m => (m._9, m._10))
      if (meta.exists(m => m._2 == runTag && m._1 == batchId)) {
        // retry of the last committed batch — already folded
      } else if (meta.exists(m => m._2 != runTag || m._1 > batchId)) {
        throw new IllegalStateException(
          s"corrFold state at $statePath was last written by run '${meta.get._2}' " +
            s"batch ${meta.get._1} but received batch $batchId from run '$runTag' — " +
            "clear the state path or restore the checkpoint")
      } else {
        val prevSums = prev.filter(_._1 == "stat")
          .map(r => (r._2, (r._3, r._4, r._5, r._6, r._7, r._8)))
        val newSums = batchStats.map(r => (r._1, (r._2, r._3, r._4, r._5, r._6, r._7)))
        val merged = (prevSums ++ newSums).groupBy(_._1).map { case (t, rs) =>
          val s = rs.map(_._2)
          (t, (s.map(_._1).sum, s.map(_._2).sum, s.map(_._3).sum,
            s.map(_._4).sum, s.map(_._5).sum, s.map(_._6).sum))
        }.toSeq
        val rows = merged.map { case (t, (n, sx, sxx, syc, syy4, sxyc)) =>
          ("stat", t, n, sx, sxx, syc, syy4, sxyc, batchId, runTag)
        } :+ (("meta", "", 0L, 0L, 0L, 0L, 0L, 0L, batchId, runTag))
        rows.toDF("kind", "event_type", "n", "sx", "sxx", "sy_c", "syy_4", "sxy_c",
          "last_batch_id", "run_tag")
          .coalesce(1).write.mode("overwrite").parquet(statePq)
      }
    }

  /** Current statistics from the folded state, through the shared
    * estimator core — identical to the batch entry on the same corpus.
    */
  def serveCorr(spark: SparkSession, statePath: String): DataFrame = {
    import spark.implicits._
    graft.core.StatsQueries.corrFrom(
      spark.read.parquet(s"$statePath/state")
        .filter($"kind" === "stat")
        .select($"event_type", $"n", $"sx", $"sxx", $"sy_c", $"syy_4", $"sxy_c"))
  }
}
