package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming growth-accounting state — the ORDERS-side member of the
  * state family (the daily-count fold serves the events calendar; this
  * folds the (customer, order-month) ACTIVITY SET the monthly
  * growth-accounting decomposition reads). Activity is a SET and union
  * is idempotent + commutative, so the fold is exact under any batch
  * split or crash-window retry; the lifecycle classification (lag/lead
  * over each user's months) happens at SERVE time through the shared
  * [[graft.core.GrowthQueries.growthAccountingOn]] core, so streamed ==
  * backfilled is bit-identical and the served entry is held to the
  * batch DuckDB oracle verbatim.
  *
  * State discipline is [[StateFold.guarded]]; the merge is a LAZY
  * unionByName + distinct (no driver collect — state is user-entity ×
  * active-months sized, the retention-bitmap class).
  */
object GrowthStream {

  def growthSink(orders: DataFrame, statePath: String, runTag: String = "default"): DataStreamWriter[Row] =
    orders.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        growthFold(batch, statePath, batchId, runTag)
      }

  /** The per-batch body, factored out for direct testing. Expects the
    * raw orders schema; derives (user_id, ym) exactly as the batch
    * entry does.
    */
  private[graft] def growthFold(batch: DataFrame, statePath: String, batchId: Long,
      runTag: String = "default"): Unit =
    if (!batch.isEmpty) {
      val spark = batch.sparkSession
      import spark.implicits._
      val batchUm = batch
        .select($"o_custkey".as("user_id"),
          (year($"o_orderdate") * 12 + month($"o_orderdate") - 1).cast("long").as("ym"))
        .distinct()
      StateFold.guarded(spark, statePath, batchId, runTag) { prev =>
        prev.map(_.select($"user_id", $"ym").unionByName(batchUm))
          .getOrElse(batchUm)
          .distinct()
      }
    }

  /** The growth-accounting decomposition from the folded activity set —
    * identical to the batch entry on the same corpus.
    */
  def serveGrowth(spark: SparkSession, statePath: String): DataFrame = {
    import spark.implicits._
    graft.core.GrowthQueries.growthAccountingOn(
      StateFold.readState(spark, statePath)
        .getOrElse(throw new IllegalStateException(
          s"no committed growth state at $statePath"))
        .select($"user_id", $"ym"))
  }
}
