package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming maintenance of the persisted CF index — the continuous
  * form of [[graft.ops.CfIndex.appendToCfIndex]]: listen micro-batches
  * fold into the co-listener ledgers as they land, so the neighbor
  * table [[graft.ops.CfIndex.serveCfNeighbors]] is always current
  * without ever re-pairing the history (the ivfPqIngestSink loop, on
  * the CF axis).
  *
  * The fold itself is NOT idempotent (re-folding a batch would
  * double-count deltas), so delivery is guarded by the anomalyFold
  * batch-id discipline: a `meta/` marker records (batch id, run tag)
  * AFTER the append lands; a retry of the recorded batch no-ops; an
  * older batch id or a different run tag fails loudly. The marker is a
  * one-row overwrite — the ledgers are append-only, so the recovery
  * story after a crash BETWEEN append and marker is the stream's
  * checkpoint replay into a cleared index (documented, spec-pinned
  * guard paths).
  */
object CfStream {

  def cfIndexSink(listens: DataFrame, indexPath: String, runTag: String = "default"): DataStreamWriter[Row] =
    listens.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        cfFold(batch, indexPath, batchId, runTag)
      }

  /** The per-batch body, factored out for direct testing. Expects
    * (user_id, item_id) listen rows.
    */
  private[graft] def cfFold(batch: DataFrame, indexPath: String, batchId: Long,
      runTag: String = "default"): Unit =
    if (!batch.isEmpty) {
      val spark = batch.sparkSession
      import spark.implicits._
      val metaPq = s"$indexPath/meta"
      val p = new org.apache.hadoop.fs.Path(metaPq)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val meta: Option[(Long, String)] =
        if (fs.exists(p) && fs.listStatus(p).nonEmpty)
          spark.read.parquet(metaPq)
            .select($"last_batch_id", $"run_tag")
            .as[(Long, String)].collect().headOption
        else None
      if (meta.exists(m => m._2 == runTag && m._1 == batchId)) {
        // retry of the committed batch — already folded
      } else if (meta.exists(m => m._2 != runTag || m._1 > batchId)) {
        throw new IllegalStateException(
          s"cfFold index at $indexPath was last written by run '${meta.get._2}' " +
            s"batch ${meta.get._1} but received batch $batchId from run '$runTag' — " +
            "clear the index path or restore the checkpoint")
      } else {
        val first = meta.isEmpty &&
          !fs.exists(new org.apache.hadoop.fs.Path(s"$indexPath/uic"))
        if (first) graft.ops.CfIndex.saveCfIndex(batch.select($"user_id", $"item_id"), indexPath)
        else graft.ops.CfIndex.appendToCfIndex(batch.select($"user_id", $"item_id"), indexPath)
        Seq((batchId, runTag)).toDF("last_batch_id", "run_tag")
          .coalesce(1).write.mode("overwrite").parquet(metaPq)
      }
    }
}
