package graft.streaming

import org.apache.hadoop.fs.Path
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
  * double-count deltas), so delivery is guarded by [[StateFold.guarded]]
  * AND (round 10) every delta row is STAMPED with its batch id: a crash
  * BETWEEN the ledger append and the commit marker — the window the
  * round-9 marker could only document — is now recovered at runtime,
  * because the retry first rolls back any orphaned rows stamped with
  * its own batch id ([[graft.ops.CfIndex.rollbackBatch]]) and then
  * re-appends. At-least-once redelivery therefore lands exactly-once
  * state in every crash position (CfStreamSpec pins the half-committed
  * path). The committed state doubles as an append audit ledger:
  * one (batch_id, n_listen_rows) row per folded batch.
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
      StateFold.guarded(spark, s"$indexPath/meta", batchId, runTag) { prev =>
        // crash recovery: undo any deltas a half-committed attempt of
        // THIS batch left in the ledgers, then append cleanly
        graft.ops.CfIndex.rollbackBatch(spark, indexPath, batchId)
        val uicPath = new Path(s"$indexPath/uic")
        val fs = uicPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val listens = batch.select($"user_id", $"item_id")
        if (!fs.exists(uicPath))
          graft.ops.CfIndex.saveCfIndex(listens, indexPath, batchId)
        else
          graft.ops.CfIndex.appendToCfIndex(listens, indexPath, batchId)
        val prevRows = prev
          .map(_.as[(Long, Long)].collect().toSeq).getOrElse(Seq.empty)
        (prevRows :+ ((batchId, batch.count())))
          .toDF("batch_id", "n_listen_rows")
      }
    }
}
