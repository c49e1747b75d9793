package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** The GDPR REQUEST STREAM — the streaming face of the per-index delete
  * ops (round 11's delete propagation, driven continuously): deletion
  * requests land as micro-batches of doc ids, and each batch fans out
  * through the document stores' delete paths — posting index (bucket
  * rewrite + negative meta row), positional index (bucket rewrite),
  * band index (tombstones) — then commits a processed-watermark row
  * through [[StateFold.guarded]].
  *
  * Exactly-once EFFECT: every delete op is RETRY-SAFE at any crash
  * point — the single-table ops by their own no-op probes (a re-delete
  * finds nothing and touches nothing), the posting index by
  * reconciling its meta ledger against the norms truth instead of
  * appending a pre-computed delta, and the multi-ledger CF delete by
  * its stamped rollback-then-apply protocol with a completion marker —
  * so the crash window between the index deletes and the watermark
  * commit recovers by simply re-running them. This is the mirror image
  * of the append sinks' Bloom anti-join guards: appends need dedup
  * because append twice = twice the rows; deletes converge.
  *
  * State is ONE row (batch id, cumulative ids processed) — bounded by
  * contract. Request batches are GDPR-request-rate sized (thousands,
  * not corpus-sized); the per-batch `collect` of distinct ids is the
  * bounded pull the delete ops' `isin` signature needs.
  */
object PurgeStream {

  def docPurgeSink(requests: DataFrame, postingIndexPath: String,
      positionalIndexPath: String, bandIndexPath: String,
      statePath: String, runTag: String = "default"): DataStreamWriter[Row] =
    requests.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        docPurgeFold(batch, postingIndexPath, positionalIndexPath,
          bandIndexPath, statePath, batchId, runTag)
      }

  /** The per-batch body, factored out for direct testing. `batch` must
    * carry a `doc_id` column.
    */
  private[graft] def docPurgeFold(batch: DataFrame, postingIndexPath: String,
      positionalIndexPath: String, bandIndexPath: String, statePath: String,
      batchId: Long, runTag: String = "default"): Unit =
    if (!batch.isEmpty) {
      val spark = batch.sparkSession
      import spark.implicits._
      StateFold.guarded(spark, statePath, batchId, runTag) { prev =>
        val ids = batch.select($"doc_id".cast("long"))
          .distinct().collect().map(_.getLong(0)).toSeq
        graft.ops.LlmQueries.deleteFromPostingIndex(spark, postingIndexPath, ids)
        graft.ops.PhraseSearch.deleteFromPositionalIndex(spark, positionalIndexPath, ids)
        graft.ops.ScaleDedup.deleteFromBandIndex(spark, bandIndexPath, ids)
        val prevN = prev.map(_.select($"n_purged").head().getLong(0)).getOrElse(0L)
        Seq((batchId, prevN + ids.length)).toDF("last_batch_id", "n_purged")
      }
    }

  /** The user-grain twin: purge requests carry `user_id` and fan out
    * through the CF ledgers (negated deltas under the stamped
    * marker+rollback protocol, so even a crash BETWEEN the three
    * ledger appends heals on redelivery) and the z-order event layout
    * (cell-bounded rewrite, no-op probe on re-delete). Same watermark
    * contract as [[docPurgeSink]].
    */
  def userPurgeSink(requests: DataFrame, cfIndexPath: String,
      zorderLayoutPath: String, statePath: String,
      runTag: String = "default"): DataStreamWriter[Row] =
    requests.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        userPurgeFold(batch, cfIndexPath, zorderLayoutPath, statePath, batchId, runTag)
      }

  private[graft] def userPurgeFold(batch: DataFrame, cfIndexPath: String,
      zorderLayoutPath: String, statePath: String, batchId: Long,
      runTag: String = "default"): Unit =
    if (!batch.isEmpty) {
      val spark = batch.sparkSession
      import spark.implicits._
      StateFold.guarded(spark, statePath, batchId, runTag) { prev =>
        val ids = batch.select($"user_id".cast("long"))
          .distinct().collect().map(_.getLong(0)).toSeq
        graft.ops.CfIndex.deleteUsersFromCfIndex(spark, cfIndexPath, ids,
          srcBatch = deleteStamp(runTag, batchId))
        graft.ops.ZorderLayout.deleteUsersFromZorderLayout(spark, zorderLayoutPath, ids)
        val prevN = prev.map(_.select($"n_purged").head().getLong(0)).getOrElse(0L)
        Seq((batchId, prevN + ids.length)).toDF("last_batch_id", "n_purged")
      }
    }

  /** The CF delete stamp for (runTag, batchId) — always < −2 (clear of
    * the append stamps ≥ −1), distinct for every batch id within a run
    * (the batch id occupies its own high bits), and separated ACROSS
    * runs by the run-tag hash: batch ids are only checkpoint-relative,
    * so a redeployment with a fresh checkpoint restarts them at 0 and a
    * checkpoint-only stamp would silently no-op new requests against
    * the old run's completion markers. Reusing an index across
    * redeployments therefore requires a fresh runTag — the same
    * crossed-streams rule StateFold already enforces for the watermark.
    */
  private[graft] def deleteStamp(runTag: String, batchId: Long): Long =
    -1000L - ((batchId & 0x7fffffL) << 32) -
      (s"$runTag#".hashCode.toLong & 0xffffffffL)

  /** The processed watermark, for monitoring and the spec. */
  def servePurgeState(spark: SparkSession, statePath: String): DataFrame =
    StateFold.readState(spark, statePath)
      .getOrElse(throw new IllegalStateException(s"no committed purge state at $statePath"))
}
