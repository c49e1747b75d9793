package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming ANN-index maintenance + HEALTH MONITORING — the
  * operational loop around the persisted IVF-PQ index
  * ([[graft.ops.VectorAgg.saveIvfPqIndex]] family): vector batches
  * append to the saved index continuously (FAISS add() as a stream
  * sink), and each batch folds an index-health row into monitor state —
  * the signals an operator pages on BEFORE retrieval quality visibly
  * degrades:
  *
  *  - **cell skew**: the batch's max cell share under the TRAINED
  *    centroids. An in-distribution batch spreads across cells; a
  *    distribution-shifted batch concentrates into one stale cell
  *    (its vectors are all nearest the same old centroid) — the
  *    deterministic early symptom of quantization drift, and the
  *    trigger for the retrain cadence the append contract documents.
  *    (A recall probe needs labeled truth and is the BATCH harness's
  *    job — ann_recall_eval; the streaming monitor uses signals that
  *    need no brute-force pass.)
  *  - **coverage**: served on demand — indexed row count vs the
  *    monitor's cumulative landed count; a crashed half-append shows
  *    up as a gap.
  *
  * Idempotence is the shardSink discipline: in-batch dedup on vec_id +
  * anti-join against the ids already indexed (a column-pruned probe of
  * the lists table; at 100 TB the probe side is the Bloom prefilter the
  * other sinks use), so a redelivered batch appends nothing. Monitor
  * state follows the anomalyFold contract: all batch rows + the (batch
  * id, run tag) guard in ONE overwritten table — retry no-ops, stale
  * state fails loudly, the guard cannot commit separately from the rows
  * it guards.
  */
object IndexStream {

  def ivfPqIngestSink(vecs: DataFrame, indexPath: String, statePath: String,
      runTag: String = "default"): DataStreamWriter[Row] =
    vecs.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestFold(batch, indexPath, statePath, batchId, runTag)
      }

  /** The per-batch body, factored out for direct testing. `skewBar` is
    * the max-cell-share alert threshold (a trained-balanced 16-cell
    * grid keeps in-distribution batches far below it).
    */
  private[graft] def ingestFold(batch: DataFrame, indexPath: String, statePath: String,
      batchId: Long, runTag: String = "default", skewBar: Double = 0.5): Unit =
    if (!batch.isEmpty) {
      val spark = batch.sparkSession
      import spark.implicits._
      StateFold.guarded(spark, statePath, batchId, runTag) { prev =>
        // idempotent append: in-batch dedup + anti-join vs already-indexed
        // ids (column-pruned lists probe) — so the re-run of a
        // half-committed fold appends only what the crash left out
        val indexed = spark.read.parquet(s"$indexPath/lists")
          .select($"neighbor_id".as("vec_id"))
        val fresh = batch.select($"vec_id", $"embedding")
          .dropDuplicates("vec_id")
          .join(indexed, Seq("vec_id"), "left_anti")
        val newRows: Long = fresh.count()
        if (newRows > 0) graft.ops.VectorAgg.appendToIvfPqIndex(fresh, indexPath)
        // cell-skew monitor: the batch's assignment profile under the
        // TRAINED centroids (same map-side broadcast argmin as the append
        // itself) — ≤ #cells rows, bounded pull
        val (maxCell, maxShare) =
          if (newRows == 0) (-1L, 0.0)
          else {
            val cells = spark.read.parquet(s"$indexPath/cells")
            val q = fresh.select($"vec_id",
              transform($"embedding", x => floor(x.cast("double") * 1000.0 + 0.5).cast("long")).as("v"))
            val counts = graft.ops.VectorAgg.withCellRank(q, cells)
              .select(element_at($"cellRank", 1).getField("cell").as("cell"))
              .groupBy($"cell").agg(count(lit(1)).as("n"))
              .as[(Long, Long)].collect()
            val top = counts.maxBy(_._2)
            (top._1, top._2.toDouble / newRows.toDouble)
          }
        val prevRows = prev
          .map(_.as[(Long, Long, Long, Double, Boolean)].collect().toSeq)
          .getOrElse(Seq.empty)
        (prevRows :+ ((batchId, newRows, maxCell, maxShare, maxShare > skewBar)))
          .toDF("batch_id", "n_new", "max_cell", "max_share", "skew_alert")
      }
    }

  /** Index health on demand: the per-batch monitor rows plus a coverage
    * summary (indexed rows vs the monitor's cumulative landed count —
    * equal unless an append half-crashed).
    */
  def serveIndexHealth(spark: SparkSession, indexPath: String, statePath: String): DataFrame = {
    import spark.implicits._
    val st = StateFold.readState(spark, statePath)
      .getOrElse(throw new IllegalStateException(s"no committed monitor state at $statePath"))
    val landed = st.agg(coalesce(sum($"n_new"), lit(0L)).as("landed"))
    val indexed = spark.read.parquet(s"$indexPath/lists")
      .agg(count(lit(1)).as("indexed"))
    st.select($"batch_id", $"n_new", $"max_cell", $"max_share", $"skew_alert")
      .crossJoin(broadcast(landed)).crossJoin(broadcast(indexed))
      .withColumn("coverage_ok", $"indexed" >= $"landed")
      .orderBy($"batch_id")
  }
}
