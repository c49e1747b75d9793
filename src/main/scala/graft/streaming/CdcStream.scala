package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming CDC apply — the continuous form of
  * [[graft.etl.CdcApply]]: micro-batches of change ops (lsn, key, op,
  * payload…) fold into a bucketed snapshot warehouse with latest-wins
  * upserts and DELETES, the capability [[EventsPipeline.mergeWarehouseSink]]
  * (update-only) stops short of.
  *
  * Design points the batch twin doesn't need:
  *   - **Tombstones**: a delete keeps its (key, lsn, op='D') row in the
  *     warehouse instead of vanishing — otherwise a REDELIVERED older
  *     batch containing the key's insert would resurrect it (the anti-join
  *     would see no trace). The serve path filters tombstones out; a
  *     retention job can vacuum tombstones older than the redelivery
  *     horizon (the Kafka-compaction discipline).
  *   - **LSN guard**: the merge winner per key is `max(struct(lsn, …))`
  *     over (affected warehouse rows ∪ batch-latest) — so a replayed or
  *     out-of-order batch can never regress a key to an older state:
  *     at-least-once delivery becomes exactly-once state.
  *   - **Bucket isolation** ([[EventsPipeline.mergeBatch]]'s layout): keys
  *     hash into `buckets` partition dirs; a batch rewrites only its
  *     affected buckets via dynamic partition overwrite — per-batch I/O is
  *     O(affected buckets), never the warehouse.
  *
  * StreamingSpec pins: streamed-over-N-batches == the batch one-shot
  * apply; replaying an old batch after newer ones changes nothing
  * (byte-stable affected buckets); deleted keys stay dead under replay.
  */
object CdcStream {

  private def bucketOf(key: org.apache.spark.sql.Column, buckets: Int) =
    pmod(xxhash64(key.cast("string")), lit(buckets.toLong)).cast("int")

  /** Attach the sink to a CDC stream whose rows carry `lsn` (long,
    * totally ordered), `key`, `op` ('I'/'U'/'D') and payload columns.
    */
  def cdcMergeSink(df: DataFrame, path: String, buckets: Int = 16): DataStreamWriter[Row] =
    df.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        cdcMergeBatch(batch, path, buckets)
      }

  /** The per-batch fold, factored out for direct testing. */
  private[graft] def cdcMergeBatch(batch: DataFrame, path: String, buckets: Int): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    val payloadCols = batch.columns.filterNot(c => c == "key" || c == "lsn" || c == "op")
    def packed(df: DataFrame): DataFrame =
      df.groupBy($"key")
        .agg(max(struct(($"lsn" +: $"op" +: payloadCols.map(col)).toIndexedSeq: _*)).as("_s"))
        .select(col("key") +: col("_s.lsn").as("lsn") +: col("_s.op").as("op") +:
          payloadCols.map(n => col(s"_s.$n").as(n)): _*)
    val incoming = packed(batch.filter($"key".isNotNull))
      .withColumn("_bucket", bucketOf($"key", buckets))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val affected = incoming.select("_bucket").distinct().collect().map(_.getInt(0)).toSeq
      if (affected.nonEmpty) {
        val merged = readSnapshotRaw(spark, path) match {
          case None => incoming
          case Some(wh) =>
            // LSN-guarded latest-wins over (affected warehouse rows ∪
            // batch): one partial-agg struct max per key — a replayed old
            // batch loses every race and the rewrite is value-identical
            packed(wh.filter($"_bucket".isin(affected: _*)).drop("_bucket")
                .unionByName(incoming.drop("_bucket")))
              .withColumn("_bucket", bucketOf($"key", buckets))
        }
        merged.localCheckpoint()
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("_bucket")
          .parquet(path)
      }
    } finally { incoming.unpersist(); () }
  }

  private def readSnapshotRaw(spark: SparkSession, path: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p) && fs.listStatus(p).nonEmpty) Some(spark.read.parquet(path)) else None
  }

  /** The current state: tombstones filtered, internal columns dropped —
    * column-compatible with [[graft.etl.CdcApply.applyCdc]]'s output
    * modulo names (lsn → last_lsn, op → last_op, ts → updated_at).
    */
  def serveSnapshot(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.parquet(path).filter($"op" =!= "D").drop("_bucket")
  }

  /** Tombstone retention (the Kafka-compaction cadence): delete markers at
    * or below `horizonLsn` have outlived the redelivery window — no
    * in-flight batch can still carry an op older than them — so they stop
    * paying storage and merge-read cost. Only buckets actually holding an
    * expirable tombstone are read and rewritten (dynamic partition
    * overwrite; census is one column-pruned scan); cold buckets stay
    * byte-identical. Returns the rewritten bucket ids. The horizon is the
    * operator's contract: choosing one INSIDE the redelivery window
    * re-opens the resurrection race [[cdcMergeBatch]]'s tombstones exist
    * to close — CdcSpec pins both sides of that boundary.
    */
  def vacuumTombstones(spark: SparkSession, path: String, horizonLsn: Long): Seq[Int] = {
    import spark.implicits._
    val wh = spark.read.parquet(path)
    val affected = wh
      .filter($"op" === "D" && $"lsn" <= horizonLsn)
      .select($"_bucket").distinct().collect().map(_.getInt(0)).toSeq.sorted
    if (affected.nonEmpty) {
      val remaining = wh.filter($"_bucket".isin(affected: _*))
        .filter(!($"op" === "D" && $"lsn" <= horizonLsn))
        .localCheckpoint() // materialize before overwriting the buckets being read
      remaining.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("_bucket")
        .parquet(path)
      // a bucket whose every row expired writes no partition above —
      // dynamic overwrite can't replace with nothing, so drop its dir
      val kept = remaining.select($"_bucket").distinct().collect().map(_.getInt(0)).toSet
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      affected.filterNot(kept).foreach { b =>
        fs.delete(new org.apache.hadoop.fs.Path(s"$path/_bucket=$b"), true); ()
      }
    }
    affected
  }
}
