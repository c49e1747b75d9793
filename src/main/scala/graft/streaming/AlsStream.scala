package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.types._

/** Continuous user onboarding for the ALS factor index — the streaming
  * form of [[graft.ops.Als.foldUsersIntoAlsIndex]]: listens arrive in
  * micro-batches, accumulate per user in a bucketed count LEDGER, and
  * each batch re-solves its affected users' factors against the FROZEN
  * item table (one bounded ridge half-solve — no retrain, no touch of
  * other users). This is the production cold-start loop: a user's first
  * session closes and the factor index can recommend for them one batch
  * later, while the item side stays the artifact the (much rarer) full
  * training job owns.
  *
  * Semantics shared with the one-shot fold-in, deliberately: a user's
  * streamed factors are the solve of their LEDGER profile against the
  * frozen items — for a user the base index already knew, onboarding
  * REPLACES their row from the streamed profile (the fold-in's documented
  * upsert rule), so streamed-vs-one-shot parity is exact and spec-pinned.
  *
  * Scale shape: the ledger and the onboarded-factor table are
  * key-hash-BUCKETED on user (the [[MarkovStream]] users/ layout); a
  * batch appends its stamped delta rows to affected buckets, re-solves
  * only affected users (ledger rows of ≤ affected-users size), and
  * rewrites only affected buckets of the factor table via dynamic
  * partition overwrite — cold buckets byte-stable. The frozen item table
  * is entity × d and shuffle-hash-joins into the solve (the same
  * no-factor-broadcast rule as training — item catalogs are bounded but
  * the rule is uniform and plan-pinned).
  *
  * Exactly-once — the [[CfStream]] discipline: ledger rows are STAMPED
  * with their batch id; a retry of a half-committed batch first rolls
  * back any rows carrying its own stamp (rewriting only buckets that
  * hold them) and then re-appends, and the factor rewrite is a
  * deterministic function of (healed ledger, frozen items), so it
  * re-lands identically. The ≤ 1-row watermark commits LAST through
  * [[StateFold.guarded]].
  */
object AlsStream {

  val userBuckets = 16

  private def bucketOf(c: Column): Column =
    pmod(xxhash64(c.cast("string")), lit(userBuckets.toLong)).cast("int")

  private val ledgerSchema = StructType(Seq(
    StructField("user_id", LongType), StructField("item_id", LongType),
    StructField("n", LongType), StructField("src_batch", LongType),
    StructField("_bucket", IntegerType)))

  def alsOnboardSink(listens: DataFrame, indexPath: String, statePath: String,
      runTag: String = "default"): DataStreamWriter[Row] =
    listens.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        alsOnboardFold(batch, indexPath, statePath, batchId, runTag)
      }

  /** The per-batch body, factored out for direct testing. Expects
    * (user_id, item_id) listen rows.
    */
  private[graft] def alsOnboardFold(batch: DataFrame, indexPath: String,
      statePath: String, batchId: Long, runTag: String = "default"): Unit =
    if (!batch.isEmpty) {
      val spark = batch.sparkSession
      import spark.implicits._
      StateFold.guarded(spark, statePath, batchId, runTag) { prev =>
        val deltas = batch.groupBy($"user_id", $"item_id")
          .agg(count(lit(1)).as("n"))
          .select($"user_id", $"item_id", $"n",
            lit(batchId).as("src_batch"), bucketOf($"user_id").as("_bucket"))
          .localCheckpoint() // affected set, rollback probe, append, solve

        val ledgerPath = s"$statePath/ledger"
        val lp = new Path(ledgerPath)
        val fs = lp.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val affected = deltas.select($"_bucket").distinct()
          .collect().map(_.getInt(0)).toSeq

        // crash-window rollback (the CfStream device): a half-committed
        // attempt of THIS batch left stamped rows in some buckets —
        // rewrite exactly those buckets without them before re-appending
        if (graft.ops.AtomicRewrite.hasCommittedFiles(fs, lp)) {
          val resident = spark.read.parquet(ledgerPath)
            .filter($"_bucket".isin(affected: _*))
          val dirtyBuckets = resident.filter($"src_batch" === batchId)
            .select($"_bucket").distinct().collect().map(_.getInt(0)).toSeq
          if (dirtyBuckets.nonEmpty) {
            val cleaned = resident.filter($"_bucket".isin(dirtyBuckets: _*))
              .filter($"src_batch" =!= batchId)
              .localCheckpoint()
            cleaned
              .write.mode("overwrite")
              .option("partitionOverwriteMode", "dynamic")
              .partitionBy("_bucket")
              .parquet(ledgerPath)
            // a dirty bucket whose ONLY rows were the crashed attempt's
            // rewrites to empty — dynamic overwrite skips it and the
            // stale stamped rows would double on re-append; drop the
            // emptied dirs explicitly (the attribution-store lesson)
            val live = cleaned.select($"_bucket").distinct()
              .collect().map(_.getInt(0)).toSet
            dirtyBuckets.filterNot(live).foreach { b =>
              fs.delete(new Path(s"$ledgerPath/_bucket=$b"), true)
              ()
            }
          }
        }
        deltas.write.mode("append").partitionBy("_bucket").parquet(ledgerPath)

        // re-solve affected users from their FULL ledger profile vs the
        // frozen items, and upsert their factor rows into the base index
        // — deterministic in (healed ledger, frozen items), so the retry
        // of a crash after this point re-lands bit-identically
        val affectedUsers = deltas.select($"user_id").distinct()
        val profiles = spark.read.parquet(ledgerPath)
          .filter($"_bucket".isin(affected: _*))
          .join(affectedUsers, Seq("user_id"))
          .groupBy($"user_id", $"item_id")
          .agg(sum($"n").cast("double").as("r"))
        graft.ops.Als.foldUsersIntoAlsIndex(spark, indexPath, profiles)

        val prevUsers = prev.map(_.select($"n_onboard_events").head().getLong(0))
          .getOrElse(0L)
        Seq((batchId, prevUsers + deltas.count()))
          .toDF("last_batch_id", "n_onboard_events")
      }
    }
}
