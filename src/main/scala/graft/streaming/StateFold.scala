package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The shared foreachBatch state-fold discipline — one implementation of
  * the guard/fold/commit contract that DriftStream, StatsStream,
  * ForecastStream, MarkovStream, IndexStream and the EventsPipeline
  * anomaly fold each re-implemented before round 10 (copy drift across
  * eight hand-rolled guards is the same risk class SchemaContractSpec
  * kills for outputs), upgraded from overwrite-in-place to VERSIONED
  * ATOMIC COMMIT:
  *
  *  - Layout: `statePath/v<batchId>/data` (the state rows) +
  *    `statePath/v<batchId>/commit` (a one-row (batch_id, run_tag)
  *    marker, written LAST). A version exists only when its commit
  *    marker's `_SUCCESS` does — a crash mid-write leaves an
  *    uncommitted directory that readers never see and the retry
  *    deletes. This closes the delete-then-write window the in-place
  *    `mode("overwrite")` folds had: a crash mid-commit there lost ALL
  *    prior state and a replayed batch then folded as if fresh.
  *  - Guard: a retry of the last committed (batch id, run tag) no-ops;
  *    an older batch id or a foreign run tag fails loudly (stale state
  *    / crossed streams); anything newer folds.
  *  - Fold: `fold(prev)` receives the last committed state (None on the
  *    first batch) and returns the FULL next state. The helper owns the
  *    guard columns and the commit ordering; folds own only their state
  *    schema and merge logic. Side effects inside `fold` (ledger
  *    appends, verdict dirs) must themselves be retry-idempotent — the
  *    helper guarantees only that a half-finished fold is re-run from
  *    the previous committed state.
  *  - Prune: superseded versions are deleted AFTER the new commit
  *    lands (the MartStream vacuum discipline, inlined because state
  *    here is a single bounded table, not a multi-table tree).
  *
  * State tables under this contract are bounded model/aggregate pulls
  * (≤ #types², ≤ #cells, ≤ calendar days — never corpus- or user-
  * population-sized); `coalesce(1)` on the data write is therefore a
  * bounded single file, not a scale hazard.
  */
object StateFold {

  private def hfs(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Committed version ids ascending (commit marker `_SUCCESS` present). */
  private def committedIds(spark: SparkSession, statePath: String): Seq[Long] = {
    val root = new Path(statePath)
    val fs = hfs(spark, statePath)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.drop(1).forall(_.isDigit) && n.length > 1)
      .map(_.drop(1).toLong)
      .filter(id => fs.exists(new Path(s"$statePath/v$id/commit/_SUCCESS")))
      .sorted
  }

  private def commitTag(spark: SparkSession, statePath: String, id: Long): String =
    spark.read.parquet(s"$statePath/v$id/commit")
      .select("run_tag").head().getString(0)

  /** The latest committed state's data, if any. */
  def readState(spark: SparkSession, statePath: String): Option[DataFrame] =
    committedIds(spark, statePath).lastOption
      .map(id => spark.read.parquet(s"$statePath/v$id/data"))

  /** The latest committed (batch id, run tag), if any. */
  def lastCommit(spark: SparkSession, statePath: String): Option[(Long, String)] =
    committedIds(spark, statePath).lastOption
      .map(id => (id, commitTag(spark, statePath, id)))

  /** Guarded versioned fold — see the object doc for the contract. */
  def guarded(spark: SparkSession, statePath: String, batchId: Long, runTag: String)
      (fold: Option[DataFrame] => DataFrame): Unit = {
    import spark.implicits._
    val latest = lastCommit(spark, statePath)
    latest match {
      case Some((id, tag)) if tag == runTag && id == batchId =>
        // retry re-delivery of the last committed batch — already folded
        ()
      case Some((id, tag)) if tag != runTag || id > batchId =>
        throw new IllegalStateException(
          s"state at $statePath was last written by run '$tag' batch $id " +
            s"but received batch $batchId from run '$runTag' — " +
            "clear the state path or restore the checkpoint")
      case _ =>
        val prev = latest.map { case (id, _) =>
          spark.read.parquet(s"$statePath/v$id/data")
        }
        val next = fold(prev)
        val fs = hfs(spark, statePath)
        val vdir = s"$statePath/v$batchId"
        fs.delete(new Path(vdir), true) // a crashed half-written attempt
        next.coalesce(1).write.parquet(s"$vdir/data")
        Seq((batchId, runTag)).toDF("batch_id", "run_tag")
          .coalesce(1).write.parquet(s"$vdir/commit")
        committedIds(spark, statePath).filter(_ != batchId)
          .foreach(id => fs.delete(new Path(s"$statePath/v$id"), true))
    }
  }
}
