package graft

import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Streaming ALS onboarding: streamed fold over batches must equal the
  * one-shot fold-in of the same accumulated listens, the guard paths
  * hold, the ledger's batch-stamp rollback heals the crash window, and
  * cold buckets stay byte-stable.
  */
class AlsStreamSpec extends SparkSuite {

  /** A fresh trained index on the test corpus. */
  private def freshIndex(): String = {
    val dir = Files.createTempDirectory("graft_als_sidx").toString
    ops.Als.saveAlsIndex(spark, sf, dir)
    dir
  }

  /** Synthetic new-user listens, 3 batches, overlapping (user, item)
    * pairs so count ACCUMULATION across batches is exercised.
    */
  private def batches = {
    import spark.implicits._
    Seq(
      Seq((900001L, 1L), (900001L, 2L), (900002L, 1L)),
      Seq((900001L, 1L), (900002L, 3L), (900003L, 5L)),
      Seq((900003L, 5L), (900003L, 7L), (900001L, 2L))
    ).map(_.toDF("user_id", "item_id"))
  }

  test("streamed onboarding == one-shot fold-in of the accumulated listens") {
    import spark.implicits._
    val idxStream = freshIndex()
    val state = Files.createTempDirectory("graft_als_state").toString
    batches.zipWithIndex.foreach { case (b, i) =>
      streaming.AlsStream.alsOnboardFold(b, idxStream, state, i.toLong)
    }
    val idxOnce = freshIndex()
    val all = batches.reduce(_ unionByName _)
      .groupBy($"user_id", $"item_id")
      .agg(count(lit(1)).cast("double").as("r"))
    ops.Als.foldUsersIntoAlsIndex(spark, idxOnce, all)
    def users(p: String) = spark.read.parquet(s"$p/users")
      .select($"user_id", $"v1", $"v2").collect().map(_.toSeq).toSet
    assert(users(idxStream) == users(idxOnce),
      "streamed onboarding diverged from the one-shot fold-in")
    // the listened/ ledger (the fact-free novelty store) converges too
    def listened(p: String) = spark.read.parquet(s"$p/listened")
      .select($"user_id", $"item_id").collect().map(_.toSeq).toSet
    assert(listened(idxStream) == listened(idxOnce),
      "streamed onboarding diverged on the listened ledger")
    // the onboarded users actually landed
    val onboarded = spark.read.parquet(s"$idxStream/users")
      .filter($"user_id" >= 900000L).count()
    assert(onboarded == 3L)
  }

  test("retry no-ops; an older batch id fails loudly") {
    import spark.implicits._
    val idx = freshIndex()
    val state = Files.createTempDirectory("graft_als_state_r").toString
    val Seq(b0, b1, _) = batches
    streaming.AlsStream.alsOnboardFold(b0, idx, state, 0L)
    streaming.AlsStream.alsOnboardFold(b1, idx, state, 1L)
    def snap() = (
      spark.read.parquet(s"$state/ledger").collect().map(_.toSeq).toSet,
      spark.read.parquet(s"$idx/users").collect().map(_.toSeq).toSet)
    val want = snap()
    streaming.AlsStream.alsOnboardFold(b1, idx, state, 1L) // retry
    assert(snap() == want, "retry mutated the ledger or the factors")
    val e = intercept[IllegalStateException] {
      streaming.AlsStream.alsOnboardFold(b0, idx, state, 0L)
    }
    assert(e.getMessage.contains("clear the state path"))
  }

  test("crash window: ledger appended, watermark uncommitted — re-fold heals") {
    import spark.implicits._
    val idx = freshIndex()
    val state = Files.createTempDirectory("graft_als_state_c").toString
    val Seq(b0, b1, _) = batches
    streaming.AlsStream.alsOnboardFold(b0, idx, state, 0L)
    streaming.AlsStream.alsOnboardFold(b1, idx, state, 1L)
    val wantLedger = spark.read.parquet(s"$state/ledger")
      .collect().map(_.toSeq).toSet
    val wantUsers = spark.read.parquet(s"$idx/users")
      .collect().map(_.toSeq).toSet
    // reconstruct the crash: batch 1's ledger rows and factor rewrite
    // landed but its watermark didn't — roll the StateFold version back
    // and re-deliver; the stamped rollback must prevent double-append
    val (v1, _) = streaming.StateFold.lastCommit(spark, state).get
    val fs = new org.apache.hadoop.fs.Path(state)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$state/v$v1"), true)
    streaming.AlsStream.alsOnboardFold(b1, idx, state, 1L)
    assert(spark.read.parquet(s"$state/ledger")
      .collect().map(_.toSeq).toSet == wantLedger,
      "crash retry double-appended ledger rows")
    assert(spark.read.parquet(s"$idx/users")
      .collect().map(_.toSeq).toSet == wantUsers,
      "crash retry changed the factor table")
  }

  test("a batch rewrites only its users' buckets (cold buckets byte-stable)") {
    import spark.implicits._
    val idx = freshIndex()
    val state = Files.createTempDirectory("graft_als_state_b").toString
    streaming.AlsStream.alsOnboardFold(batches.head, idx, state, 0L)
    def mtimes(p: String) = {
      def walk(f: java.io.File): Seq[(String, Long)] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
        else Seq(f.getPath -> f.lastModified())
      walk(new java.io.File(p)).toMap
    }
    val before = mtimes(s"$idx/users")
    // one NEW single-user batch: at most one users bucket may change
    val b = Seq((900009L, 1L)).toDF("user_id", "item_id")
    streaming.AlsStream.alsOnboardFold(b, idx, state, 1L)
    val after = mtimes(s"$idx/users")
    val changed = before.keySet.filter(k => after.get(k).exists(_ != before(k)))
    val changedBuckets = (changed ++ (after.keySet -- before.keySet))
      .flatMap(p => "_bucket=(\\d+)".r.findFirstMatchIn(p).map(_.group(1)))
    assert(changedBuckets.size <= 1,
      s"single-user batch touched ${changedBuckets.size} buckets: $changedBuckets")
  }
}
