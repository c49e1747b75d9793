package graft

import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Streaming retention-bitmap fold: parity with the batch rollup, the
  * state guard paths, the idempotent crash window (set-union state), and
  * the monotone-frontier prune that bounds per-user state at 63 days.
  */
class RetentionStreamSpec extends SparkSuite {

  private def foldThirds(dir: String): Unit = {
    import spark.implicits._
    val ev = Tables.events(spark, sf)
    val maxId = ev.agg(max($"event_id")).head().getLong(0)
    val cuts = Seq(maxId / 3, 2 * maxId / 3, maxId)
    cuts.zip(-1L +: cuts.dropRight(1)).zipWithIndex.foreach { case ((hi, lo), i) =>
      streaming.RetentionStream.retentionFold(
        ev.filter($"event_id" > lo && $"event_id" <= hi), dir, i.toLong)
    }
  }

  test("streamed over 3 batches == batch retention rollup bit-for-bit") {
    val dir = Files.createTempDirectory("graft_retention").toString
    foldThirds(dir)
    val streamed = streaming.RetentionStream.serveRetention(spark, dir)
      .collect().map(_.toSeq).toSeq
    val batch = core.BehaviorQueries.eventsRetentionBitmap(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(streamed == batch, "served rollup diverges from the batch entry")
    assert(batch.exists(_(1).asInstanceOf[Long] > 0L), "co-presence non-vacuous")
    // the committed state is the 1-row frontier watermark; the per-user
    // days live in the bucketed days/ table, never the driver
    val st = streaming.StateFold.readState(spark, dir).get
    assert(st.columns.toSeq == Seq("frontier", "last_batch_id"))
    assert(st.count() == 1L)
  }

  test("retry no-ops byte-for-byte; an older batch id fails loudly") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_retention_retry").toString
    val ev = Tables.events(spark, sf)
    val maxId = ev.agg(max($"event_id")).head().getLong(0)
    val b0 = ev.filter($"event_id" * 2 <= maxId)
    val b1 = ev.filter($"event_id" * 2 > maxId)
    streaming.RetentionStream.retentionFold(b0, dir, 0L)
    streaming.RetentionStream.retentionFold(b1, dir, 1L)
    def snap() = (
      streaming.StateFold.readState(spark, dir).get.collect().map(_.toSeq).toSet,
      spark.read.parquet(s"$dir/days").collect().map(_.toSeq).toSet)
    val state = snap()
    streaming.RetentionStream.retentionFold(b1, dir, 1L)
    assert(snap() == state, "retry mutated the folded state")
    val e = intercept[IllegalStateException] {
      streaming.RetentionStream.retentionFold(b0, dir, 0L)
    }
    assert(e.getMessage.contains("clear the state path"))
  }

  test("crash window: days written, watermark uncommitted — re-fold heals") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_retention_crash").toString
    val ev = Tables.events(spark, sf)
    val maxId = ev.agg(max($"event_id")).head().getLong(0)
    val b0 = ev.filter($"event_id" * 2 <= maxId)
    val b1 = ev.filter($"event_id" * 2 > maxId)
    streaming.RetentionStream.retentionFold(b0, dir, 0L)
    streaming.RetentionStream.retentionFold(b1, dir, 1L)
    val clean = streaming.RetentionStream.serveRetention(spark, dir)
      .collect().map(_.toSeq).toSeq
    // reconstruct the crash: batch 1's days landed but its watermark
    // commit didn't — roll the StateFold version back and re-deliver
    val (v1, _) = streaming.StateFold.lastCommit(spark, dir).get
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/v$v1"), true)
    streaming.RetentionStream.retentionFold(b1, dir, 1L)
    val healed = streaming.RetentionStream.serveRetention(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(healed == clean, "re-delivered crash window changed the rollup")
  }

  test("monotone-frontier prune bounds state: an out-of-window day vanishes") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_retention_prune").toString
    def ts(day: Long) = java.sql.Timestamp.from(
      java.time.Instant.ofEpochSecond(day * 86400L + 3600L))
    val b0 = Seq((1L, ts(100L)), (2L, ts(100L)), (2L, ts(101L)))
      .toDF("user_id", "ts")
    val b1 = Seq((1L, ts(200L))).toDF("user_id", "ts")
    streaming.RetentionStream.retentionFold(b0, dir, 0L)
    streaming.RetentionStream.retentionFold(b1, dir, 1L)
    // u1's day 100 is 100 days behind the frontier (200) — pruned from
    // u1's bucket at its rewrite; u2's bucket may still hold its stale
    // days (cold), but serve must filter them out identically
    val served = streaming.RetentionStream.serveRetention(spark, dir)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert((1 to 62).forall(k => served(k) == (0L, 0L)),
      "out-of-window days leaked into the served rollup")
    val u1Days = spark.read.parquet(s"$dir/days")
      .filter($"user_id" === 1L).collect().map(_.getAs[Long]("day_num")).toSet
    assert(u1Days == Set(200L), s"u1's pruned bucket still holds: $u1Days")
  }
}
