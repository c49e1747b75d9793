package graft

import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Streaming last-touch attribution: the channel rollup folded over
  * event-id thirds (the per-user event-time delivery contract) must be
  * bit-identical to the batch entry; credits obey the conservation law
  * Σchannel == Σpurchase; the StateFold guard paths hold; and the
  * crash window between the touch write-ahead and the rollup commit
  * re-folds to the identical rollup (last-touch credit is an argmax,
  * invariant under the retry's duplicated touches).
  */
class AttributionStreamSpec extends SparkSuite {

  private def foldThirds(statePath: String): Unit = {
    import spark.implicits._
    val ev = Tables.events(spark, sf)
    val maxId = ev.agg(max($"event_id")).head().getLong(0)
    val cuts = Seq(maxId / 3, 2 * maxId / 3, maxId)
    cuts.zip(-1L +: cuts.dropRight(1)).zipWithIndex.foreach { case ((hi, lo), i) =>
      streaming.AttributionStream.attributionFold(
        ev.filter($"event_id" > lo && $"event_id" <= hi), statePath, i.toLong)
    }
  }

  test("streamed over 3 ordered batches == batch events_attribution_channel bit-for-bit") {
    val dir = Files.createTempDirectory("graft_attrstream").toString
    foldThirds(dir)
    val streamed = streaming.AttributionStream.serveChannels(spark, dir)
      .collect().map(_.toSeq).toSeq
    val batch = core.AttributionQueries.eventsAttributionChannel(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(streamed == batch,
      "streamed last-touch rollup diverges from the batch entry")
    assert(batch.nonEmpty)
  }

  test("streamed position model == batch events_attribution_position bit-for-bit") {
    val dir = Files.createTempDirectory("graft_attrstream_pos").toString
    foldThirds(dir)
    val streamed = streaming.AttributionStream.servePositionChannels(spark, dir)
      .collect().map(_.toSeq).toSeq
    val batch = core.AttributionQueries.eventsAttributionPosition(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(streamed == batch,
      "streamed position rollup diverges from the batch entry")
    assert(batch.nonEmpty)
    // conservation holds through the stream too: largest-remainder
    // credits partition every purchase exactly
    import spark.implicits._
    val total = Tables.events(spark, sf).filter($"event_type" === "purchase")
      .select(($"value".cast("decimal(10,2)") * 100).cast("long").as("cents"))
      .agg(sum($"cents")).head().getLong(0)
    assert(streamed.map(_(2).asInstanceOf[Long]).sum == total,
      "streamed position credits must sum to total purchase cents")
  }

  test("conservation: channel credits partition the purchases exactly") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_attrstream_cons").toString
    foldThirds(dir)
    val rollup = streaming.AttributionStream.serveChannels(spark, dir).collect()
    val purchases = Tables.events(spark, sf).filter($"event_type" === "purchase")
      .select(($"value".cast("decimal(10,2)") * 100).cast("long").as("cents"))
      .agg(count(lit(1)), sum($"cents")).head()
    assert(rollup.map(_.getLong(1)).sum == purchases.getLong(0),
      "every purchase lands in exactly one channel")
    assert(rollup.map(_.getLong(2)).sum == purchases.getLong(1),
      "attributed cents must sum to total purchase cents")
  }

  test("retry of the last committed batch no-ops; an older batch id fails loudly") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_attrstream_retry").toString
    val ev = Tables.events(spark, sf)
    val maxId = ev.agg(max($"event_id")).head().getLong(0)
    val b0 = ev.filter($"event_id" <= maxId / 2)
    val b1 = ev.filter($"event_id" > maxId / 2)
    streaming.AttributionStream.attributionFold(b0, dir, 0L)
    streaming.AttributionStream.attributionFold(b1, dir, 1L)
    val state = streaming.AttributionStream.serveChannels(spark, dir)
      .collect().map(_.toSeq).toSet
    streaming.AttributionStream.attributionFold(b1, dir, 1L) // retry
    assert(streaming.AttributionStream.serveChannels(spark, dir)
      .collect().map(_.toSeq).toSet == state, "retry mutated the rollup")
    val e = intercept[IllegalStateException] {
      streaming.AttributionStream.attributionFold(b0, dir, 0L)
    }
    assert(e.getMessage.contains("clear the state path"))
  }

  test("crash window: touches written, rollup uncommitted — re-fold lands identically") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_attrstream_crash").toString
    val ev = Tables.events(spark, sf)
    val maxId = ev.agg(max($"event_id")).head().getLong(0)
    val b0 = ev.filter($"event_id" <= maxId / 2)
    val b1 = ev.filter($"event_id" > maxId / 2)
    streaming.AttributionStream.attributionFold(b0, dir, 0L)
    // snapshot v0 — the clean fold of batch 1 prunes it after
    // committing, but a REAL crash between the touch write-ahead and
    // the v1 commit happens before that prune, leaving v0 intact
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val conf = spark.sparkContext.hadoopConfiguration
    val saved = Files.createTempDirectory("graft_attrstream_v0").toString
    org.apache.hadoop.fs.FileUtil.copy(fs,
      new org.apache.hadoop.fs.Path(s"$dir/v0"), fs,
      new org.apache.hadoop.fs.Path(s"$saved/v0"), false, conf)
    streaming.AttributionStream.attributionFold(b1, dir, 1L)
    val want = streaming.AttributionStream.serveChannels(spark, dir)
      .collect().map(_.toSeq).toSeq
    val wantPos = streaming.AttributionStream.servePositionChannels(spark, dir)
      .collect().map(_.toSeq).toSeq
    // reconstruct the crash state: batch 1's touch rewrite stays, its
    // rollup commit vanishes, the pre-batch state is still committed
    assert(fs.delete(new org.apache.hadoop.fs.Path(s"$dir/v1"), true))
    org.apache.hadoop.fs.FileUtil.copy(fs,
      new org.apache.hadoop.fs.Path(s"$saved/v0"), fs,
      new org.apache.hadoop.fs.Path(s"$dir/v0"), false, conf)
    streaming.AttributionStream.attributionFold(b1, dir, 1L) // the retry
    val got = streaming.AttributionStream.serveChannels(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(got == want,
      "half-committed retry must re-derive the identical rollup " +
        "(argmax credit is duplication-invariant)")
    val gotPos = streaming.AttributionStream.servePositionChannels(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(gotPos == wantPos,
      "position credits must also survive the crash window " +
        "(deterministic function of the deduped touch set)")
  }
}
