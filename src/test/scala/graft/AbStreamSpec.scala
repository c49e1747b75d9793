package graft

import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Streaming A/B value-histogram fold: ONE state, two tests (Welch t
  * and Mann–Whitney U), both bit-identical to their batch entries over
  * any batch split; retry no-ops; stale state fails loudly.
  */
class AbStreamSpec extends SparkSuite {

  private def seqOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSeq

  test("streamed over 3 batches == batch Welch AND Mann-Whitney bit-for-bit") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_abstream").toString
    val ev = Tables.events(spark, sf)
    // cut ACROSS types/values (event_id mod) so histogram counts must merge
    streaming.AbStream.histFold(ev.filter($"event_id" % 3 === 0), dir, 0L)
    streaming.AbStream.histFold(ev.filter($"event_id" % 3 === 1), dir, 1L)
    streaming.AbStream.histFold(ev.filter($"event_id" % 3 === 2), dir, 2L)
    val welch = seqOf(streaming.AbStream.serveWelch(spark, dir)
      .orderBy($"event_type"))
    assert(welch == seqOf(core.StatsQueries.eventsAbWelch(spark, sf)) &&
      welch.nonEmpty)
    val mw = seqOf(streaming.AbStream.serveMannWhitney(spark, dir)
      .orderBy($"event_type"))
    assert(mw == seqOf(core.RankTests.eventsAbMannWhitney(spark, sf)) &&
      mw.nonEmpty)
    val ks = seqOf(streaming.AbStream.serveKs(spark, dir)
      .orderBy($"event_type"))
    assert(ks == seqOf(core.RankTests.eventsAbKs(spark, sf)) && ks.nonEmpty)
  }

  test("streamed daily-moments state == batch sequential readout bit-for-bit") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_abdaily").toString
    val ev = Tables.events(spark, sf)
    // cut ACROSS days (event_id mod, not a time split) so per-(type, day)
    // moments must merge additively across batches
    streaming.AbStream.dailyMomentsFold(ev.filter($"event_id" % 3 === 0), dir, 0L)
    streaming.AbStream.dailyMomentsFold(ev.filter($"event_id" % 3 === 1), dir, 1L)
    streaming.AbStream.dailyMomentsFold(ev.filter($"event_id" % 3 === 2), dir, 2L)
    val served = seqOf(streaming.AbStream.serveSequential(spark, dir))
    assert(served == seqOf(core.RankTests.eventsAbSequential(spark, sf)) &&
      served.nonEmpty)
    // the daily state rides the same guarded fold: a retry must no-op
    streaming.AbStream.dailyMomentsFold(ev.filter($"event_id" % 3 === 2), dir, 2L)
    assert(seqOf(streaming.AbStream.serveSequential(spark, dir)) == served,
      "retry mutated the daily moments state")
  }

  test("retry of the last batch no-ops; an older batch id fails loudly") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_abstream_retry").toString
    val ev = Tables.events(spark, sf)
    val b0 = ev.filter($"event_id" % 2 === 0)
    val b1 = ev.filter($"event_id" % 2 === 1)
    streaming.AbStream.histFold(b0, dir, 0L)
    streaming.AbStream.histFold(b1, dir, 1L)
    val state = streaming.StateFold.readState(spark, dir).get
      .collect().map(_.toSeq).toSet
    streaming.AbStream.histFold(b1, dir, 1L) // retry — already folded
    assert(streaming.StateFold.readState(spark, dir).get
      .collect().map(_.toSeq).toSet == state, "retry mutated the histogram")
    val e = intercept[IllegalStateException] {
      streaming.AbStream.histFold(b0, dir, 0L)
    }
    assert(e.getMessage.contains("clear the state path"))
  }
}
