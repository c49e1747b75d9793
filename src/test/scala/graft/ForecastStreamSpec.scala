package graft

import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Streaming daily-count fold: SES, Holt, and ACF served from state are
  * bit-identical to their batch entries over any batch split (exact
  * integer state + shared IEEE cores); retry no-ops; stale state fails
  * loudly.
  */
class ForecastStreamSpec extends SparkSuite {

  private def seqOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSeq

  test("streamed over 3 batches == batch SES/Holt/ACF bit-for-bit") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_fcstream").toString
    val ev = Tables.events(spark, sf)
    // split cuts ACROSS days (event_id mod), so per-day counts must merge
    streaming.ForecastStream.dailyFold(ev.filter($"event_id" % 3 === 0), dir, 0L)
    streaming.ForecastStream.dailyFold(ev.filter($"event_id" % 3 === 1), dir, 1L)
    streaming.ForecastStream.dailyFold(ev.filter($"event_id" % 3 === 2), dir, 2L)
    assert(seqOf(streaming.ForecastStream.serveSes(spark, dir)) ==
      seqOf(core.StatsQueries.eventsForecastSes(spark, sf)))
    assert(seqOf(streaming.ForecastStream.serveHolt(spark, dir)) ==
      seqOf(core.HoltForecast.eventsForecastHolt(spark, sf)))
    assert(seqOf(streaming.ForecastStream.serveAcf(spark, dir)) ==
      seqOf(core.StatsQueries.eventsAutocorr(spark, sf)))
    assert(seqOf(streaming.ForecastStream.serveHolt(spark, dir)).nonEmpty)
  }

  test("retry of the last committed batch no-ops; an older batch id fails loudly") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_fcstream_retry").toString
    val ev = Tables.events(spark, sf)
    val b0 = ev.filter($"event_id" % 2 === 0)
    val b1 = ev.filter($"event_id" % 2 === 1)
    streaming.ForecastStream.dailyFold(b0, dir, 0L)
    streaming.ForecastStream.dailyFold(b1, dir, 1L)
    val state = streaming.StateFold.readState(spark, dir).get.collect().map(_.toSeq).toSet
    streaming.ForecastStream.dailyFold(b1, dir, 1L) // retry — already folded
    assert(streaming.StateFold.readState(spark, dir).get.collect().map(_.toSeq).toSet == state,
      "retry mutated the folded counts")
    val e = intercept[IllegalStateException] {
      streaming.ForecastStream.dailyFold(b0, dir, 0L)
    }
    assert(e.getMessage.contains("clear the state path"))
  }
}
