package graft

import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Streaming sufficient-statistics fold: bit-identical to the batch
  * Pearson/OLS entry over any batch split (exact integer state + the
  * shared IEEE estimator tree); retry no-ops; stale state fails loudly.
  */
class StatsStreamSpec extends SparkSuite {

  test("streamed over 3 batches == batch events_value_corr bit-for-bit") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_corrstream").toString
    val ev = Tables.events(spark, sf)
    streaming.StatsStream.corrFold(ev.filter($"event_id" % 3 === 0), dir, 0L)
    streaming.StatsStream.corrFold(ev.filter($"event_id" % 3 === 1), dir, 1L)
    streaming.StatsStream.corrFold(ev.filter($"event_id" % 3 === 2), dir, 2L)
    val streamed = streaming.StatsStream.serveCorr(spark, dir)
      .collect().map(_.toSeq).toSeq
    val batch = core.StatsQueries.eventsValueCorr(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(streamed == batch,
      "streamed sufficient-statistics fold diverges from the batch entry")
    assert(batch.nonEmpty)
    // the statistics are real numbers, not NaN artifacts
    val rs = streaming.StatsStream.serveCorr(spark, dir)
      .collect().map(_.getAs[Double]("pearson_r"))
    assert(rs.forall(r => !r.isNaN && r.abs <= 1.0))
  }

  test("retry of the last committed batch no-ops; an older batch id fails loudly") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_corrstream_retry").toString
    val ev = Tables.events(spark, sf)
    val b0 = ev.filter($"event_id" % 2 === 0)
    val b1 = ev.filter($"event_id" % 2 === 1)
    streaming.StatsStream.corrFold(b0, dir, 0L)
    streaming.StatsStream.corrFold(b1, dir, 1L)
    val state = streaming.StateFold.readState(spark, dir).get.collect().map(_.toSeq).toSet
    streaming.StatsStream.corrFold(b1, dir, 1L) // retry — already folded
    assert(streaming.StateFold.readState(spark, dir).get.collect().map(_.toSeq).toSet == state,
      "retry mutated the folded sums")
    val e = intercept[IllegalStateException] {
      streaming.StatsStream.corrFold(b0, dir, 0L)
    }
    assert(e.getMessage.contains("clear the state path"))
  }
}
