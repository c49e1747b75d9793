package graft

import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Streaming drift screen: folded state serves the SAME verdicts as the
  * batch entry; retry no-ops; stale state fails loudly.
  */
class DriftSpec extends SparkSuite {

  test("streamed current window over 2 batches == batch dq_drift_chi2 verdicts") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_drift").toString
    val (ref, _) = etl.DataQuality.refCurCounts(spark, sf)
    // the current window, replayed as two micro-batches split on event_id
    val ev = Tables.events(spark, sf).select($"event_id", $"event_type")
    val maxId = ev.agg(max($"event_id")).head().getLong(0)
    val cur = ev.filter($"event_id" * 2 > maxId)
    val mid = (maxId / 2 + maxId) / 2
    streaming.DriftStream.driftFold(cur.filter($"event_id" <= mid), dir, 0L)
    streaming.DriftStream.driftFold(cur.filter($"event_id" > mid), dir, 1L)
    val streamed = streaming.DriftStream.serveDrift(spark, dir, ref)
      .collect().map(_.toSeq).toSeq
    val batch = etl.DataQuality.dqDriftChi2(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(streamed == batch, "streamed fold diverges from the batch entry")
    assert(batch.nonEmpty)
  }

  test("retry of the last committed batch no-ops; an older batch id fails loudly") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_drift_retry").toString
    val ev = Tables.events(spark, sf).select($"event_id", $"event_type")
    val b0 = ev.filter($"event_id" % 2 === 0)
    val b1 = ev.filter($"event_id" % 2 === 1)
    streaming.DriftStream.driftFold(b0, dir, 0L)
    streaming.DriftStream.driftFold(b1, dir, 1L)
    val state = streaming.StateFold.readState(spark, dir).get
      .collect().map(_.toSeq).toSet
    streaming.DriftStream.driftFold(b1, dir, 1L) // retry — already folded
    assert(streaming.StateFold.readState(spark, dir).get.collect().map(_.toSeq).toSet == state,
      "retry mutated the folded counts")
    // an out-of-order OLD batch id means the checkpoint and state diverged
    val e = intercept[IllegalStateException] {
      streaming.DriftStream.driftFold(b0, dir, 0L)
    }
    assert(e.getMessage.contains("clear the state path"))
  }

  test("benford: streamed fold over 2 batches == batch screen bit-for-bit; retry no-ops") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_benford").toString
    val ord = Tables.orders(spark, sf)
    val maxId = ord.agg(max($"o_orderkey")).head().getLong(0)
    val b0 = ord.filter($"o_orderkey" * 2 <= maxId)
    val b1 = ord.filter($"o_orderkey" * 2 > maxId)
    streaming.DriftStream.benfordFold(b0, dir, 0L)
    streaming.DriftStream.benfordFold(b1, dir, 1L)
    val streamed = streaming.DriftStream.serveBenford(spark, dir)
      .collect().map(_.toSeq).toSeq
    val batch = etl.DataQuality.dqBenford(spark, sf).collect().map(_.toSeq).toSeq
    assert(streamed == batch, "streamed benford diverges from the batch screen")
    assert(batch.length == 9)
    val state = streaming.StateFold.readState(spark, dir).get.collect().map(_.toSeq).toSet
    streaming.DriftStream.benfordFold(b1, dir, 1L) // redelivery
    assert(streaming.StateFold.readState(spark, dir).get.collect().map(_.toSeq).toSet == state,
      "retry mutated the digit counts")
  }
}
