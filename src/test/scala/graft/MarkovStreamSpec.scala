package graft

import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Streaming Markov fold: batch-boundary transitions are counted exactly
  * once (the carried per-user last event), parity with the batch matrix,
  * and the state guard paths.
  */
class MarkovStreamSpec extends SparkSuite {

  test("streamed over 3 ordered batches == batch transition matrix (boundary pairs included)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_markov").toString
    val ev = Tables.events(spark, sf)
    val maxId = ev.agg(max($"event_id")).head().getLong(0)
    val cuts = Seq(maxId / 3, 2 * maxId / 3, maxId)
    cuts.zip(-1L +: cuts.dropRight(1)).zipWithIndex.foreach { case ((hi, lo), i) =>
      streaming.MarkovStream.markovFold(
        ev.filter($"event_id" > lo && $"event_id" <= hi), dir, i.toLong)
    }
    val streamed = streaming.MarkovStream.serveTransitions(spark, dir)
      .collect().map(_.toSeq).toSeq
    val batch = core.EngagementQueries.eventsMarkovTransitions(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(streamed == batch, "streamed fold diverges from the batch matrix")
    assert(batch.nonEmpty)
    // the boundary pairs are real: per-batch windows alone undercount —
    // every user active in 2+ batches contributes at least one
    val perBatchOnly = cuts.zip(-1L +: cuts.dropRight(1)).map { case (hi, lo) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"user_id").orderBy($"ts", $"event_id")
      ev.filter($"event_id" > lo && $"event_id" <= hi)
        .withColumn("nt", lead($"event_type", 1).over(w))
        .filter($"nt".isNotNull).count()
    }.sum
    val total = batch.map(_(2).asInstanceOf[Long]).sum
    assert(total > perBatchOnly, "fixture has no cross-boundary transitions")
  }

  test("retry no-ops; an older batch id fails loudly") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_markov_retry").toString
    val ev = Tables.events(spark, sf)
    val maxId = ev.agg(max($"event_id")).head().getLong(0)
    val b0 = ev.filter($"event_id" * 2 <= maxId)
    val b1 = ev.filter($"event_id" * 2 > maxId)
    streaming.MarkovStream.markovFold(b0, dir, 0L)
    streaming.MarkovStream.markovFold(b1, dir, 1L)
    val state = spark.read.parquet(s"$dir/state").collect().map(_.toSeq).toSet
    streaming.MarkovStream.markovFold(b1, dir, 1L)
    assert(spark.read.parquet(s"$dir/state").collect().map(_.toSeq).toSet == state,
      "retry mutated the folded state")
    val e = intercept[IllegalStateException] {
      streaming.MarkovStream.markovFold(b0, dir, 0L)
    }
    assert(e.getMessage.contains("clear the state path"))
  }
}
