package graft

import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Streaming CF-index maintenance: streamed-in-batches == one-shot
  * rebuild through the shared serve core; retry no-ops; stale state
  * fails loudly.
  */
class CfStreamSpec extends SparkSuite {

  private def seqOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSeq

  private def listens() = {
    import spark.implicits._
    val li  = Tables.lineitem(spark, sf).select($"l_orderkey", $"l_partkey")
    val ord = Tables.orders(spark, sf).select($"o_orderkey", $"o_custkey")
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .select($"o_custkey".as("user_id"), $"l_partkey".as("item_id"), $"o_orderkey")
  }

  test("streamed over 3 batches == one-shot save through the shared serve") {
    import spark.implicits._
    val all = listens()
    val inc  = Files.createTempDirectory("graft_cfstream").toString
    val full = Files.createTempDirectory("graft_cfstream_full").toString
    streaming.CfStream.cfFold(all.filter($"o_orderkey" % 3 === 0)
      .select($"user_id", $"item_id"), inc, 0L)
    streaming.CfStream.cfFold(all.filter($"o_orderkey" % 3 === 1)
      .select($"user_id", $"item_id"), inc, 1L)
    streaming.CfStream.cfFold(all.filter($"o_orderkey" % 3 === 2)
      .select($"user_id", $"item_id"), inc, 2L)
    ops.CfIndex.saveCfIndex(all.select($"user_id", $"item_id"), full)
    assert(seqOf(ops.CfIndex.serveCfNeighbors(spark, inc)) ==
      seqOf(ops.CfIndex.serveCfNeighbors(spark, full)))
    assert(seqOf(ops.CfIndex.serveCfNeighbors(spark, inc)).nonEmpty)
  }

  test("retry of the committed batch no-ops; an older batch id fails loudly") {
    import spark.implicits._
    val all = listens()
    val dir = Files.createTempDirectory("graft_cfstream_retry").toString
    val b0 = all.filter($"o_orderkey" % 2 === 0).select($"user_id", $"item_id")
    val b1 = all.filter($"o_orderkey" % 2 === 1).select($"user_id", $"item_id")
    streaming.CfStream.cfFold(b0, dir, 0L)
    streaming.CfStream.cfFold(b1, dir, 1L)
    val before = seqOf(ops.CfIndex.serveCfNeighbors(spark, dir))
    streaming.CfStream.cfFold(b1, dir, 1L) // redelivery — must not double-fold
    assert(seqOf(ops.CfIndex.serveCfNeighbors(spark, dir)) == before,
      "retry double-folded the deltas")
    val e = intercept[IllegalStateException] {
      streaming.CfStream.cfFold(b0, dir, 0L)
    }
    assert(e.getMessage.contains("clear the state path"))
  }

  test("crash between ledger append and commit marker recovers exactly-once") {
    import spark.implicits._
    val all = listens()
    val clean = Files.createTempDirectory("graft_cfstream_clean").toString
    val crashed = Files.createTempDirectory("graft_cfstream_crash").toString
    val b0 = all.filter($"o_orderkey" % 2 === 0).select($"user_id", $"item_id")
    val b1 = all.filter($"o_orderkey" % 2 === 1).select($"user_id", $"item_id")
    Seq(clean, crashed).foreach { d =>
      streaming.CfStream.cfFold(b0, d, 0L)
    }
    streaming.CfStream.cfFold(b1, clean, 1L)
    // simulate the crash window: batch 1's deltas land stamped in the
    // ledgers but the commit marker is never written
    ops.CfIndex.appendToCfIndex(b1, crashed, srcBatch = 1L)
    // the checkpoint then redelivers batch 1 — pre-round-10 this
    // double-counted every delta
    streaming.CfStream.cfFold(b1, crashed, 1L)
    assert(seqOf(ops.CfIndex.serveCfNeighbors(spark, crashed)) ==
      seqOf(ops.CfIndex.serveCfNeighbors(spark, clean)),
      "orphaned deltas must be rolled back before the re-append")
    assert(seqOf(ops.CfIndex.serveCfUserTopn(spark, crashed)) ==
      seqOf(ops.CfIndex.serveCfUserTopn(spark, clean)))
  }
}
