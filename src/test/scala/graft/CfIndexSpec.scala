package graft

import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Persisted CF index: append == rebuild exactly (including a
  * cap-crossing append that must roll back a displaced item's pairs),
  * serve == the in-session neighbor entry, and the serve plan reads
  * only the ledgers — never the fact tables.
  */
class CfIndexSpec extends SparkSuite {

  private def seqOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSeq

  test("persisted entry == in-session rec_item_item_cf row-for-row") {
    val served = seqOf(ops.CfIndex.recItemItemCfPersisted(spark, sf))
    val inSess = seqOf(ops.Recommend.recItemItemCf(spark, sf))
    assert(served == inSess)
    assert(served.nonEmpty)
  }

  test("append == rebuild on a split that crosses users and items") {
    import spark.implicits._
    val li  = Tables.lineitem(spark, sf).select($"l_orderkey", $"l_partkey")
    val ord = Tables.orders(spark, sf).select($"o_orderkey", $"o_custkey")
    val all = li.join(ord, $"l_orderkey" === $"o_orderkey")
      .select($"o_custkey".as("user_id"), $"l_partkey".as("item_id"), $"o_orderkey")
    val full = Files.createTempDirectory("graft_cf_full").toString
    val inc  = Files.createTempDirectory("graft_cf_inc").toString
    ops.CfIndex.saveCfIndex(all.select($"user_id", $"item_id"), full)
    ops.CfIndex.saveCfIndex(
      all.filter($"o_orderkey" % 3 =!= 0).select($"user_id", $"item_id"), inc)
    ops.CfIndex.appendToCfIndex(
      all.filter($"o_orderkey" % 3 === 0).select($"user_id", $"item_id"), inc)
    assert(seqOf(ops.CfIndex.serveCfNeighbors(spark, full)) ==
      seqOf(ops.CfIndex.serveCfNeighbors(spark, inc)))
  }

  test("a cap-crossing append rolls back the displaced item's pairs exactly") {
    import spark.implicits._
    val K = ops.Recommend.maxItemsPerUser
    // user 1 sits exactly at the cap; the appended batch pushes a brand-new
    // item above the weakest capped item (by listen count), displacing it.
    // users 2..4 provide co-listeners so pairs survive the min-co floor.
    def listensRows(withBoost: Boolean) = {
      val base =
        (1 to K).flatMap(i => Seq.fill(2)((1L, i.toLong))) ++        // user 1: items 1..K, 2 listens each
        (2 to 4).flatMap(u => (1 to 10).map(i => (u.toLong, i.toLong))) ++
        (2 to 4).map(u => (u.toLong, 9999L))                          // co-listeners for the new item
      val boost = Seq.fill(5)((1L, 9999L))                            // 5 listens: beats every 2-listen item
      (if (withBoost) base ++ boost else base)
    }
    val before = listensRows(withBoost = false).toDF("user_id", "item_id")
    val boostBatch = Seq.fill(5)((1L, 9999L)).toDF("user_id", "item_id")
    val inc  = Files.createTempDirectory("graft_cf_cap_inc").toString
    val full = Files.createTempDirectory("graft_cf_cap_full").toString
    ops.CfIndex.saveCfIndex(before, inc)
    ops.CfIndex.appendToCfIndex(boostBatch, inc)
    ops.CfIndex.saveCfIndex(listensRows(withBoost = true).toDF("user_id", "item_id"), full)
    val served = seqOf(ops.CfIndex.serveCfNeighbors(spark, inc))
    assert(served == seqOf(ops.CfIndex.serveCfNeighbors(spark, full)))
    // the displacement actually happened: item 9999 entered user 1's capped
    // set (it now co-occurs with user 1's items), and the weakest old item
    // (id K, ties break by id asc so the HIGHEST id drops) lost user 1
    val nu = spark.read.parquet(s"$inc/nu")
      .groupBy($"item_id").agg(sum($"d").as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(nu(9999L) == 4L, "new item audience = user 1 + the 3 co-listeners")
    assert(nu(K.toLong) == 0L, s"displaced item $K must have rolled back to 0")
  }

  test("compaction shrinks the ledgers and serves bit-identically") {
    import spark.implicits._
    val all = listensAll()
    val dir = Files.createTempDirectory("graft_cf_compact").toString
    ops.CfIndex.saveCfIndex(all.filter($"o_orderkey" % 3 =!= 0).select($"user_id", $"item_id"), dir)
    ops.CfIndex.appendToCfIndex(all.filter($"o_orderkey" % 3 === 0).select($"user_id", $"item_id"), dir)
    val before = seqOf(ops.CfIndex.serveCfNeighbors(spark, dir))
    val report = ops.CfIndex.compactCfIndex(spark, dir)
    assert(seqOf(ops.CfIndex.serveCfNeighbors(spark, dir)) == before,
      "compaction changed the served neighbor table")
    assert(report("co")._2 <= report("co")._1 && report("co")._2 >= 1)
    assert(report.values.forall(_._2 == 1), "each ledger must compact to one file")
    // idempotent: a second compaction is a no-op in content
    ops.CfIndex.compactCfIndex(spark, dir)
    assert(seqOf(ops.CfIndex.serveCfNeighbors(spark, dir)) == before)
  }

  test("user top-N served from the ledgers == in-session rec_user_topn") {
    val served = seqOf(ops.CfIndex.recUserTopnPersisted(spark, sf))
    val inSess = seqOf(ops.Recommend.recUserTopn(spark, sf))
    assert(served == inSess)
    assert(served.nonEmpty)
  }

  private def listensAll() = {
    import spark.implicits._
    val li  = Tables.lineitem(spark, sf).select($"l_orderkey", $"l_partkey")
    val ord = Tables.orders(spark, sf).select($"o_orderkey", $"o_custkey")
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .select($"o_custkey".as("user_id"), $"l_partkey".as("item_id"), $"o_orderkey")
  }

  test("serve plan reads only the ledgers, never the fact tables") {
    val df = ops.CfIndex.recItemItemCfPersisted(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("lineitem") && !plan.contains("orders"),
      "serve must not scan fact tables")
    assert(plan.contains("graft_cf_index"), "serve must scan the persisted ledgers")
  }
}
