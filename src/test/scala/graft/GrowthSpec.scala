package graft

import org.apache.spark.sql.functions._

/** Monthly growth accounting: a hand-built lifecycle (gap, churn,
  * resurrection, right-censoring), the MAU identity, and corpus
  * conservation invariants.
  */
class GrowthSpec extends SparkSuite {

  private def acct(rows: Seq[(Long, Long)]) = {
    import spark.implicits._
    core.GrowthQueries.growthAccountingOn(rows.toDF("user_id", "ym"))
      .withColumn("ym", $"year" * 12 + $"month" - 1)
      .collect().map(r => r.getAs[Long]("ym") -> r).toMap
  }

  test("hand-built lifecycle: new, retained, gap-resurrection, churn, censoring") {
    // A active months 100,101,103; B active 101 only; corpus ends at 103
    val m = acct(Seq((1L, 100L), (1L, 101L), (1L, 103L), (2L, 101L)))
    assert(m(100L).getAs[Long]("n_new") == 1L && m(100L).getAs[Long]("mau") == 1L)
    assert(m(101L).getAs[Long]("n_new") == 1L)
    assert(m(101L).getAs[Long]("n_retained") == 1L)
    assert(m(101L).getAs[Long]("mau") == 2L)
    // both A (gap) and B (gone) churn in 102; nobody is active there
    assert(m(102L).getAs[Long]("n_churned") == 2L)
    assert(m(102L).getAs[Long]("mau") == 0L)
    assert(m(102L).getAs[Double]("quick_ratio") == 0.0)
    // A resurrects in 103; no churn emitted past the corpus end
    assert(m(103L).getAs[Long]("n_resurrected") == 1L)
    assert(m(103L).getAs[Long]("n_churned") == 0L)
    assert(!m.contains(104L), "churn beyond the last month is unknowable")
    // months with no churn have NULL quick ratio
    assert(m(101L).isNullAt(m(101L).fieldIndex("quick_ratio")))
  }

  test("streamed activity set over 2 batches == batch decomposition bit-for-bit") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_growth_stream").toString
    val ord = Tables.orders(spark, sf)
    // split by order-key PARITY (cuts across months and users)
    streaming.GrowthStream.growthFold(ord.filter($"o_orderkey" % 2 === 0), dir, 0L)
    streaming.GrowthStream.growthFold(ord.filter($"o_orderkey" % 2 === 1), dir, 1L)
    val served = streaming.GrowthStream.serveGrowth(spark, dir)
      .collect().map(_.toSeq).toSeq
    val batch = core.GrowthQueries.dmGrowthAccounting(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(served == batch && served.nonEmpty)
    // a replayed batch cannot inflate the activity set (union idempotent)
    streaming.GrowthStream.growthFold(ord.filter($"o_orderkey" % 2 === 1), dir, 1L)
    assert(streaming.GrowthStream.serveGrowth(spark, dir)
      .collect().map(_.toSeq).toSeq == batch)
  }

  test("corpus: mau identity, every-user-new-once, churn conservation") {
    import spark.implicits._
    val rows = core.GrowthQueries.dmGrowthAccounting(spark, sf).collect()
    assert(rows.length > 12, "the order calendar spans years")
    val um = Tables.orders(spark, sf)
      .select($"o_custkey".as("user_id"),
        (year($"o_orderdate") * 12 + month($"o_orderdate") - 1).cast("long").as("ym"))
      .distinct()
    val mauTruth = um.groupBy($"ym").agg(count(lit(1)).as("mau"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val ym = r.getAs[Long]("year") * 12 + r.getAs[Long]("month") - 1
      assert(r.getAs[Long]("mau") == mauTruth.getOrElse(ym, 0L),
        s"mau mismatch at $ym")
      assert(r.getAs[Long]("mau") ==
        r.getAs[Long]("n_new") + r.getAs[Long]("n_retained") + r.getAs[Long]("n_resurrected"))
    }
    val totalNew = rows.map(_.getAs[Long]("n_new")).sum
    assert(totalNew == um.select($"user_id").distinct().count(),
      "every user is new exactly once")
  }
}
