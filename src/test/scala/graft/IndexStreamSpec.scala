package graft

import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Streaming IVF-PQ ingest + health monitor: appended batches are
  * idempotent and fully covered; in-distribution batches stay under the
  * cell-skew bar while a planted distribution shift fires the alert;
  * the state guard no-ops retries and fails loudly on stale state.
  */
class IndexStreamSpec extends SparkSuite {

  private def freshIndex(): String = {
    val dir = Files.createTempDirectory("graft_ixs").toString
    ops.VectorAgg.saveIvfPqIndex(spark, sf, s"$dir/index")
    dir
  }

  private def emb() = Tables.embeddings(spark, sf)

  test("in-distribution batches append idempotently, covered, no skew alert") {
    import spark.implicits._
    val dir = freshIndex()
    val (ix, st) = (s"$dir/index", s"$dir/mon")
    // two batches drawn from the corpus distribution, new ids
    val b0 = emb().filter($"vec_id" % 5 === 1).select(($"vec_id" + 10000).as("vec_id"), $"embedding")
    val b1 = emb().filter($"vec_id" % 5 === 2).select(($"vec_id" + 20000).as("vec_id"), $"embedding")
    streaming.IndexStream.ingestFold(b0, ix, st, 0L)
    streaming.IndexStream.ingestFold(b1, ix, st, 1L)
    val health = streaming.IndexStream.serveIndexHealth(spark, ix, st).collect()
    assert(health.length == 2)
    assert(health.forall(_.getAs[Boolean]("coverage_ok")))
    assert(health.forall(!_.getAs[Boolean]("skew_alert")),
      s"in-distribution batch fired the skew alert: ${health.map(_.getAs[Double]("max_share")).toSeq}")
    val listed = spark.read.parquet(s"$ix/lists").count()
    // replay batch 1 (redelivery) — appends nothing, monitor unchanged
    streaming.IndexStream.ingestFold(b1, ix, st, 1L)
    assert(spark.read.parquet(s"$ix/lists").count() == listed, "replay grew the index")
    // served queries still flow from the grown index (parity with the
    // from-index serve path over the original corpus queries)
    val served = ops.VectorAgg.annTopkIvfPqFromIndex(spark, sf, ix)
    assert(served.count() > 0)
  }

  test("a distribution-shifted batch concentrates into one stale cell and fires the alert") {
    import spark.implicits._
    val dir = freshIndex()
    val (ix, st) = (s"$dir/index", s"$dir/mon")
    val inDist = emb().filter($"vec_id" % 5 === 1)
      .select(($"vec_id" + 10000).as("vec_id"), $"embedding")
    val shifted = emb().filter($"vec_id" % 5 === 2)
      .select(($"vec_id" + 20000).as("vec_id"),
        transform($"embedding", x => x + lit(50.0f)).as("embedding"))
    streaming.IndexStream.ingestFold(inDist, ix, st, 0L)
    streaming.IndexStream.ingestFold(shifted, ix, st, 1L)
    val health = streaming.IndexStream.serveIndexHealth(spark, ix, st)
      .collect().map(r => r.getAs[Long]("batch_id") ->
        ((r.getAs[Double]("max_share"), r.getAs[Boolean]("skew_alert")))).toMap
    assert(!health(0L)._2, s"in-distribution batch alerted: share ${health(0L)._1}")
    assert(health(1L)._2, s"shifted batch did not alert: share ${health(1L)._1}")
    assert(health(1L)._1 > health(0L)._1 + 0.2,
      "shift must concentrate assignments far beyond the in-distribution profile")
  }

  test("retry no-ops; an older batch id fails loudly") {
    import spark.implicits._
    val dir = freshIndex()
    val (ix, st) = (s"$dir/index", s"$dir/mon")
    val b0 = emb().filter($"vec_id" % 5 === 1).select(($"vec_id" + 10000).as("vec_id"), $"embedding")
    val b1 = emb().filter($"vec_id" % 5 === 2).select(($"vec_id" + 20000).as("vec_id"), $"embedding")
    streaming.IndexStream.ingestFold(b0, ix, st, 0L)
    streaming.IndexStream.ingestFold(b1, ix, st, 1L)
    val state = streaming.StateFold.readState(spark, st).get.collect().map(_.toSeq).toSet
    streaming.IndexStream.ingestFold(b1, ix, st, 1L) // retry
    assert(streaming.StateFold.readState(spark, st).get.collect().map(_.toSeq).toSet == state)
    val e = intercept[IllegalStateException] {
      streaming.IndexStream.ingestFold(b0, ix, st, 0L)
    }
    assert(e.getMessage.contains("clear the state path"))
  }
}
