package graft

import org.apache.spark.sql.functions._

import java.nio.file.Files

/** The GDPR request stream: two purge batches through the doc stores
  * must leave every index equal to a rebuild without the purged docs;
  * retries and the crash window are absorbed by the delete ops' own
  * idempotence; the watermark state counts exactly once.
  */
class PurgeStreamSpec extends SparkSuite {

  private def buildIndexes(docs: org.apache.spark.sql.DataFrame):
      (String, String, String) = {
    val posting = Files.createTempDirectory("graft_purge_posting").toString
    val positional = Files.createTempDirectory("graft_purge_positional").toString
    val band = Files.createTempDirectory("graft_purge_band").toString
    ops.LlmQueries.savePostingIndexOf(docs, posting)
    ops.PhraseSearch.savePositionalIndexOf(docs, positional)
    ops.ScaleDedup.saveBandIndexOf(docs, band)
    (posting, positional, band)
  }

  test("two purge batches == rebuild-without-docs across all three doc stores; watermark exact") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf).select($"doc_id", $"lang", $"text")
      .localCheckpoint()
    val b1 = docs.select($"doc_id").filter($"doc_id" % 17 === 0)
    val b2 = docs.select($"doc_id").filter($"doc_id" % 19 === 0)
    val allGone = b1.union(b2).distinct().collect().map(_.getLong(0)).toSeq
    assert(allGone.nonEmpty)

    val (posting, positional, band) = buildIndexes(docs)
    val (postingRef, positionalRef, bandRef) =
      buildIndexes(docs.filter(!$"doc_id".isin(allGone: _*)))
    val state = Files.createTempDirectory("graft_purge_state").toString

    streaming.PurgeStream.docPurgeFold(b1.toDF(), posting, positional, band, state, 0L)
    streaming.PurgeStream.docPurgeFold(b2.toDF(), posting, positional, band, state, 1L)

    def rowsOf(p: String, sub: String, cols: Seq[String]) =
      spark.read.parquet(s"$p/$sub").select(cols.map(col): _*)
        .collect().map(_.toSeq).toSet
    assert(rowsOf(posting, "postings", Seq("doc_id", "term", "tf")) ==
      rowsOf(postingRef, "postings", Seq("doc_id", "term", "tf")))
    assert(rowsOf(posting, "norms", Seq("doc_id", "dl")) ==
      rowsOf(postingRef, "norms", Seq("doc_id", "dl")))
    assert(rowsOf(positional, "positions", Seq("doc_id", "term", "pos")) ==
      rowsOf(positionalRef, "positions", Seq("doc_id", "term", "pos")))
    // band store is tombstoned, not rewritten — the serve path must agree
    assert(ops.ScaleDedup.dedupIncrementalBandedFromIndex(spark, sf, band)
      .collect().map(_.toSeq).toSeq ==
      ops.ScaleDedup.dedupIncrementalBandedFromIndex(spark, sf, bandRef)
        .collect().map(_.toSeq).toSeq)

    val st = streaming.PurgeStream.servePurgeState(spark, state).head()
    assert(st.getAs[Long]("last_batch_id") == 1L)
    // the watermark counts per-batch REQUESTS (a cross-batch distinct
    // would need unbounded purged-id state; a doc requested twice is
    // two requests, the second a no-op on the stores)
    val wantCount = b1.distinct().count() + b2.distinct().count()
    assert(st.getAs[Long]("n_purged") == wantCount,
      "watermark must count each batch's requests exactly once")
  }

  test("user-grain purge: cf serve == rebuild-without-users; layout purged; crash window absorbed") {
    import spark.implicits._
    val li  = Tables.lineitem(spark, sf).select($"l_orderkey", $"l_partkey")
    val ord = Tables.orders(spark, sf).select($"o_orderkey", $"o_custkey")
    val listens = li.join(ord, $"l_orderkey" === $"o_orderkey")
      .select($"o_custkey".as("user_id"), $"l_partkey".as("item_id"))
      .localCheckpoint()
    val gone = listens.select($"user_id").distinct()
      .orderBy($"user_id").limit(2).collect().map(_.getLong(0)).toSeq

    val cf = Files.createTempDirectory("graft_purge_cf").toString
    val cfRef = Files.createTempDirectory("graft_purge_cf_ref").toString
    ops.CfIndex.saveCfIndex(listens, cf)
    ops.CfIndex.saveCfIndex(listens.filter(!$"user_id".isin(gone: _*)), cfRef)
    val layout = Files.createTempDirectory("graft_purge_layout").toString
    ops.ZorderLayout.writeZorderLayout(spark, sf, layout)
    val state = Files.createTempDirectory("graft_purge_ustate").toString

    streaming.PurgeStream.userPurgeFold(
      gone.toDF("user_id"), cf, layout, state, 0L)
    assert(ops.CfIndex.serveCfNeighbors(spark, cf).collect().map(_.toSeq).toSeq ==
      ops.CfIndex.serveCfNeighbors(spark, cfRef).collect().map(_.toSeq).toSeq)
    assert(spark.read.parquet(layout).filter($"user_id".isin(gone: _*)).isEmpty)

    // crash window: commit lost, deletes landed — re-fold must not
    // double-negate the CF ledgers (the user's counts are already ≤ 0)
    val want = ops.CfIndex.serveCfUserTopn(spark, cf).collect().map(_.toSeq).toSeq
    val fs = new org.apache.hadoop.fs.Path(state)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(new org.apache.hadoop.fs.Path(s"$state/v0"), true))
    streaming.PurgeStream.userPurgeFold(
      gone.toDF("user_id"), cf, layout, state, 0L)
    assert(ops.CfIndex.serveCfUserTopn(spark, cf).collect().map(_.toSeq).toSeq == want,
      "crash-window re-fold double-applied the negated deltas")
    assert(streaming.PurgeStream.servePurgeState(spark, state)
      .head().getAs[Long]("n_purged") == gone.length.toLong)
  }

  test("retry no-ops; crash window (deletes applied, commit lost) re-folds to the same state") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf).select($"doc_id", $"lang", $"text")
      .localCheckpoint()
    val b1 = docs.select($"doc_id").filter($"doc_id" % 23 === 0)
    val (posting, positional, band) = buildIndexes(docs)
    val state = Files.createTempDirectory("graft_purge_state2").toString

    streaming.PurgeStream.docPurgeFold(b1.toDF(), posting, positional, band, state, 0L)
    val want = streaming.PurgeStream.servePurgeState(spark, state)
      .collect().map(_.toSeq).toSeq
    val postingAfter = spark.read.parquet(s"$posting/postings")
      .collect().map(_.toSeq).toSet

    // retry of the committed batch: guarded no-op, indexes untouched
    streaming.PurgeStream.docPurgeFold(b1.toDF(), posting, positional, band, state, 0L)
    assert(streaming.PurgeStream.servePurgeState(spark, state)
      .collect().map(_.toSeq).toSeq == want)

    // crash window: the deletes landed but the commit vanished — the
    // retry re-runs the deletes as no-ops (their own idempotence is the
    // recovery protocol) and commits the identical watermark
    val fs = new org.apache.hadoop.fs.Path(state)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(new org.apache.hadoop.fs.Path(s"$state/v0"), true))
    streaming.PurgeStream.docPurgeFold(b1.toDF(), posting, positional, band, state, 0L)
    assert(streaming.PurgeStream.servePurgeState(spark, state)
      .collect().map(_.toSeq).toSeq == want)
    assert(spark.read.parquet(s"$posting/postings")
      .collect().map(_.toSeq).toSet == postingAfter, "re-fold mutated the index")
  }
}
