package graft

import org.apache.spark.sql.execution.{FileSourceScanExec, RDDScanExec}

/** Pins the persisted-index entries' whole claim: train+save happens ONCE
  * per (session, dir); every later call is a pure serve against the loaded
  * tables — no Lloyd rounds, no re-save, no corpus-wide re-encode.
  *
  * Round 7's driver bench regressed `ann_topk_ivfpq_persisted` 5.7× and the
  * suspicion was the session-scoped cache silently missing between calls
  * (re-training per rep). BenchOne exonerated it (warm serve ~1.0 s), and
  * this spec makes the contract a standing assertion instead of a per-round
  * forensic: cache key stable, index files mtime-stable across calls, and
  * the serve plan free of train/save stages.
  */
class PersistedIndexSpec extends SparkSuite {

  /** name → lastModified for every data file under a saved index dir. */
  private def mtimes(root: String): Map[String, Long] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(new java.io.File(root))
      .filter(_.getName.endsWith(".parquet"))
      .map(f => f.getPath -> f.lastModified()).toMap
  }

  test("ivf-pq persisted: cache hits across calls, no re-save, serve plan train-free") {
    val first = ops.VectorAgg.annTopkIvfPqPersisted(spark, sf)
    val rows1 = first.collect().map(_.toSeq).toSeq
    assert(rows1.nonEmpty)
    val path = ops.VectorAgg.persistedIvfPqIndexPath(spark, sf)
      .getOrElse(fail("first call did not populate the index cache"))
    val saved = mtimes(path)
    assert(saved.nonEmpty, s"no parquet files under $path")

    val second = ops.VectorAgg.annTopkIvfPqPersisted(spark, sf)
    assert(second.collect().map(_.toSeq).toSeq == rows1)
    assert(ops.VectorAgg.persistedIvfPqIndexPath(spark, sf).contains(path),
      "cache key did not hit on the second call")
    assert(mtimes(path) == saved, "serve pass re-wrote index files")

    // the serve plan: no RDD-scan leaf (Lloyd's localCheckpoint signature —
    // training would surface as one), and the only file scans are the index
    // tables plus ONE corpus scan for the query slice
    val nodes = tools.PlanWalk.flatten(second.queryExecution.executedPlan)
    assert(!nodes.exists(_.isInstanceOf[RDDScanExec]),
      "serve plan contains a checkpointed (trained) RDD leaf")
    val scans = nodes.collect { case f: FileSourceScanExec => f.toString }
    assert(scans.exists(_.contains(path)), s"index tables not scanned:\n${scans.mkString("\n")}")
    val corpusScans = scans.filter(s => s.contains("embeddings") && !s.contains(path))
    assert(corpusScans.size == 1,
      s"expected exactly the query-slice corpus scan, got ${corpusScans.size}")
  }

  test("ivf-pq append: new vectors encode through the SAVED model, landed rows untouched") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft_ivfpq_app").toString
    ops.VectorAgg.saveIvfPqIndex(spark, sf, path)
    val before = spark.read.parquet(s"$path/lists").collect()
      .map(r => (r.getAs[Long]("neighbor_id"),
        (r.getAs[Long]("cell"), r.getAs[scala.collection.Seq[Any]]("code")))).toMap
    val savedFiles = mtimes(s"$path/lists")

    // append a copy of every 7th corpus vector under fresh ids: its saved-
    // model encoding must equal the original row's (same vector, same
    // centroids, same codebook — cell and code are functions of the vector)
    val batch = Tables.embeddings(spark, sf).filter($"vec_id" % 7 === 0)
      .select(($"vec_id" + 1000000L).as("vec_id"), $"embedding")
    val batchCount = batch.count()
    ops.VectorAgg.appendToIvfPqIndex(batch, path)

    val after = spark.read.parquet(s"$path/lists").collect()
      .map(r => (r.getAs[Long]("neighbor_id"),
        (r.getAs[Long]("cell"), r.getAs[scala.collection.Seq[Any]]("code")))).toMap
    assert(after.size == before.size + batchCount)
    // existing rows and files untouched
    before.foreach { case (id, enc) => assert(after(id) == enc, s"landed row $id changed") }
    savedFiles.foreach { case (f, m) =>
      assert(new java.io.File(f).lastModified() == m, s"landed file rewritten: $f")
    }
    // appended encodings equal the original rows'
    after.filter(_._1 >= 1000000L).foreach { case (id, enc) =>
      assert(enc == before(id - 1000000L), s"appended $id drifted from saved-model encoding")
    }
  }

  test("posting index persisted: serve == in-session search, cache hits, corpus text unread") {
    val inSession = ops.LlmQueries.textSearch(spark, sf).collect().map(_.toSeq).toSeq
    val first = ops.LlmQueries.textSearchPersisted(spark, sf)
    val rows1 = first.collect().map(_.toSeq).toSeq
    assert(rows1.nonEmpty && rows1 == inSession)
    val path = ops.LlmQueries.persistedPostingIndexPath(spark, sf)
      .getOrElse(fail("first call did not populate the posting-index cache"))
    val saved = mtimes(path)
    assert(saved.nonEmpty)
    // the saved index is the FULL vocabulary, not just the fixed query terms
    import org.apache.spark.sql.functions.{explode, lower, split, trim, col}
    val corpusVocab = Tables.documents(spark, sf)
      .select(explode(split(lower(trim(col("text"))), " +")).as("t"))
      .distinct().count()
    val terms = spark.read.parquet(s"$path/postings")
      .select("term").distinct().count()
    assert(terms == corpusVocab, s"index holds $terms terms, corpus has $corpusVocab")

    val second = ops.LlmQueries.textSearchPersisted(spark, sf)
    assert(second.collect().map(_.toSeq).toSeq == rows1)
    assert(ops.LlmQueries.persistedPostingIndexPath(spark, sf).contains(path))
    assert(mtimes(path) == saved, "serve pass re-wrote the posting index")
    // serve plan never scans the documents parquet — only the index tables
    val scans = tools.PlanWalk.flatten(second.queryExecution.executedPlan)
      .collect { case f: FileSourceScanExec => f.toString }
    assert(scans.nonEmpty && scans.forall(_.contains(path)),
      s"serve plan reads outside the index:\n${scans.mkString("\n")}")
  }

  test("posting index append: append == rebuild, only the batch tokenized") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, sf)
    val terms = Seq("data", "model", "training", "quality")
    val base = s"/tmp/graft_test_posting_append_${System.nanoTime()}"
    // rebuild path: full corpus indexed at once
    ops.LlmQueries.savePostingIndexOf(docs, s"$base/full")
    val full = ops.LlmQueries.textSearchFromIndex(spark, s"$base/full", terms)
      .collect().map(_.toSeq).toSeq
    // append path: index the landed half, then append the new batch
    ops.LlmQueries.savePostingIndexOf(docs.filter(col("doc_id") <= 250L), s"$base/inc")
    val preAppend = mtimes(s"$base/inc")
    ops.LlmQueries.appendToPostingIndex(docs.filter(col("doc_id") > 250L), s"$base/inc")
    val inc = ops.LlmQueries.textSearchFromIndex(spark, s"$base/inc", terms)
      .collect().map(_.toSeq).toSeq
    assert(inc == full, "appended index diverges from a full rebuild")
    // append never rewrote the landed files — strictly additive
    val postAppend = mtimes(s"$base/inc")
    preAppend.foreach { case (f, t) =>
      assert(postAppend.get(f).contains(t), s"append rewrote landed file $f")
    }
    assert(postAppend.size > preAppend.size, "append added no files")
    // meta ledger: one row per landed batch, serve sums them
    assert(spark.read.parquet(s"$base/inc/meta").count() == 2L)
    // and the appended index still matches the in-session search exactly
    assert(inc == ops.LlmQueries.textSearch(spark, sf).collect().map(_.toSeq).toSeq)
  }

  test("posting sink fold: streamed batches == rebuild, replay appends nothing, serve prunes buckets") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, sf)
    val terms = Seq("data", "model", "training", "quality")
    val base = s"/tmp/graft_test_posting_sink_${System.nanoTime()}"
    ops.LlmQueries.savePostingIndexOf(docs.filter(col("doc_id") <= 200L), base)
    streaming.CorpusStream.postingFold(
      docs.filter(col("doc_id") > 200L && col("doc_id") <= 350L), base)
    streaming.CorpusStream.postingFold(docs.filter(col("doc_id") > 350L), base)
    val served = ops.LlmQueries.textSearchFromIndex(spark, base, terms)
      .collect().map(_.toSeq).toSeq
    assert(served == ops.LlmQueries.textSearch(spark, sf).collect().map(_.toSeq).toSeq,
      "streamed index diverges from the in-session search")
    // redelivered batch: the Bloom anti-join screens every doc, and neither
    // the postings nor the meta ledger changes a byte
    val before = mtimes(base)
    streaming.CorpusStream.postingFold(docs.filter(col("doc_id") > 350L), base)
    assert(mtimes(base) == before, "replayed batch mutated the index")
    // serve prunes the bucket dirs: the scan touches only the query terms'
    // tb= partitions, not the whole posting table
    val q = ops.LlmQueries.textSearchFromIndex(spark, base, terms)
    q.collect()
    val touched = tools.PlanWalk.flatten(q.queryExecution.executedPlan)
      .collect { case f: FileSourceScanExec if f.toString.contains("postings") =>
        f.metrics("numFiles").value }.sum
    val all = spark.read.parquet(s"$base/postings").inputFiles.length.toLong
    assert(touched < all, s"bucket pruning inert: scan touched $touched of $all posting files")
  }

  test("hybrid persisted: fusion identical to in-session; keyword leg never reads corpus text") {
    val a = ops.LlmQueries.hybridSearchRrf(spark, sf).collect().map(_.toSeq).toSeq
    val df = ops.LlmQueries.hybridSearchRrfPersisted(spark, sf)
    val b = df.collect().map(_.toSeq).toSeq
    assert(a.nonEmpty && a == b, "persisted hybrid diverges from the in-session fusion")
    val scans = tools.PlanWalk.flatten(df.queryExecution.executedPlan)
      .collect { case f: FileSourceScanExec => f.toString }
    assert(scans.exists(_.contains("embeddings")), "vector leg must scan the embedding store")
    assert(!scans.exists(_.contains("documents")),
      s"keyword leg read the corpus:\n${scans.mkString("\n")}")
  }

  test("posting compaction: oversized buckets fold to one file, cold untouched, serve identical") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, sf)
    val terms = Seq("data", "model", "training", "quality")
    val base = s"/tmp/graft_test_posting_cmp_${System.nanoTime()}"
    ops.LlmQueries.savePostingIndexOf(docs, base)
    // 5 appended batches of fresh doc_ids hammer every bucket their terms hash to
    val batch = docs.filter(col("doc_id") <= 60L).select(col("doc_id"), col("text"))
    (1 to 5).foreach { i =>
      ops.LlmQueries.appendToPostingIndex(
        batch.select((col("doc_id") + i * 1000000L).as("doc_id"), col("text")), base)
    }
    val servedBefore = ops.LlmQueries.textSearchFromIndex(spark, base, terms)
      .collect().map(_.toSeq).toSeq
    val rowsBefore = spark.read.parquet(s"$base/postings").count()
    def files(tb: Int) = new java.io.File(s"$base/postings/tb=$tb").listFiles()
      .filter(_.getName.endsWith(".parquet"))
    val compacted = ops.LlmQueries.compactPostingBuckets(spark, base, maxFiles = 4)
    assert(compacted.nonEmpty, "fixture failed to exceed the file ceiling")
    compacted.foreach(tb => assert(files(tb).length == 1, s"bucket $tb still ${files(tb).length} files"))
    assert(spark.read.parquet(s"$base/postings").count() == rowsBefore, "compaction lost postings")
    assert(ops.LlmQueries.textSearchFromIndex(spark, base, terms)
      .collect().map(_.toSeq).toSeq == servedBefore, "compaction changed the served answer")
    assert(ops.LlmQueries.compactPostingBuckets(spark, base, maxFiles = 4).isEmpty, "not idempotent")
  }

  test("bm25 persisted: serve == in-session; norms/meta append == rebuild; corpus text unread") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, sf)
    val terms = ops.Bm25.defaultTerms
    val inSession = ops.Bm25.textSearchBm25(spark, sf).collect().map(_.toSeq).toSeq
    assert(inSession.nonEmpty)

    // the shared (session, dir) index serves BM25 identically
    val served = ops.Bm25.textSearchBm25Persisted(spark, sf)
    assert(served.collect().map(_.toSeq).toSeq == inSession,
      "persisted BM25 diverges from the in-session ranking")
    // serve plan reads only index tables (norms + postings + meta)
    val scans = tools.PlanWalk.flatten(served.queryExecution.executedPlan)
      .collect { case f: FileSourceScanExec => f.toString }
    assert(!scans.exists(_.contains("documents")),
      s"BM25 serve read the corpus:\n${scans.mkString("\n")}")

    // append path: landed half + appended batch == full rebuild, including
    // the norms and meta ledgers the BM25 scoring depends on
    val base = s"/tmp/graft_test_bm25_append_${System.nanoTime()}"
    ops.LlmQueries.savePostingIndexOf(docs.filter(col("doc_id") <= 250L), base)
    ops.LlmQueries.appendToPostingIndex(docs.filter(col("doc_id") > 250L), base)
    val inc = ops.Bm25.textSearchBm25FromIndex(spark, base, terms)
      .collect().map(_.toSeq).toSeq
    assert(inc == inSession, "appended norms/meta ledgers diverge from rebuild")
    // ledgers are batch-granular: 2 meta rows, norms row per doc
    assert(spark.read.parquet(s"$base/meta").count() == 2L)
    assert(spark.read.parquet(s"$base/norms").count() == docs.count())
  }

  test("banded dedup persisted: cache hits across calls, no re-save, serve plan write-free") {
    val first = ops.ScaleDedup.dedupIncrementalBandedPersisted(spark, sf)
    val rows1 = first.collect().map(_.toSeq).toSeq
    val path = ops.ScaleDedup.persistedBandIndexPath(spark, sf)
      .getOrElse(fail("first call did not populate the band-index cache"))
    val saved = mtimes(path)
    assert(saved.nonEmpty, s"no parquet files under $path")

    val second = ops.ScaleDedup.dedupIncrementalBandedPersisted(spark, sf)
    assert(second.collect().map(_.toSeq).toSeq == rows1)
    assert(ops.ScaleDedup.persistedBandIndexPath(spark, sf).contains(path),
      "cache key did not hit on the second call")
    assert(mtimes(path) == saved, "serve pass re-wrote band-index files")

    val nodes = tools.PlanWalk.flatten(second.queryExecution.executedPlan)
    assert(!nodes.exists(_.isInstanceOf[RDDScanExec]))
    val scans = nodes.collect { case f: FileSourceScanExec => f.toString }
    assert(scans.exists(_.contains(path)), s"band index not scanned:\n${scans.mkString("\n")}")
  }
}
