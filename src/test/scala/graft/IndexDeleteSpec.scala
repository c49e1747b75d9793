package graft

import org.apache.spark.sql.functions._

import java.nio.file.Files

/** DELETE propagation through the persisted-index lifecycle — the GDPR
  * path (etl_user_purge's discipline) extended to the document/vector
  * stores: every index family's delete op must leave serve-after-delete
  * equal to rebuild-without-keys (exactly where the index is exact;
  * containment + navigability where it is approximate), keep cold
  * buckets byte-identical, and no-op on re-delete.
  */
class IndexDeleteSpec extends SparkSuite {

  /** name → lastModified for every data file under a dir. */
  private def mtimes(root: String): Map[String, Long] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk) else Seq(f)
    walk(new java.io.File(root))
      .filter(_.getName.endsWith(".parquet"))
      .map(f => f.getPath -> f.lastModified()).toMap
  }

  private def rowsOf(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("posting index: delete == rebuild-without-docs exactly; cold buckets stable; re-delete no-op") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf).select($"doc_id", $"lang", $"text")
    val gone = docs.select($"doc_id").filter($"doc_id" % 11 === 0)
      .collect().map(_.getLong(0)).toSeq
    assert(gone.nonEmpty)

    val a = Files.createTempDirectory("graft_pidx_del").toString
    val b = Files.createTempDirectory("graft_pidx_ref").toString
    ops.LlmQueries.savePostingIndexOf(docs, a)
    ops.LlmQueries.savePostingIndexOf(docs.filter(!$"doc_id".isin(gone: _*)), b)

    val pre = mtimes(s"$a/postings")
    val affected = ops.LlmQueries.deleteFromPostingIndex(spark, a, gone)
    assert(affected.nonEmpty, "docs were indexed — some buckets must rewrite")

    // table-level: postings and norms equal the rebuilt index as SETS;
    // meta equal as SUMS (the only thing serve reads)
    assert(rowsOf(spark.read.parquet(s"$a/postings").select($"doc_id", $"term", $"tf")) ==
      rowsOf(spark.read.parquet(s"$b/postings").select($"doc_id", $"term", $"tf")))
    assert(rowsOf(spark.read.parquet(s"$a/norms")) == rowsOf(spark.read.parquet(s"$b/norms")))
    def metaSums(p: String) = spark.read.parquet(s"$p/meta")
      .agg(sum($"n_docs"), sum($"total_len")).head()
    assert(metaSums(a) == metaSums(b), "meta ledger sums must match the rebuild")

    // serve-level: both the tf and the BM25 serve paths agree bit-for-bit
    val terms = Seq("data", "model", "training", "quality")
    assert(ops.LlmQueries.textSearchFromIndex(spark, a, terms).collect().map(_.toSeq).toSeq ==
      ops.LlmQueries.textSearchFromIndex(spark, b, terms).collect().map(_.toSeq).toSeq)
    assert(ops.Bm25.textSearchBm25FromIndex(spark, a, terms).collect().map(_.toSeq).toSeq ==
      ops.Bm25.textSearchBm25FromIndex(spark, b, terms).collect().map(_.toSeq).toSeq)

    // cold buckets: every file in an UNAFFECTED tb= dir is byte-stable
    val affectedDirs = affected.map(i => s"tb=$i").toSet
    val post = mtimes(s"$a/postings")
    pre.filter { case (f, _) => !affectedDirs.exists(f.contains) }
      .foreach { case (f, m) =>
        assert(post.get(f).contains(m), s"cold bucket file rewritten: $f") }

    // idempotent re-delete: zero affected buckets, zero file churn
    val stable = mtimes(a)
    assert(ops.LlmQueries.deleteFromPostingIndex(spark, a, gone).isEmpty)
    assert(mtimes(a) == stable, "re-delete touched index files")
  }

  test("positional index: delete drops the docs' rows, cold buckets stable") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf).select($"doc_id", $"lang", $"text")
    val gone = docs.select($"doc_id").filter($"doc_id" % 13 === 0)
      .collect().map(_.getLong(0)).toSeq
    val p = Files.createTempDirectory("graft_posidx_del").toString
    ops.PhraseSearch.savePositionalIndex(spark, sf, p)
    val before = spark.read.parquet(s"$p/positions")
    assert(!before.filter($"doc_id".isin(gone: _*)).isEmpty)
    val keptBefore = rowsOf(before.filter(!$"doc_id".isin(gone: _*))
      .select($"doc_id", $"term", $"pos"))
    val affected = ops.PhraseSearch.deleteFromPositionalIndex(spark, p, gone)
    assert(affected.nonEmpty)
    val after = spark.read.parquet(s"$p/positions")
    assert(after.filter($"doc_id".isin(gone: _*)).isEmpty, "deleted rows survived")
    assert(rowsOf(after.select($"doc_id", $"term", $"pos")) == keptBefore,
      "surviving rows must be untouched")
    val stable = mtimes(p)
    assert(ops.PhraseSearch.deleteFromPositionalIndex(spark, p, gone).isEmpty)
    assert(mtimes(p) == stable)
  }

  test("cf ledgers: delete-user == rebuild-without-user exactly; negated deltas only; re-delete no-op") {
    import spark.implicits._
    val li  = Tables.lineitem(spark, sf).select($"l_orderkey", $"l_partkey")
    val ord = Tables.orders(spark, sf).select($"o_orderkey", $"o_custkey")
    val listens = li.join(ord, $"l_orderkey" === $"o_orderkey")
      .select($"o_custkey".as("user_id"), $"l_partkey".as("item_id"))
      .localCheckpoint()
    val users = listens.select($"user_id").distinct()
      .orderBy($"user_id").limit(3).collect().map(_.getLong(0)).toSeq

    val a = Files.createTempDirectory("graft_cf_del").toString
    val b = Files.createTempDirectory("graft_cf_ref").toString
    ops.CfIndex.saveCfIndex(listens, a)
    ops.CfIndex.saveCfIndex(listens.filter(!$"user_id".isin(users: _*)), b)

    val coFilesBefore = mtimes(s"$a/co")
    // explicit stamp: the protocol deliberately has no default — two
    // distinct logical deletes sharing one would corrupt each other
    ops.CfIndex.deleteUsersFromCfIndex(spark, a, users, srcBatch = -42L)
    // append-only: every pre-delete ledger file is byte-identical
    mtimes(s"$a/co").filterKeys(coFilesBefore.contains).foreach { case (f, m) =>
      assert(coFilesBefore(f) == m, s"delete rewrote a ledger file: $f") }

    assert(ops.CfIndex.serveCfNeighbors(spark, a).collect().map(_.toSeq).toSeq ==
      ops.CfIndex.serveCfNeighbors(spark, b).collect().map(_.toSeq).toSeq,
      "neighbor serve after delete must equal rebuild-without-users")
    assert(ops.CfIndex.serveCfUserTopn(spark, a).collect().map(_.toSeq).toSeq ==
      ops.CfIndex.serveCfUserTopn(spark, b).collect().map(_.toSeq).toSeq,
      "recommendation serve after delete must equal rebuild-without-users")

    // idempotent: a second delete appends nothing
    val stable = mtimes(a)
    ops.CfIndex.deleteUsersFromCfIndex(spark, a, users, srcBatch = -42L)
    assert(mtimes(a) == stable, "re-delete appended ledger rows")
  }

  test("band index: tombstone delete == rebuild-without-docs; base tables mtime-stable; vacuum folds") {
    import spark.implicits._
    val corpus = Tables.documents(spark, sf)
      .select($"doc_id", $"lang", $"text").filter($"doc_id" <= 250L)
    // delete docs that ARE candidate containers for the incoming batch so
    // the check is non-vacuous: take corpus docs the pre-delete serve hits
    val a = Files.createTempDirectory("graft_band_del").toString
    val b = Files.createTempDirectory("graft_band_ref").toString
    ops.ScaleDedup.saveBandIndexOf(corpus, a)
    val preServe = ops.ScaleDedup.dedupIncrementalBandedFromIndex(spark, sf, a)
    val hit = preServe.select($"corpus_doc_id").distinct().limit(2)
      .collect().map(_.getLong(0)).toSeq
    assert(hit.nonEmpty, "fixture vacuous: no incoming doc matches the corpus index")
    ops.ScaleDedup.saveBandIndexOf(corpus.filter(!$"doc_id".isin(hit: _*)), b)

    val baseFiles = mtimes(s"$a/bands") ++ mtimes(s"$a/wordsets")
    ops.ScaleDedup.deleteFromBandIndex(spark, a, hit)
    assert((mtimes(s"$a/bands") ++ mtimes(s"$a/wordsets")) == baseFiles,
      "tombstone delete must not rewrite base tables")

    val want = ops.ScaleDedup.dedupIncrementalBandedFromIndex(spark, sf, b)
      .collect().map(_.toSeq).toSeq
    assert(ops.ScaleDedup.dedupIncrementalBandedFromIndex(spark, sf, a)
      .collect().map(_.toSeq).toSeq == want,
      "tombstoned serve must equal rebuild-without-docs")

    // re-delete appends no tombstones
    val tombFiles = mtimes(a)
    ops.ScaleDedup.deleteFromBandIndex(spark, a, hit)
    assert(mtimes(a) == tombFiles, "re-delete appended tombstones")

    // vacuum folds the tombstones in and serve is unchanged
    assert(ops.ScaleDedup.vacuumBandIndex(spark, a) == hit.length.toLong)
    assert(ops.ScaleDedup.dedupIncrementalBandedFromIndex(spark, sf, a)
      .collect().map(_.toSeq).toSeq == want, "vacuum changed the serve")
    assert(ops.ScaleDedup.vacuumBandIndex(spark, a) == 0L, "vacuum not idempotent")
  }

  test("cf crash window: half-applied delete (uic negated, co/nu not) heals on stamped retry") {
    import spark.implicits._
    val li  = Tables.lineitem(spark, sf).select($"l_orderkey", $"l_partkey")
    val ord = Tables.orders(spark, sf).select($"o_orderkey", $"o_custkey")
    val listens = li.join(ord, $"l_orderkey" === $"o_orderkey")
      .select($"o_custkey".as("user_id"), $"l_partkey".as("item_id"))
      .localCheckpoint()
    val gone = listens.select($"user_id").distinct()
      .orderBy($"user_id").limit(2).collect().map(_.getLong(0)).toSeq
    val a = Files.createTempDirectory("graft_cf_crash").toString
    val b = Files.createTempDirectory("graft_cf_crash_ref").toString
    ops.CfIndex.saveCfIndex(listens, a)
    ops.CfIndex.saveCfIndex(listens.filter(!$"user_id".isin(gone: _*)), b)

    val stamp = -77L
    ops.CfIndex.deleteUsersFromCfIndex(spark, a, gone, stamp)
    // reconstruct the crash: the uic negation landed, co/nu did not, and
    // the completion marker (written last) never did
    Seq("co", "nu").foreach { sub =>
      val kept = spark.read.parquet(s"$a/$sub")
        .filter($"src_batch" =!= stamp).localCheckpoint()
      kept.write.mode("overwrite").parquet(s"$a/$sub")
    }
    val fs = new org.apache.hadoop.fs.Path(a)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$a/deletes"), true)
    // in this state the old probe-only delete was a permanent no-op
    // (uic sums <= 0); the stamped retry must roll back and re-apply
    ops.CfIndex.deleteUsersFromCfIndex(spark, a, gone, stamp)
    assert(ops.CfIndex.serveCfNeighbors(spark, a).collect().map(_.toSeq).toSeq ==
      ops.CfIndex.serveCfNeighbors(spark, b).collect().map(_.toSeq).toSeq,
      "half-applied delete not healed: co/nu retain the purged user's mass")
    assert(ops.CfIndex.serveCfUserTopn(spark, a).collect().map(_.toSeq).toSeq ==
      ops.CfIndex.serveCfUserTopn(spark, b).collect().map(_.toSeq).toSeq)
  }

  test("posting crash window: norms rewritten but meta uncorrected — reconciling delete heals the ledger") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf).select($"doc_id", $"lang", $"text")
    val gone = docs.select($"doc_id").filter($"doc_id" % 29 === 0)
      .collect().map(_.getLong(0)).toSeq
    val a = Files.createTempDirectory("graft_pidx_crash").toString
    val b = Files.createTempDirectory("graft_pidx_crash_ref").toString
    ops.LlmQueries.savePostingIndexOf(docs, a)
    ops.LlmQueries.savePostingIndexOf(docs.filter(!$"doc_id".isin(gone: _*)), b)
    // reconstruct the crash state: norms already rewritten without the
    // docs, meta still at pre-delete sums, postings untouched
    val keptNorms = spark.read.parquet(s"$a/norms")
      .filter(!$"doc_id".isin(gone: _*)).localCheckpoint()
    keptNorms.write.mode("overwrite").parquet(s"$a/norms")
    // the retry: drift-reconciliation must close the ledger gap the old
    // pre-rewrite delta lost forever (its probe saw zero matching norms)
    ops.LlmQueries.deleteFromPostingIndex(spark, a, gone)
    def metaSums(p: String) = spark.read.parquet(s"$p/meta")
      .agg(sum($"n_docs"), sum($"total_len")).head()
    assert(metaSums(a) == metaSums(b),
      "meta ledger not reconciled after the crash window")
    val terms = Seq("data", "model", "training", "quality")
    assert(ops.Bm25.textSearchBm25FromIndex(spark, a, terms).collect().map(_.toSeq).toSeq ==
      ops.Bm25.textSearchBm25FromIndex(spark, b, terms).collect().map(_.toSeq).toSeq)
  }

  test("compression indexes: list/projection rows drop, models untouched, serve excludes ids, re-delete no-op") {
    import spark.implicits._
    val gone = Seq(3L, 17L, 42L)

    val pq = Files.createTempDirectory("graft_ivfpq_del").toString
    ops.VectorAgg.saveIvfPqIndex(spark, sf, pq)
    val keepBefore = rowsOf(spark.read.parquet(s"$pq/lists")
      .filter(!$"neighbor_id".isin(gone: _*)))
    val models = mtimes(s"$pq/cells") ++ mtimes(s"$pq/codebook")
    assert(ops.VectorAgg.deleteFromIvfPqIndex(spark, pq, gone) == gone.length.toLong)
    assert(rowsOf(spark.read.parquet(s"$pq/lists")) == keepBefore,
      "lists must lose exactly the ids' rows")
    assert((mtimes(s"$pq/cells") ++ mtimes(s"$pq/codebook")) == models,
      "delete touched a model table")
    assert(ops.VectorAgg.annTopkIvfPqFromIndex(spark, sf, pq)
      .filter($"neighbor_id".isin(gone: _*)).isEmpty, "a deleted id was served")
    val pqStable = mtimes(pq)
    assert(ops.VectorAgg.deleteFromIvfPqIndex(spark, pq, gone) == 0L)
    assert(mtimes(pq) == pqStable, "re-delete rewrote lists")

    val pca = Files.createTempDirectory("graft_pca_del").toString
    ops.EmbeddingPca.savePcaIndex(spark, sf, pca)
    val projBefore = rowsOf(spark.read.parquet(s"$pca/projected")
      .filter(!$"vec_id".isin(gone: _*)))
    val comps = mtimes(s"$pca/components")
    assert(ops.EmbeddingPca.deleteFromPcaIndex(spark, pca, gone) == gone.length.toLong)
    assert(rowsOf(spark.read.parquet(s"$pca/projected")) == projBefore)
    assert(mtimes(s"$pca/components") == comps, "delete touched the basis")
    assert(ops.EmbeddingPca.annTopkPcaFromIndex(spark, sf, pca)
      .filter($"neighbor_id".isin(gone: _*)).isEmpty, "a deleted id was served")
    val pcaStable = mtimes(pca)
    assert(ops.EmbeddingPca.deleteFromPcaIndex(spark, pca, gone) == 0L)
    assert(mtimes(pca) == pcaStable)
  }

  test("zorder layout: user purge rewrites only the user's cells; pruned scan == oracle-minus-user") {
    import spark.implicits._
    val p = Files.createTempDirectory("graft_zorder_del").toString
    ops.ZorderLayout.writeZorderLayout(spark, sf, p)
    val gone = Seq(5L) // inside the fixed query band, so the serve check bites
    val before = spark.read.parquet(p)
    assert(!before.filter($"user_id".isin(gone: _*)).isEmpty)
    val keptBefore = rowsOf(before.filter(!$"user_id".isin(gone: _*))
      .select($"event_id", $"user_id", $"sec"))
    val boxesBefore = mtimes(s"$p/_cellstats") ++ mtimes(s"$p/_stats")
    val pre = mtimes(p)

    val affected = ops.ZorderLayout.deleteUsersFromZorderLayout(spark, p, gone)
    assert(affected.nonEmpty)
    // z-ordering clusters one user into few cells: the purge must not
    // have rewritten the whole 256-cell layout
    assert(affected.size < 64, s"purge touched ${affected.size} cells")
    val after = spark.read.parquet(p)
    assert(after.filter($"user_id".isin(gone: _*)).isEmpty, "purged rows survived")
    assert(rowsOf(after.select($"event_id", $"user_id", $"sec")) == keptBefore)
    // prune boxes untouched (stale-but-sound contract), cold cells stable
    assert((mtimes(s"$p/_cellstats") ++ mtimes(s"$p/_stats")) == boxesBefore)
    val affectedDirs = affected.map(i => s"cell=$i").toSet
    val post = mtimes(p)
    pre.filter { case (f, _) =>
      !affectedDirs.exists(f.contains) && !f.contains("_cellstats") && !f.contains("_stats") }
      .foreach { case (f, m) =>
        assert(post.get(f).contains(m), s"cold cell rewritten: $f") }

    // the pruned serve path equals the full-scan truth minus the user
    val (uLo, uHi, sLo, sHi) = (3L, 7L, 1704500000L, 1705100000L)
    val want = rowsOf(Tables.events(spark, sf)
      .select($"event_id", $"user_id", $"ts".cast("long").as("sec"))
      .filter($"user_id".between(uLo, uHi) && $"sec".between(sLo, sHi))
      .filter(!$"user_id".isin(gone: _*)))
    assert(rowsOf(ops.ZorderLayout.prunedRangeScan(spark, p, uLo, uHi, sLo, sHi)) == want,
      "pruned scan after purge must equal the oracle without the user")

    // idempotent re-delete
    val stable = mtimes(p)
    assert(ops.ZorderLayout.deleteUsersFromZorderLayout(spark, p, gone).isEmpty)
    assert(mtimes(p) == stable)
  }

  test("knn graph: deleted ids vanish from state and results; orphans re-link; queries stay k-deep") {
    import spark.implicits._
    val p = Files.createTempDirectory("graft_graph_del").toString
    ops.KnnGraph.saveKnnGraph(spark, sf, p)
    val adj0 = spark.read.parquet(s"$p/adj")
    // delete well-connected non-query nodes so orphans + serve both exercise
    val gone = adj0.groupBy($"src").agg(count(lit(1)).as("d"))
      .filter($"src" % 10 =!= 0).orderBy($"d".desc, $"src").limit(3)
      .collect().map(_.getLong(0)).toSeq
    val orphans = adj0.filter($"src".isin(gone: _*))
      .filter(!$"dst".isin(gone: _*))
      .select($"dst").distinct().collect().map(_.getLong(0)).toSet
    assert(orphans.nonEmpty)

    ops.KnnGraph.deleteFromKnnGraph(spark, sf, p, gone)
    val adj1 = spark.read.parquet(s"$p/adj")
    assert(adj1.filter($"src".isin(gone: _*) || $"dst".isin(gone: _*)).isEmpty,
      "deleted ids still present in adjacency")
    assert(spark.read.parquet(s"$p/seeds").filter($"node".isin(gone: _*)).isEmpty,
      "deleted ids still present in seeds")
    // every orphan re-linked (navigability restored by the beam)
    val linked = adj1.select($"src").distinct().collect().map(_.getLong(0)).toSet
    orphans.foreach(o => assert(linked(o), s"orphan $o left without edges"))

    val served = ops.KnnGraph.annTopkGraphFromIndex(spark, sf, p)
    assert(served.filter($"neighbor_id".isin(gone: _*)).isEmpty,
      "a deleted id was served")
    // k-deep: every query still returns 5 ranked hits
    val depths = served.groupBy($"query_id").agg(count(lit(1)).as("n"))
    assert(depths.filter($"n" =!= 5).isEmpty, "a query lost result depth")

    // idempotent re-delete: nothing references the ids → zero churn
    val stable = mtimes(p)
    ops.KnnGraph.deleteFromKnnGraph(spark, sf, p, gone)
    assert(mtimes(p) == stable, "re-delete touched graph files")
  }
}
