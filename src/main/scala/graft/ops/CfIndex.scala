package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Persisted, incrementally-maintained item-item CF index — the
  * save/serve/append lifecycle (the appendToBandIndex / appendToIvfPqIndex
  * / appendToPostingIndex contract) applied to [[Recommend]]'s neighbor
  * model: when a day of listens lands, fold it into the co-listener
  * state instead of recomputing all pairs over the whole history.
  *
  * Layout is LOG-STRUCTURED integer deltas (the exactness device: counts
  * are mergeable by addition, so appending signed deltas and summing at
  * serve reproduces the from-scratch counts bit-for-bit — no float ever
  * enters the state):
  *  - `uic/`  (user_id, item_id, n) listen-count deltas — the per-user
  *    ledger the power-listener cap is recomputed from;
  *  - `co/`   (a, b, d) co-listener deltas over CAPPED sets, a < b;
  *  - `nu/`   (item_id, d) audience-size deltas over capped sets.
  *
  * The subtlety the ledger exists for: [[Recommend.maxItemsPerUser]]
  * caps each user at their top-K items BY LISTEN COUNT, and an append
  * can reshuffle a user's top-K (a newly-hot track displaces an old
  * one). The append therefore recomputes the capped set of AFFECTED
  * USERS ONLY — old capped pairs enter the ledger at −1, new capped
  * pairs at +1, so displaced items' pair counts roll back exactly; an
  * untouched user costs nothing. Work per append is O(batch users × K²)
  * pair rows plus one semi-joined read of those users' ledger — never a
  * corpus re-pair.
  *
  * Serve aggregates the ledgers (one groupBy each — O(index), no fact
  * scan: CfIndexSpec asserts the serve plan never touches the fact
  * tables) and runs [[Recommend]]'s exact ranking tail, so the §2 entry
  * `rec_item_item_cf_persisted` — which BUILDS via save(70%) +
  * append(30%) — is held to the SAME full-corpus DuckDB oracle as the
  * in-session twin: the driver gate itself proves append == rebuild.
  */
object CfIndex {

  import Recommend.{maxItemsPerUser, topKNeighbors, minCoListeners}

  /** Distinct-pair listen counts from raw (user_id, item_id) listen rows. */
  private def listenCounts(listens: DataFrame): DataFrame = {
    import listens.sparkSession.implicits._
    listens.groupBy($"user_id", $"item_id").agg(count(lit(1)).as("n"))
  }

  /** The deterministic power-listener cap over an aggregated
    * (user_id, item_id, n) frame — same total order as
    * [[Recommend.cappedListens]].
    */
  private def cappedOf(uic: DataFrame): DataFrame = {
    import uic.sparkSession.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"n".desc, $"item_id")
    uic.withColumn("r", row_number().over(w))
      .filter($"r" <= maxItemsPerUser)
      .select($"user_id", $"item_id")
  }

  /** Signed per-user pair expansion (a < b) of a capped set. */
  private def pairDeltas(capped: DataFrame, sign: Int): DataFrame = {
    import capped.sparkSession.implicits._
    val a = capped.select($"user_id", $"item_id".as("a"))
    val b = capped.select($"user_id", $"item_id".as("b"))
    a.join(b, Seq("user_id")).filter($"a" < $"b")
      .select($"a", $"b", lit(sign.toLong).as("d"))
  }

  private def itemDeltas(capped: DataFrame, sign: Int): DataFrame = {
    import capped.sparkSession.implicits._
    capped.select($"item_id", lit(sign.toLong).as("d"))
  }

  /** Initialize the index from a listen history (first batch).
    * `srcBatch` stamps every delta row (−1 for one-shot batch use): the
    * provenance column [[rollbackBatch]] needs to undo a half-committed
    * streaming append (see [[graft.streaming.CfStream]]).
    */
  def saveCfIndex(listens: DataFrame, indexPath: String, srcBatch: Long = -1L): Unit = {
    import listens.sparkSession.implicits._
    val uic = listenCounts(listens)
    uic.withColumn("src_batch", lit(srcBatch))
      .write.mode("append").parquet(s"$indexPath/uic")
    val capped = cappedOf(uic)
    pairDeltas(capped, +1).withColumn("src_batch", lit(srcBatch))
      .write.mode("append").parquet(s"$indexPath/co")
    itemDeltas(capped, +1).withColumn("src_batch", lit(srcBatch))
      .write.mode("append").parquet(s"$indexPath/nu")
  }

  /** Fold a batch of new listen rows into the index: affected users'
    * capped sets roll back (−1) and re-assert (+1); everyone else's
    * state is untouched bytes. Delta rows are stamped `srcBatch` (see
    * [[saveCfIndex]]).
    */
  def appendToCfIndex(batch: DataFrame, indexPath: String, srcBatch: Long = -1L): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    val batchCounts = listenCounts(batch).localCheckpoint()
    val users = batchCounts.select($"user_id").distinct()
    val oldUicU = spark.read.parquet(s"$indexPath/uic")
      .join(users, Seq("user_id"), "left_semi")
      .groupBy($"user_id", $"item_id").agg(sum($"n").as("n"))
      .localCheckpoint() // pin BEFORE the ledger grows below
    val oldCapped = cappedOf(oldUicU)
    batchCounts.withColumn("src_batch", lit(srcBatch))
      .write.mode("append").parquet(s"$indexPath/uic")
    val newUicU = oldUicU.union(batchCounts)
      .groupBy($"user_id", $"item_id").agg(sum($"n").as("n"))
    val newCapped = cappedOf(newUicU)
    pairDeltas(newCapped, +1).union(pairDeltas(oldCapped, -1))
      .groupBy($"a", $"b").agg(sum($"d").as("d")).filter($"d" =!= 0)
      .withColumn("src_batch", lit(srcBatch))
      .write.mode("append").parquet(s"$indexPath/co")
    itemDeltas(newCapped, +1).union(itemDeltas(oldCapped, -1))
      .groupBy($"item_id").agg(sum($"d").as("d")).filter($"d" =!= 0)
      .withColumn("src_batch", lit(srcBatch))
      .write.mode("append").parquet(s"$indexPath/nu")
  }

  /** Remove every delta row a given streaming batch stamped into the
    * ledgers — the recovery path for a crash BETWEEN a stamped append
    * and its commit marker: the retry rolls the orphaned deltas back,
    * then re-appends, so at-least-once redelivery can no longer
    * double-count (the gap the round-9 marker could detect only in
    * docs). Cost is three column-pruned provenance probes; the rewrite
    * runs only when orphans exist (the rare crash-retry path). Returns
    * the ledgers rewritten.
    */
  private[graft] def rollbackBatch(spark: SparkSession, indexPath: String,
      srcBatch: Long): Seq[String] = {
    import org.apache.hadoop.fs.Path
    import spark.implicits._
    Seq("uic", "co", "nu").filter { sub =>
      val p = new Path(s"$indexPath/$sub")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val dirty = fs.exists(p) && fs.listStatus(p).nonEmpty && {
        val df = spark.read.parquet(p.toString)
        !df.filter($"src_batch" === srcBatch).isEmpty
      }
      if (dirty) {
        AtomicRewrite.overwrite(
          spark.read.parquet(p.toString)
            .filter($"src_batch" =!= srcBatch)
            .localCheckpoint(),
          p.toString)
      }
      dirty
    }
  }

  /** GDPR DELETE through the CF ledgers — the [[graft.etl.UserPurge]]
    * path for the recommendation store: a user's whole contribution to
    * the index is the +1 net their CURRENT capped set holds in `co`/`nu`
    * (every append rolled back the previous capped set and asserted the
    * new one), so deletion is three NEGATED-delta appends — the user's
    * aggregated `uic` rows with −n, their capped pair expansion with
    * −1, their item rows with −1. No ledger is read-modify-written on
    * the happy path, no other user's rows are touched, and the serve
    * paths' `sum(d) / sum(n)` aggregation makes the user vanish
    * exactly: serve-after-delete == rebuild-without-user, spec-pinned.
    *
    * EXACTLY-ONCE across the three appends (they are not atomic, and a
    * crash between them would otherwise make the retry's `uic`-sum
    * probe a permanent no-op with the user's `co`/`nu` mass retained):
    * `srcBatch` must uniquely identify the LOGICAL delete request — it
    * is deliberately NOT defaulted, because two distinct requests
    * sharing a stamp corrupt each other (the second no-ops on the
    * first's marker, or its rollback un-deletes the first's applied
    * deltas); the purge sink derives one from (run tag, batch id).
    * Every delta row is stamped with it, and a one-row marker in
    * `deletes/` lands LAST as the completion record. A retry of the
    * same request first checks the marker — present means fully
    * committed, full no-op (so a re-delete stays mtime-stable) — then
    * [[rollbackBatch]]s any half-crashed attempt's stamped rows and
    * re-applies from the clean state. Deleting an already-purged user
    * under a NEW stamp finds an empty capped set and appends only its
    * marker. All three ledgers must exist (any saved index has them) —
    * a missing one means a torn rewrite and fails loudly rather than
    * letting the appends recreate a ledger holding only negations.
    */
  def deleteUsersFromCfIndex(spark: SparkSession, indexPath: String,
      userIds: Seq[Long], srcBatch: Long): Unit = {
    import org.apache.hadoop.fs.Path
    import spark.implicits._
    val markerPath = new Path(s"$indexPath/deletes")
    val fs = markerPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq("uic", "co", "nu").foreach { sub =>
      val p = new Path(s"$indexPath/$sub")
      if (!AtomicRewrite.hasCommittedFiles(fs, p))
        throw new IllegalStateException(
          s"cf delete: ledger $p is missing or holds no committed files — " +
            "torn index (a crashed rewrite?); restore it before deleting")
    }
    val committed = AtomicRewrite.hasCommittedFiles(fs, markerPath) &&
      !spark.read.parquet(markerPath.toString)
        .filter($"src_batch" === srcBatch).isEmpty
    if (committed) return // this logical delete already fully applied
    rollbackBatch(spark, indexPath, srcBatch) // clear any half-crashed attempt
    val users = userIds.toDF("user_id")
    val uicU = spark.read.parquet(s"$indexPath/uic")
      .join(users, Seq("user_id"), "left_semi")
      .groupBy($"user_id", $"item_id").agg(sum($"n").as("n"))
      .filter($"n" > 0)
      .localCheckpoint() // probed by the negation and the capped expansion
    if (!uicU.isEmpty) {
      val capped = cappedOf(uicU)
      uicU.select($"user_id", $"item_id", (-$"n").as("n"))
        .withColumn("src_batch", lit(srcBatch))
        .write.mode("append").parquet(s"$indexPath/uic")
      pairDeltas(capped, -1).withColumn("src_batch", lit(srcBatch))
        .write.mode("append").parquet(s"$indexPath/co")
      itemDeltas(capped, -1).withColumn("src_batch", lit(srcBatch))
        .write.mode("append").parquet(s"$indexPath/nu")
    }
    Seq(srcBatch).toDF("src_batch") // completion marker, written LAST
      .coalesce(1).write.mode("append").parquet(markerPath.toString)
  }

  /** The neighbor table served from the ledgers alone — one aggregation
    * per ledger, then [[Recommend]]'s exact ranking tail. No fact scan.
    */
  def serveCfNeighbors(spark: SparkSession, indexPath: String): DataFrame = {
    import spark.implicits._
    val co = spark.read.parquet(s"$indexPath/co")
      .groupBy($"a", $"b").agg(sum($"d").as("co_users"))
      .filter($"co_users" >= minCoListeners)
    val nu = spark.read.parquet(s"$indexPath/nu")
      .groupBy($"item_id").agg(sum($"d").as("n_users"))
      .filter($"n_users" > 0)
    val sym = co.select($"a", $"b", $"co_users")
      .union(co.select($"b".as("a"), $"a".as("b"), $"co_users"))
    val scored = sym
      .join(broadcast(nu.select($"item_id".as("a"), $"n_users".as("n_users_a"))), Seq("a"))
      .join(broadcast(nu.select($"item_id".as("b"), $"n_users".as("n_users_b"))), Seq("b"))
      .withColumn("cosine",
        $"co_users".cast("double") / sqrt(($"n_users_a" * $"n_users_b").cast("double")))
    Recommend.rankNeighbors(scored)
      .orderBy($"item_id", $"rank")
  }

  /** Compact the delta ledgers: each ledger's appended delta files
    * collapse into their aggregated net form (the compactPostingBuckets
    * discipline — serve-time aggregation cost is O(appended deltas), so
    * a long-running ingest loop compacts periodically to keep it
    * O(net state)). Aggregation-then-overwrite is EXACT: summed deltas
    * ARE the net counts, so a compacted index serves bit-identically
    * (spec-pinned); zero-net rows drop. localCheckpoint materializes
    * the aggregate before the dir being read is overwritten. Returns
    * per-ledger (files before, files after).
    */
  def compactCfIndex(spark: SparkSession, indexPath: String): Map[String, (Int, Int)] = {
    import org.apache.hadoop.fs.Path
    import spark.implicits._
    def files(sub: String): Int = {
      val p = new Path(s"$indexPath/$sub")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.listStatus(p).count(_.getPath.getName.endsWith(".parquet")) else 0
    }
    def rewrite(sub: String, agg: DataFrame => DataFrame): (Int, Int) = {
      val before = files(sub)
      if (before > 0) {
        AtomicRewrite.overwrite(
          agg(spark.read.parquet(s"$indexPath/$sub"))
            .coalesce(1).localCheckpoint(),
          s"$indexPath/$sub")
      }
      (before, files(sub))
    }
    // PENDING-DELETE guard: compaction re-stamps rows src_batch = -1,
    // which would erase a HALF-CRASHED delete's provenance — its retry
    // then finds nothing to roll back, an empty capped set, and writes
    // its completion marker over permanently-retained co/nu mass. A
    // crashed delete is a pending operation, so quiescence (the
    // compaction precondition) is not satisfied: refuse loudly when any
    // delete stamp in the ledgers lacks its completion marker.
    val markers: Set[Long] = {
      val mp = new Path(s"$indexPath/deletes")
      val fs = mp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (AtomicRewrite.hasCommittedFiles(fs, mp))
        spark.read.parquet(mp.toString)
          .select($"src_batch").distinct().collect().map(_.getLong(0)).toSet
      else Set.empty
    }
    val pending = Seq("uic", "co", "nu").flatMap { sub =>
      if (files(sub) == 0) Seq.empty[Long]
      else spark.read.parquet(s"$indexPath/$sub")
        .select($"src_batch").filter($"src_batch" < -1L).distinct()
        .collect().map(_.getLong(0))
    }.toSet.diff(markers)
    if (pending.nonEmpty)
      throw new IllegalStateException(
        s"compactCfIndex: unmarked delete stamps ${pending.mkString(",")} — " +
          "a delete is half-applied; let its retry complete before compacting")
    // compacted rows re-stamp src_batch = -1 (provenance collapses with
    // the deltas; compaction must only run with the stream quiescent —
    // already the rule, since the read-aggregate-overwrite would race a
    // concurrent append regardless)
    Map(
      "uic" -> rewrite("uic", df => df.groupBy($"user_id", $"item_id")
        .agg(sum($"n").as("n")).filter($"n" =!= 0)
        .withColumn("src_batch", lit(-1L))),
      "co" -> rewrite("co", df => df.groupBy($"a", $"b")
        .agg(sum($"d").as("d")).filter($"d" =!= 0)
        .withColumn("src_batch", lit(-1L))),
      "nu" -> rewrite("nu", df => df.groupBy($"item_id")
        .agg(sum($"d").as("d")).filter($"d" =!= 0)
        .withColumn("src_batch", lit(-1L))))
  }

  /** Per-user recommendations served from the SAME ledgers — the
    * one-state-many-views discipline (MartStream.serveTopArtists): the
    * capped listen sets fall out of the aggregated `uic/` ledger, the
    * neighbor table out of `co/`+`nu/`, and the voting tail is
    * [[Recommend.recUserTopn]]'s exactly. No fact scan.
    */
  def serveCfUserTopn(spark: SparkSession, indexPath: String): DataFrame = {
    import spark.implicits._
    // pinned: read by the capping window AND the novelty anti-join —
    // one ledger aggregation instead of two (the rec_user_topn one-scan
    // discipline on the serve side). r16: the materialization is a
    // declared user_id PIN, so the capping window and the anti-join
    // side consume it exchange-free (the in-session entry's device).
    val allListens = Recommend.pinProfileByUser(
      spark.read.parquet(s"$indexPath/uic")
        .groupBy($"user_id", $"item_id").agg(sum($"n").as("n")).filter($"n" > 0))
    val listens = Recommend.redeclareByUser(cappedOf(allListens))
    val nb = serveCfNeighbors(spark, indexPath)
      .select($"item_id", $"rec_item_id", $"co_users")
    // ONE user_id exchange for the voting tail — the recUserTopn r15
    // restructure mirrored on the serve side (agg clustering, novelty
    // anti-join, and rank groupBy all ride the same hash(user_id))
    val votes = listens.join(nb, Seq("item_id"))
      .repartition($"user_id")
      .groupBy($"user_id", $"rec_item_id")
      .agg(sum($"co_users").as("score"), count(lit(1)).as("n_via"))
    // novelty against the FULL ledger set, not the capped profile —
    // [[Recommend.recUserTopn]]'s round-10 fix, mirrored here so
    // append==rebuild still shares the one oracle
    val novel = votes.join(
      // the anti side rides the pinned ledger layout directly (r16)
      allListens.select($"user_id", $"item_id".as("rec_item_id")),
      Seq("user_id", "rec_item_id"), "left_anti")
    Recommend.rankUserVotes(novel).orderBy($"user_id", $"rank")
  }

  /** §2 entry `rec_user_topn_persisted`: user recommendations off the
    * built-by-append index; shares the in-session entry's full-corpus
    * oracle (the same append==rebuild proof as the neighbor entry).
    */
  def recUserTopnPersisted(spark: SparkSession, dir: String): DataFrame = {
    recItemItemCfPersisted(spark, dir) // ensures the index exists (cached)
    serveCfUserTopn(spark, savedCfIndexes((spark, dir)))
  }

  /** Raw (user_id, item_id, o_orderkey) listen rows; the order key rides
    * along for the CDC-style deterministic modulus split.
    */
  private def listensOf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li  = Tables.lineitem(spark, dir).select($"l_orderkey", $"l_partkey")
    val ord = Tables.orders(spark, dir).select($"o_orderkey", $"o_custkey")
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .select($"o_custkey".as("user_id"), $"l_partkey".as("item_id"), $"o_orderkey")
  }

  private val savedCfIndexes =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), String]

  private[graft] def persistedCfIndexPath(spark: SparkSession, dir: String): Option[String] =
    savedCfIndexes.get((spark, dir))

  /** §2 entry `rec_item_item_cf_persisted`: build once per (session,
    * dir) as save(orders with o_orderkey%10<7) THEN append(the rest) —
    * so the driver's full-corpus oracle hash-checks the APPEND path,
    * not just the save path — then serve from the ledgers.
    */
  def recItemItemCfPersisted(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val indexPath = savedCfIndexes.synchronized {
      savedCfIndexes.getOrElseUpdate((spark, dir), {
        val p = s"${System.getProperty("java.io.tmpdir")}/graft_cf_index_" +
          graft.Tables.dirKey(dir) +
          "_" + ProcessHandle.current().pid() +
          "_" + Integer.toHexString(System.identityHashCode(spark))
        val all = listensOf(spark, dir)
        saveCfIndex(all.filter($"o_orderkey" % 10 < 7).select($"user_id", $"item_id"), p)
        appendToCfIndex(all.filter($"o_orderkey" % 10 >= 7).select($"user_id", $"item_id"), p)
        p
      })
    }
    serveCfNeighbors(spark, indexPath)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "rec_item_item_cf_persisted" -> (recItemItemCfPersisted _),
    "rec_user_topn_persisted"    -> (recUserTopnPersisted _)
  )

  /** Same oracles as the in-session twins: the full-corpus results. */
  val oracleSql: Map[String, String] = Map(
    "rec_item_item_cf_persisted" -> Recommend.recItemItemCfSql,
    "rec_user_topn_persisted"    -> Recommend.recUserTopnSql
  )
}
