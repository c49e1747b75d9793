package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.EventsPipeline
import graft.streaming.EventsPipeline.{Event, Session}

/** Streaming/batch parity: the Structured Streaming pipelines must produce
  * the same results as their batch twins when fed the same events.
  */
class StreamingSpec extends SparkSuite {

  private def loadEvents(): Seq[Event] = {
    import spark.implicits._
    Tables.events(spark, sf)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[Event].collect().toSeq.sortBy(_.event_id)
  }

  test("windowed agg: streaming (complete mode counts) == batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = loadEvents()

    val stream = MemoryStream[Event]
    val q = EventsPipeline.windowedAgg(stream.toDF())
      .writeStream.outputMode("complete")
      .format("memory").queryName("win_out").start()
    try {
      // two micro-batches to exercise state merge across batches
      val (first, second) = events.splitAt(events.size / 2)
      stream.addData(first); q.processAllAvailable()
      stream.addData(second); q.processAllAvailable()

      val got = spark.table("win_out")
        .select($"window_start", $"event_type", $"n_events", $"total_value")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      val want = core.CoreQueries.streamWindowedAgg(spark, sf)
        .select($"window_start", $"event_type", $"n_events", $"total_value")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      assert(got == want)
    } finally q.stop()
  }

  test("sessionize: streaming sessions == batch sessions (closed by sentinel)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // split micro-batches on event TIME: sessionize carries a watermark, so
    // a batch must not contain rows older than the previous batch's
    // watermark (they would be dropped as late, breaking batch parity)
    val events = loadEvents().sortBy(e => (e.ts.getTime, e.event_id))
    // sentinel event per user, far in the future, closes every real session
    val maxTs = events.map(_.ts.getTime).max
    val sentinels = events.map(_.user_id).distinct.map(u =>
      Event(Long.MaxValue - u, new Timestamp(maxTs + 86400000L), u, "eof", 0.0))

    val stream = MemoryStream[Event]
    val q = EventsPipeline.sessionize(stream.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("sess_out").start()
    try {
      val (first, second) = events.splitAt(events.size / 2)
      stream.addData(first); q.processAllAvailable()
      stream.addData(second); q.processAllAvailable()
      stream.addData(sentinels); q.processAllAvailable()

      val got = spark.table("sess_out").as[Session].collect()
        .map(s => (s.user_id, s.n_events, s.session_start_sec, s.session_end_sec)).toSet
      val want = core.CoreQueries.sessionizeEvents(spark, sf)
        .collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"),
          r.getAs[Long]("session_start_sec"), r.getAs[Long]("session_end_sec"))).toSet
      assert(got == want)
    } finally q.stop()
  }

  test("sessionize: idle user's open session closes via event-time timeout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // user 1 goes idle after two events; user 2 keeps the watermark moving.
    // No further user-1 event ever arrives: the session can ONLY be emitted
    // by the EventTimeTimeout path (watermark > lastSec + gap).
    val base = 1000000L // above the initial watermark (0): ts == watermark is late
    def ev(id: Long, sec: Long, user: Long) =
      Event(id, new Timestamp((base + sec) * 1000L), user, "view", 1.0)
    val stream = MemoryStream[Event]
    val q = EventsPipeline.sessionize(stream.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("sess_timeout_out").start()
    try {
      stream.addData(Seq(ev(1, 0, 1), ev(2, 60, 1), ev(3, 100, 2)))
      q.processAllAvailable() // watermark still below user-1 deadline
      stream.addData(Seq(ev(4, 10000, 2)))
      q.processAllAvailable() // watermark → 10000s - 10min ≫ 60 + 1800
      stream.addData(Seq(ev(5, 20000, 2)))
      q.processAllAvailable() // timeout fires for user 1 (no data for it)
      val got = spark.table("sess_timeout_out").as[Session].collect()
        .filter(_.user_id == 1L)
        .map(s => (s.n_events, s.session_start_sec, s.session_end_sec))
      assert(got.toSeq == Seq((2L, base, base + 60L))) // emitted exactly once, via timeout
    } finally q.stop()
  }

  test("native session_window sessionize == custom flatMapGroupsWithState sessionize") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = loadEvents().sortBy(e => (e.ts.getTime, e.event_id))
    val maxTs = events.map(_.ts.getTime).max
    val sentinels = events.map(_.user_id).distinct.map(u =>
      Event(Long.MaxValue - u, new Timestamp(maxTs + 86400000L), u, "eof", 0.0))

    val stream = MemoryStream[Event]
    val q = EventsPipeline.sessionizeNative(stream.toDF())
      .writeStream.outputMode("append")
      .format("memory").queryName("sess_native_out").start()
    try {
      stream.addData(events); q.processAllAvailable()
      stream.addData(sentinels); q.processAllAvailable()
      val got = spark.table("sess_native_out")
        .collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"),
          r.getAs[Long]("session_start_sec"), r.getAs[Long]("session_end_sec"))).toSet
      val want = core.CoreQueries.sessionizeEvents(spark, sf)
        .collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"),
          r.getAs[Long]("session_start_sec"), r.getAs[Long]("session_end_sec"))).toSet
      assert(got == want)
    } finally q.stop()
  }

  test("upsert sink: re-delivered micro-batch does not duplicate rows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("graft_upsert").toString + "/wh"
    val events = loadEvents().take(100)
    val stream = MemoryStream[Event]
    val q = EventsPipeline.upsertWarehouseSink(stream.toDF(), out, "event_id")
      .option("checkpointLocation", java.nio.file.Files.createTempDirectory("graft_upck").toString)
      .start()
    try {
      stream.addData(events); q.processAllAvailable()
      assert(spark.read.parquet(out).count() == 100)
      // at-least-once upstream re-delivers the same rows in a later batch
      stream.addData(events); q.processAllAvailable()
      assert(spark.read.parquet(out).count() == 100) // ON CONFLICT DO NOTHING
      // a genuinely new row still lands
      stream.addData(events.map(e => e.copy(event_id = e.event_id + 1000000L)).take(5))
      q.processAllAvailable()
      assert(spark.read.parquet(out).count() == 105)
    } finally q.stop()
  }

  test("merge sink: re-delivered changed row updates payload, count unchanged") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("graft_merge").toString + "/wh"
    val events = loadEvents().take(100)
    val stream = MemoryStream[Event]
    val q = EventsPipeline.mergeWarehouseSink(stream.toDF(), out, "event_id")
      .option("checkpointLocation", java.nio.file.Files.createTempDirectory("graft_mgck").toString)
      .start()
    try {
      stream.addData(events); q.processAllAvailable()
      assert(spark.read.parquet(out).count() == 100)
      // the reference's ON CONFLICT DO UPDATE: same keys, refreshed payload
      val changed = events.take(10).map(e => e.copy(value = e.value + 1000.0))
      stream.addData(changed); q.processAllAvailable()
      val after = spark.read.parquet(out)
      assert(after.count() == 100) // count unchanged: matched keys updated in place
      val updated = after.filter($"event_id".isin(changed.map(_.event_id): _*))
        .select($"event_id", $"value").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      changed.foreach(e => assert(updated(e.event_id) == e.value, s"event ${e.event_id} not updated"))
      // unmatched rows kept their original payload
      val kept = after.filter($"event_id" === events(50).event_id)
        .select($"value").head().getDouble(0)
      assert(kept == events(50).value)
      // a genuinely new key still inserts
      stream.addData(events.take(3).map(e => e.copy(event_id = e.event_id + 5000000L)))
      q.processAllAvailable()
      assert(spark.read.parquet(out).count() == 103)
    } finally q.stop()
  }

  test("upsert sink quarantines null keys (no re-append on redelivery)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("graft_nullk").toString + "/wh"
    val stream = MemoryStream[(Option[Long], String)]
    val q = EventsPipeline.upsertWarehouseSink(
        stream.toDF().toDF("k", "payload"), out, "k")
      .option("checkpointLocation", java.nio.file.Files.createTempDirectory("graft_nkck").toString)
      .start()
    try {
      val rows = Seq((Some(1L), "a"), (Some(2L), "b"), (None: Option[Long], "null-key"))
      stream.addData(rows); q.processAllAvailable()
      stream.addData(rows); q.processAllAvailable() // redelivery
      stream.addData(rows); q.processAllAvailable() // and again
      val wh = spark.read.parquet(out)
      // NULL never equi-matches, so un-quarantined null keys would append
      // on every redelivery; the contract is: definite keys upsert once,
      // null keys never land
      assert(wh.count() == 2)
      assert(wh.filter($"k".isNull).count() == 0)
    } finally q.stop()
  }

  test("upsert freshRows: batch-key bloom filter lands on the warehouse scan") {
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft_bloomwh").toString + "/wh"
    spark.range(0, 1000).select($"id".as("event_id"), lit("old").as("payload"))
      .write.parquet(wh)
    val batch = spark.range(990, 1010).select($"id".as("event_id"), lit("new").as("payload"))
    val fresh = EventsPipeline.freshRows(batch, wh, "event_id")
    assert(fresh.select("event_id").collect().map(_.getLong(0)).toSet ==
      (1000L until 1010L).toSet) // anti-join semantics intact
    // the warehouse side is pre-filtered by the bloom over the batch's keys
    // BEFORE the anti-join: a FilterExec with Catalyst's NATIVE
    // might_contain sits on the warehouse scan (codegen'd into the scan
    // stage — no per-row Scala UDF), so at 100 TB most warehouse keys die
    // at the scan
    val nodes = tools.PlanWalk.flatten(fresh.queryExecution.executedPlan)
    val bloomOnWarehouse = nodes.exists {
      case f: org.apache.spark.sql.execution.FilterExec =>
        f.condition.toString.toLowerCase.contains("might_contain") &&
          tools.PlanWalk.flatten(f).exists {
            case s: org.apache.spark.sql.execution.FileSourceScanExec =>
              s.toString.contains("graft_bloomwh")
            case _ => false
          }
      case _ => false
    }
    assert(bloomOnWarehouse,
      fresh.queryExecution.executedPlan.toString)
    assert(!fresh.queryExecution.executedPlan.toString.contains("UDF"),
      "per-row Scala UDF crept back into the bloom probe:\n" +
        fresh.queryExecution.executedPlan.toString)
  }

  test("merge sink: a batch touching one bucket leaves other buckets' files unmodified") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_mbuck").toString + "/wh"
    val buckets = 16
    // seed: enough keys to populate every bucket
    val seed = spark.range(0, 200).select($"id".as("event_id"), lit("seed").as("payload"))
    streaming.EventsPipeline.mergeBatch(seed, root, "event_id", buckets, 0L)
    def files(): Map[String, Set[(String, Long, Long)]] = {
      val base = new java.io.File(root)
      base.listFiles().filter(_.getName.startsWith("_bucket=")).map { d =>
        d.getName -> d.listFiles().filter(_.getName.endsWith(".parquet"))
          .map(f => (f.getName, f.lastModified(), f.length())).toSet
      }.toMap
    }
    val before = files()
    assert(before.size == buckets, s"seed did not cover every bucket: ${before.keys}")
    // one-key batch: exactly one bucket is affected
    val one = Seq((7L, "updated")).toDF("event_id", "payload")
    val hitBucket = one.select(
      pmod(xxhash64($"event_id".cast("string")), lit(buckets)).cast("int")).head().getInt(0)
    streaming.EventsPipeline.mergeBatch(one, root, "event_id", buckets, 1L)
    val after = files()
    before.foreach { case (dir, fs) =>
      if (dir == s"_bucket=$hitBucket")
        assert(after(dir) != fs, s"affected bucket $dir was not rewritten")
      else
        assert(after(dir) == fs, s"untouched bucket $dir was rewritten: $fs -> ${after(dir)}")
    }
    // and the merge itself is correct: count stable, payload updated
    val wh = spark.read.parquet(root)
    assert(wh.count() == 200)
    assert(wh.filter($"event_id" === 7L).head().getAs[String]("payload") == "updated")
  }

  test("merge+compact composition: hot-key batches keep per-bucket file counts bounded") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_mhot").toString + "/wh"
    val buckets = 8
    def bucketOf(k: Long): Int = Seq(k).toDF("k")
      .select(pmod(xxhash64($"k".cast("string")), lit(buckets)).cast("int")).head().getInt(0)
    // a hot BUCKET: 16 distinct keys all hashing into key 1's bucket (so
    // each merge spreads the bucket's rows over several write partitions
    // → multiple files per rewrite), plus one cold key elsewhere
    val hotBucket = bucketOf(1L)
    val hotKeys = (1L to 400L).filter(bucketOf(_) == hotBucket).take(16)
    assert(hotKeys.size == 16)
    val coldKey = (1L to 64L).find(bucketOf(_) != hotBucket).get
    def files(b: Int): Set[(String, Long, Long)] = {
      val d = new java.io.File(root, s"_bucket=$b")
      if (!d.exists()) Set.empty
      else d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => (f.getName, f.lastModified(), f.length())).toSet
    }
    // batch 0 seeds cold + hot; batches 1..4 hammer ONLY the hot bucket
    streaming.EventsPipeline.mergeBatch(
      (hotKeys.map(k => (k, "v0")) :+ (coldKey, "cold")).toDF("event_id", "payload"),
      root, "event_id", buckets, 0L)
    val coldFiles = files(bucketOf(coldKey))
    val countsPerBatch = (1 to 4).map { i =>
      streaming.EventsPipeline.mergeBatch(
        hotKeys.map(k => (k, s"v$i")).toDF("event_id", "payload"),
        root, "event_id", buckets, i.toLong)
      files(hotBucket).size
    }
    // dynamic overwrite REPLACES the bucket: file count is a function of
    // the batch's write partitioning, not of how many batches ran — it
    // must not grow with batch count and stays under the write parallelism
    assert(countsPerBatch.distinct.size == 1,
      s"hot bucket file count grew across identical batches: $countsPerBatch")
    assert(countsPerBatch.head <= spark.conf.get("spark.sql.shuffle.partitions").toInt,
      s"hot bucket files exceed write parallelism: $countsPerBatch")
    assert(files(bucketOf(coldKey)) == coldFiles, "cold bucket touched by hot-key merges")

    // composition with the compaction job: the multi-file hot bucket
    // compacts to ONE file, the cold bucket is never read or rewritten
    assert(countsPerBatch.last >= 2,
      "precondition: hot bucket must hold multiple files for compaction to act")
    val compacted = streaming.EventsPipeline.compactBuckets(spark, root, maxFiles = 1)
    assert(compacted.contains(hotBucket) && !compacted.contains(bucketOf(coldKey)))
    assert(files(hotBucket).size == 1)
    assert(files(bucketOf(coldKey)) == coldFiles, "compaction touched the under-ceiling cold bucket")
    // and the composed warehouse still merges correctly afterwards
    streaming.EventsPipeline.mergeBatch(
      Seq((hotKeys.head, "v5")).toDF("event_id", "payload"), root, "event_id", buckets, 5L)
    val wh = spark.read.parquet(root)
    assert(wh.count() == hotKeys.size + 1)
    assert(wh.filter($"event_id" === hotKeys.head).head().getAs[String]("payload") == "v5")
    assert(wh.filter($"event_id" === coldKey).head().getAs[String]("payload") == "cold")
  }

  test("append+compact: compaction bounds file counts, preserves rows, skips small buckets") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_cmpct").toString + "/wh"
    val buckets = 8
    def bucketOf(k: Long): Int = Seq(k).toDF("k")
      .select(pmod(xxhash64($"k".cast("string")), lit(buckets)).cast("int")).head().getInt(0)
    val k1 = 7L
    // a second key whose bucket differs from k1's (hash-dependent, so probe)
    val k2 = (1L to 64L).find(bucketOf(_) != bucketOf(k1)).get
    val stream = MemoryStream[(Long, String)]
    val q = streaming.EventsPipeline.appendBucketedSink(
        stream.toDF().toDF("event_id", "payload"), root, "event_id", buckets)
      .option("checkpointLocation", java.nio.file.Files.createTempDirectory("graft_cmpctck").toString)
      .start()
    try {
      stream.addData(Seq((k1, "a"))); q.processAllAvailable()
      stream.addData(Seq((k1, "b"))); q.processAllAvailable()
      stream.addData(Seq((k1, "c"), (k2, "d"))); q.processAllAvailable()
    } finally q.stop()
    def files(b: Int): Set[(String, Long, Long)] =
      new java.io.File(root, s"_bucket=$b").listFiles()
        .filter(_.getName.endsWith(".parquet"))
        .map(f => (f.getName, f.lastModified(), f.length())).toSet
    val (b1, b2) = (bucketOf(k1), bucketOf(k2))
    assert(files(b1).size == 3, "append sink must write one file per (batch, bucket)")
    assert(files(b2).size == 1)
    val smallBefore = files(b2)
    val compacted = streaming.EventsPipeline.compactBuckets(spark, root, maxFiles = 2)
    assert(compacted == Seq(b1), s"only the oversized bucket compacts: $compacted")
    assert(files(b1).size == 1, "compaction must leave one file per bucket")
    assert(files(b2) == smallBefore, "bucket under the ceiling was rewritten")
    val rows = spark.read.parquet(root).select($"event_id", $"payload")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(rows == Set((k1, "a"), (k1, "b"), (k1, "c"), (k2, "d")), rows)
    // idempotent: a second pass finds nothing over the ceiling
    assert(streaming.EventsPipeline.compactBuckets(spark, root, maxFiles = 2).isEmpty)
  }

  test("scd2 dim sink: attribute change chains half-open versions; redelivery is a no-op") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val path = java.nio.file.Files.createTempDirectory("graft_scd2").toString + "/dim"
    def ts(sec: Long) = new Timestamp(sec * 1000L)
    val stream = MemoryStream[(Long, String, Timestamp)]
    val q = streaming.EventsPipeline.scd2DimSink(
        stream.toDF().toDF("user_id", "plan", "ts"), path, "user_id", "ts", buckets = 8)
      .option("checkpointLocation", java.nio.file.Files.createTempDirectory("graft_scd2ck").toString)
      .start()
    try {
      stream.addData(Seq((1L, "free", ts(1000)), (2L, "pro", ts(1000))))
      q.processAllAvailable()
      val d1 = spark.read.parquet(path)
      assert(d1.count() == 2 && d1.filter($"is_current").count() == 2)
      // batch 2: user 1 changes plan — v1 closes half-open at the new ts,
      // v2 opens current
      stream.addData(Seq((1L, "plus", ts(2000))))
      q.processAllAvailable()
      val u1 = spark.read.parquet(path).filter($"user_id" === 1L)
        .select($"version", $"plan", $"valid_from_sec", $"valid_to_sec", $"is_current")
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3), r.getBoolean(4)))
        .sortBy(_._1).toSeq
      assert(u1 == Seq((1L, "free", 1000L, 2000L, false), (2L, "plus", 2000L, -1L, true)), u1)
      // user 2 untouched throughout
      val u2 = spark.read.parquet(path).filter($"user_id" === 2L).collect()
      assert(u2.length == 1 && u2.head.getAs[String]("plan") == "pro" &&
        u2.head.getAs[Boolean]("is_current"))
      // foreachBatch retry: re-applying the SAME batch is a no-op (the
      // incoming attrs equal the version they created)
      streaming.EventsPipeline.scd2Fold(
        Seq((1L, "plus", ts(2000))).toDF("user_id", "plan", "ts"), path, "user_id", "ts", 8, 1L)
      assert(spark.read.parquet(path).count() == 3)
      // and at-least-once upstream redelivery in a LATER batch is also a no-op
      stream.addData(Seq((1L, "plus", ts(2000))))
      q.processAllAvailable()
      assert(spark.read.parquet(path).count() == 3)
    } finally q.stop()
  }

  test("streaming kmeans: fresh run tag against existing state fails loudly at batch 0") {
    import spark.implicits._
    val statePath = java.nio.file.Files.createTempDirectory("graft_skmtag").toString + "/state"
    val vecs = Tables.embeddings(spark, sf).select($"vec_id", $"embedding").limit(50)
    EventsPipeline.kmeansFold(vecs, statePath, k = 4, batchId = 0L, runTag = "run-a")
    // same run re-delivers batch 0 (crash between state write and
    // checkpoint commit): skipped, state unchanged
    EventsPipeline.kmeansFold(vecs, statePath, k = 4, batchId = 0L, runTag = "run-a")
    assert(spark.read.parquet(statePath).collect().map(_.getAs[Long]("n")).sum == 50L)
    // a NEW run (fresh checkpoint, batch ids restart at 0) against the same
    // state is ambiguous — batchId == last_batch_id == 0 looks exactly like
    // the retry above, so only the run tag can force the loud failure
    intercept[IllegalStateException] {
      EventsPipeline.kmeansFold(vecs, statePath, k = 4, batchId = 0L, runTag = "run-b")
    }
  }

  test("streaming kmeans: refolding the same batch id is skipped (retry-safe)") {
    import spark.implicits._
    val statePath = java.nio.file.Files.createTempDirectory("graft_skmr").toString + "/state"
    val vecs = Tables.embeddings(spark, sf).select($"vec_id", $"embedding").limit(100)
    EventsPipeline.kmeansFold(vecs, statePath, k = 4, batchId = 0L)
    def state() = spark.read.parquet(statePath).collect()
      .map(r => (r.getAs[Long]("cell"), r.getAs[Seq[Long]]("sums"), r.getAs[Long]("n"))).toSet
    val s1 = state()
    assert(s1.toSeq.map(_._3).sum == 100L)
    // foreachBatch retry after a crash between state overwrite and
    // checkpoint commit re-delivers the SAME batchId — must be a no-op
    EventsPipeline.kmeansFold(vecs, statePath, k = 4, batchId = 0L)
    assert(state() == s1, "refold of an applied batch double-counted the vectors")
    // the next batch id folds normally
    EventsPipeline.kmeansFold(vecs, statePath, k = 4, batchId = 1L)
    assert(state().toSeq.map(_._3).sum == 200L)
  }

  test("streaming kmeans folds micro-batches into exact running cell state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val statePath = java.nio.file.Files.createTempDirectory("graft_skm").toString + "/state"
    val vecs = Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding").as[(Long, Seq[Float])]
      .collect().toSeq.sortBy(_._1).take(200)
    val stream = MemoryStream[(Long, Seq[Float])]
    val q = EventsPipeline.streamingKmeans(
        stream.toDF().toDF("vec_id", "embedding"), statePath, k = 8)
      .option("checkpointLocation", java.nio.file.Files.createTempDirectory("graft_skmck").toString)
      .start()
    try {
      val (a, b) = vecs.splitAt(100)
      stream.addData(a); q.processAllAvailable()
      val s1 = spark.read.parquet(statePath).collect()
      assert(s1.length <= 8 && s1.map(_.getAs[Long]("n")).sum == 100L)
      stream.addData(b); q.processAllAvailable()
      val s2 = spark.read.parquet(statePath).collect()
      assert(s2.map(_.getAs[Long]("n")).sum == 200L)
      // exact-state invariant: per-dimension sums over all cells equal the
      // quantized column sums over every vector ever seen
      val gotDim0 = s2.map(_.getAs[Seq[Long]]("sums").head).sum
      val wantDim0 = vecs.map(v => math.floor(v._2.head * 1000.0 + 0.5).toLong).sum
      assert(gotDim0 == wantDim0)
    } finally q.stop()
  }

  test("streaming dedup drops duplicate event ids within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = loadEvents().take(200)
    val dupes = events.take(50) // re-deliver the first 50 (at-least-once upstream)
    val stream = MemoryStream[Event]
    val q = EventsPipeline.streamingDedup(stream.toDF())
      .writeStream.outputMode("append").format("memory").queryName("dedup_out").start()
    try {
      stream.addData(events); q.processAllAvailable()
      stream.addData(dupes); q.processAllAvailable()
      val got = spark.table("dedup_out").select("event_id").collect().map(_.getLong(0))
      assert(got.length == got.distinct.length)
      assert(got.length == 200)
    } finally q.stop()
  }

  test("foreachBatch warehouse sink loads micro-batches partitioned by type") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("graft_wh").toString
    val events = loadEvents().take(300)
    val stream = MemoryStream[Event]
    val q = EventsPipeline.warehouseSink(stream.toDF(), out)
      .option("checkpointLocation", java.nio.file.Files.createTempDirectory("graft_ck").toString)
      .start()
    try {
      val (a, b) = events.splitAt(150)
      stream.addData(a); q.processAllAvailable()
      stream.addData(b); q.processAllAvailable()
      val loaded = spark.read.parquet(out)
      assert(loaded.count() == 300)
      assert(loaded.select("_batch_id").distinct().count() >= 2)
      assert(loaded.select("event_type").distinct().count() == 5)
    } finally q.stop()
  }

  test("stream-static enrichment joins the dim per micro-batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Tables.supplier(spark, sf)
      .select($"s_suppkey".as("user_id"), $"s_name".as("display_name"))
    val events = loadEvents().take(100)
    val stream = MemoryStream[Event]
    val q = EventsPipeline.enrichStream(stream.toDF(), dim, "user_id")
      .writeStream.outputMode("append").format("memory").queryName("enrich_out").start()
    try {
      stream.addData(events); q.processAllAvailable()
      val got = spark.table("enrich_out")
      assert(got.count() == 100) // left join keeps every event
      val dimKeys = dim.collect().map(_.getLong(0)).toSet
      got.collect().foreach { r =>
        val matched = !r.isNullAt(r.fieldIndex("display_name"))
        assert(matched == dimKeys.contains(r.getAs[Long]("user_id")))
      }
    } finally q.stop()
  }

  test("stream-stream interval join == batch interval join") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = loadEvents()
    val stream = MemoryStream[Event]
    val q = EventsPipeline.purchaseAttribution(stream.toDF())
      .writeStream.outputMode("append").format("memory").queryName("attr_out").start()
    try {
      val (a, b) = events.splitAt(events.size / 2)
      stream.addData(a); q.processAllAvailable()
      stream.addData(b); q.processAllAvailable()
      val got = spark.table("attr_out")
        .select("purchase_id", "signup_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet

      val ev = Tables.events(spark, sf)
      val p = ev.filter($"event_type" === "purchase")
        .select($"event_id".as("purchase_id"), $"user_id", $"ts".as("purchase_ts"))
      val sgn = ev.filter($"event_type" === "signup")
        .select($"event_id".as("signup_id"), $"user_id".as("s_user_id"), $"ts".as("signup_ts"))
      val want = p.join(sgn,
          $"user_id" === $"s_user_id" && $"signup_ts" <= $"purchase_ts" &&
            $"signup_ts" >= $"purchase_ts" - expr("INTERVAL 1 HOUR"))
        .select("purchase_id", "signup_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(want.nonEmpty && got == want)
    } finally q.stop()
  }

  test("end-to-end streaming ETL: file ingest -> dedup -> idempotent warehouse") {
    import spark.implicits._
    // the reference's main.py loop (extract -> clean -> conflict-free load)
    // as one continuous pipeline from the existing pieces
    val srcDir = java.nio.file.Files.createTempDirectory("graft_e2e_src").toString
    val whPath = java.nio.file.Files.createTempDirectory("graft_e2e_wh").toString + "/wh"
    val events = Tables.events(spark, sf)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
    events.repartition(8).write.mode("overwrite").parquet(srcDir)
    val n = events.count()

    val pipeline = EventsPipeline.streamingDedup(EventsPipeline.fileIngest(spark, srcDir))
    val q = EventsPipeline.upsertWarehouseSink(pipeline, whPath, "event_id")
      .option("checkpointLocation", java.nio.file.Files.createTempDirectory("graft_e2e_ck").toString)
      .start()
    try {
      q.processAllAvailable()
      val loaded = spark.read.parquet(whPath)
      assert(loaded.count() == n)
      assert(loaded.select("event_id").distinct().count() == n)
    } finally q.stop()
  }

  test("file ingest picks up the events directory incrementally") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_stream").toString
    Tables.events(spark, sf)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .repartition(8).write.mode("overwrite").parquet(tmp)

    val q = EventsPipeline.fileIngest(spark, tmp)
      .groupBy($"event_type").agg(count(lit(1)).as("n"))
      .writeStream.outputMode("complete").format("memory").queryName("ingest_out").start()
    try {
      q.processAllAvailable()
      val total = spark.table("ingest_out").agg(sum($"n")).collect().head.getLong(0)
      assert(total == Tables.events(spark, sf).count())
    } finally q.stop()
  }

  test("streaming classifier screen == batch classifier on every doc") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val stream = MemoryStream[(Long, String)]
    val q = graft.streaming.CorpusStream.classifyStream(
        stream.toDF().toDF("doc_id", "text"))
      .writeStream.outputMode("append").format("memory").queryName("clf_out").start()
    try {
      val (a, b) = docs.splitAt(docs.size / 2)
      stream.addData(a); q.processAllAvailable()
      stream.addData(b); q.processAllAvailable()
      val streamed = spark.table("clf_out")
        .select($"doc_id", $"margin", $"label")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      val batch = ops.LlmQueries.qualityClassifier(spark, sf)
        .select($"doc_id", $"margin", $"label")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      assert(batch.nonEmpty && streamed == batch)
    } finally q.stop()
  }

  test("streaming clip screen == batch clip filter on every pair") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val pairs = ops.Multimodal.pairedEmbeddings(spark, sf)
      .collect().map(r => (r.getAs[Long]("pair_id"), r.getAs[Long]("caption_id"),
        r.getAs[Long]("image_id"), r.getAs[Seq[Long]]("va").toList, r.getAs[Long]("na"),
        r.getAs[Seq[Long]]("vb").toList, r.getAs[Long]("nb"))).toSeq
    val stream = MemoryStream[(Long, Long, Long, Seq[Long], Long, Seq[Long], Long)]
    val q = graft.streaming.CorpusStream.clipFilterStream(
        stream.toDF().toDF("pair_id", "caption_id", "image_id", "va", "na", "vb", "nb"))
      .writeStream.outputMode("append").format("memory").queryName("clip_out").start()
    try {
      val (a, b) = pairs.splitAt(pairs.size / 2)
      stream.addData(a); q.processAllAvailable()
      stream.addData(b); q.processAllAvailable()
      val streamed = spark.table("clip_out")
        .select($"pair_id", $"dot", $"cosine", $"verdict")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getString(3))).toSet
      val batch = ops.Multimodal.multimodalClipFilter(spark, sf)
        .select($"pair_id", $"dot", $"cosine", $"verdict")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getString(3))).toSet
      assert(batch.nonEmpty && streamed == batch)
      assert(batch.exists(_._4 == "keep") && batch.exists(_._4 == "drop"))
    } finally q.stop()
  }

  test("domain mix stream: keep set == batch resample's keep set on replayed batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val thr = graft.streaming.CorpusStream.domainMixThresholds(spark, sf)

    // the batch operator's keep rule, evaluated doc-by-doc (the rollup's
    // n_sampled is the per-source count of exactly this set)
    val docsDf = Tables.documents(spark, sf).select($"doc_id", $"source", $"n_chars")
    val expectedKeep = docsDf
      .withColumn("bucket", ops.CorpusOps.domainMixBucket($"doc_id"))
      .join(thr.select($"source", $"threshold"), Seq("source"))
      .filter($"bucket" < $"threshold")
      .select($"doc_id").collect().map(_.getLong(0)).toSet

    val docs = docsDf.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    val stream = MemoryStream[(Long, String, Long)]
    val q = graft.streaming.CorpusStream.sampleDomainMixStream(
        stream.toDF().toDF("doc_id", "source", "n_chars"), thr)
      .writeStream.outputMode("append").format("memory").queryName("mix_out").start()
    try {
      val (a, b) = docs.splitAt(docs.size / 2)
      stream.addData(a); q.processAllAvailable()
      stream.addData(b); q.processAllAvailable()
      val streamed = spark.table("mix_out")
        .select($"doc_id").collect().map(_.getLong(0)).toSet
      assert(expectedKeep.nonEmpty)
      assert(streamed == expectedKeep,
        s"missed=${(expectedKeep -- streamed).take(5)} extra=${(streamed -- expectedKeep).take(5)}")
      // and the per-source counts match the batch rollup's n_sampled
      val streamedPerSource = spark.table("mix_out")
        .groupBy($"source").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val batchRollup = ops.CorpusOps.sampleDomainMix(spark, sf)
        .collect().map(r => r.getAs[String]("source") -> r.getAs[Long]("n_sampled"))
        .filter(_._2 > 0).toMap
      assert(streamedPerSource == batchRollup)
    } finally q.stop()

    // the testdata sources are equal-sized (every threshold = 10⁶ → all
    // kept), so the DROP branch needs a skewed corpus: 100 "web" docs vs
    // 25 "books" → web's threshold is 500000 and real drops must occur
    val skewed = ((1L to 100L).map(i => (i, "web", 10L)) ++
      (101L to 125L).map(i => (i, "books", 10L))).toDF("doc_id", "source", "n_chars")
    val skewThr = ops.CorpusOps.domainMixThresholds(skewed)
    val skewExpected = skewed
      .withColumn("bucket", ops.CorpusOps.domainMixBucket($"doc_id"))
      .join(skewThr.select($"source", $"threshold"), Seq("source"))
      .filter($"bucket" < $"threshold")
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    val skewStream = MemoryStream[(Long, String, Long)]
    val q2 = graft.streaming.CorpusStream.sampleDomainMixStream(
        skewStream.toDF().toDF("doc_id", "source", "n_chars"), skewThr)
      .writeStream.outputMode("append").format("memory").queryName("mix_skew_out").start()
    try {
      skewStream.addData(skewed.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq)
      q2.processAllAvailable()
      val got = spark.table("mix_skew_out").select($"doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(skewExpected.size < 125 && skewExpected.nonEmpty,
        s"skewed corpus must create real drop-off, kept ${skewExpected.size}")
      assert(got == skewExpected)
    } finally q2.stop()

    // unknown-source policy: a source absent from the threshold table
    // (appeared after thresholds were computed) must be KEPT by default
    // and DROPPED under keepUnknown = false — never silently inner-joined
    // away
    val mixed = Seq((1L, "web", 10L), (2L, "brand_new_source", 10L))
    val keepStream = MemoryStream[(Long, String, Long)]
    val q3 = graft.streaming.CorpusStream.sampleDomainMixStream(
        keepStream.toDF().toDF("doc_id", "source", "n_chars"), skewThr)
      .writeStream.outputMode("append").format("memory").queryName("mix_unknown_keep").start()
    try {
      keepStream.addData(mixed)
      q3.processAllAvailable()
      val got = spark.table("mix_unknown_keep").select($"doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(got.contains(2L), s"unknown source must default to keep, got $got")
    } finally q3.stop()
    val dropStream = MemoryStream[(Long, String, Long)]
    val q4 = graft.streaming.CorpusStream.sampleDomainMixStream(
        dropStream.toDF().toDF("doc_id", "source", "n_chars"), skewThr,
        keepUnknown = false)
      .writeStream.outputMode("append").format("memory").queryName("mix_unknown_drop").start()
    try {
      dropStream.addData(mixed)
      q4.processAllAvailable()
      val got = spark.table("mix_unknown_drop").select($"doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(!got.contains(2L), s"keepUnknown=false must drop unknown sources, got $got")
    } finally q4.stop()
  }

  test("streaming pii screen == batch scrub on every doc (replayed batches)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val stream = MemoryStream[(Long, String)]
    val q = graft.streaming.CorpusStream.piiScrubStream(
        stream.toDF().toDF("doc_id", "text"))
      .writeStream.outputMode("append").format("memory").queryName("pii_out").start()
    try {
      val (a, b) = docs.splitAt(docs.size / 2)
      stream.addData(a); q.processAllAvailable()
      stream.addData(b); q.processAllAvailable()
      def rows(df: org.apache.spark.sql.DataFrame) = df
        .select($"doc_id", $"n_emails", $"n_ips", $"n_phones", $"scrubbed")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toSet
      val streamed = rows(spark.table("pii_out"))
      val batch = rows(ops.CorpusOps.textPiiScrub(spark, sf))
      assert(batch.nonEmpty && streamed == batch)
    } finally q.stop()
  }

  test("streaming near-dedup screen == batch banded dedup against the persisted index") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val indexPath = java.nio.file.Files.createTempDirectory("graft_ndidx").toString + "/idx"
    ops.ScaleDedup.saveBandIndex(spark, sf, indexPath) // corpus = doc_id <= 250

    val incoming = Tables.documents(spark, sf)
      .filter($"doc_id" > 250)
      .select($"doc_id", $"lang", $"text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    val stream = MemoryStream[(Long, String, String)]
    val q = graft.streaming.CorpusStream.nearDedupStream(
        stream.toDF().toDF("doc_id", "lang", "text"), indexPath)
      .writeStream.outputMode("append").format("memory").queryName("nd_out").start()
    try {
      val (a, b) = incoming.splitAt(incoming.size / 2)
      stream.addData(a); q.processAllAvailable()
      stream.addData(b); q.processAllAvailable()
      val streamedPairs = spark.table("nd_out")
        .select($"doc_id", $"corpus_doc_id", $"jaccard").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

      // the batch twin keeps only each doc's BEST match (a window the
      // stream cannot run): its rows must all appear in the stream's
      // audit log with identical jaccard, and the flagged DOC set must
      // match exactly
      val batch = ops.ScaleDedup.dedupIncrementalBandedFromIndex(spark, sf, indexPath)
        .select($"doc_id", $"corpus_doc_id", $"jaccard")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(batch.nonEmpty)
      assert(batch.subsetOf(streamedPairs),
        s"batch best-matches missing from stream: ${(batch -- streamedPairs).take(5)}")
      assert(streamedPairs.map(_._1) == batch.map(_._1),
        "flagged doc sets must match")
    } finally q.stop()
  }

  test("streaming shard writer == batch writeShards on replayed batches (idempotent, same layout)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docsDf = Tables.documents(spark, sf).select($"doc_id", $"lang", $"text")
    val docs = docsDf.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq

    val base = java.nio.file.Files.createTempDirectory("graft_shard_stream").toString
    val batchPath = base + "/batch"
    ops.Curation.writeShards(docsDf, batchPath)

    val streamPath = base + "/stream"
    val stream = MemoryStream[(Long, String, String)]
    val q = graft.streaming.CorpusStream.shardSink(
        stream.toDF().toDF("doc_id", "lang", "text"), streamPath)
      .option("checkpointLocation", base + "/ck")
      .start()
    try {
      val (a, b) = docs.splitAt(docs.size / 2)
      stream.addData(a); q.processAllAvailable()
      stream.addData(b); q.processAllAvailable()
      // at-least-once upstream re-delivers batch b — must append nothing
      stream.addData(b); q.processAllAvailable()

      def readBack(p: String) = spark.read.parquet(p)
        .select($"shard".cast("long"), $"order_key", $"doc_id", $"lang", $"text")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getString(3), r.getString(4)))

      val fromStream = readBack(streamPath)
      val fromBatch = readBack(batchPath)
      assert(fromStream.length == docs.length, "redelivered batch must be a no-op")
      // identical shard assignment + keys + payload
      assert(fromStream.toSet == fromBatch.toSet)
      // within-shard global order is recovered by the persisted order_key:
      // sorting each shard's appended files on it yields the same sequence
      // the batch writer materialized as one pre-sorted file per shard
      val streamSorted = fromStream.groupBy(_._1).view
        .mapValues(_.sortBy(t => (t._2, t._3)).map(_._3).toSeq).toMap
      val batchSorted = fromBatch.groupBy(_._1).view
        .mapValues(_.sortBy(t => (t._2, t._3)).map(_._3).toSeq).toMap
      assert(streamSorted == batchSorted)
      assert(streamSorted.keySet.size == 16, "every shard dir populated")
    } finally q.stop()
  }

  test("streaming decontamination == batch: same contaminated doc set, stateless plan") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val bench = graft.streaming.CorpusStream.benchGrams(spark, sf)

    val docs = Tables.documents(spark, sf)
      .filter($"doc_id" % 37 =!= 0)
      .select($"doc_id", $"text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq

    val stream = MemoryStream[(Long, String)]
    val q = graft.streaming.CorpusStream.decontaminateStream(
        stream.toDF().toDF("doc_id", "text"), bench)
      .writeStream.outputMode("append").format("memory").queryName("decon_out").start()
    try {
      val (a, b) = docs.splitAt(docs.size / 2)
      stream.addData(a); q.processAllAvailable()
      stream.addData(b); q.processAllAvailable()
      val streamed = spark.table("decon_out")
        .select($"doc_id").distinct().collect().map(_.getLong(0)).toSet

      val batch = ops.CorpusOps.decontaminateNgram(spark, sf)
        .filter($"verdict" === "drop_contaminated")
        .collect().map(_.getAs[Long]("doc_id")).toSet
      assert(batch.nonEmpty)
      assert(streamed == batch,
        s"missed=${(batch -- streamed).take(5)} extra=${(streamed -- batch).take(5)}")
    } finally q.stop()
  }

  test("streaming normalization == batch text_normalize on replayed batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val stream = MemoryStream[(Long, String)]
    val q = graft.streaming.CorpusStream.normalizeStream(
        stream.toDF().toDF("doc_id", "text"))
      .writeStream.outputMode("append").format("memory").queryName("norm_out").start()
    try {
      val (a, b) = docs.splitAt(docs.size / 2)
      stream.addData(a); q.processAllAvailable()
      stream.addData(b); q.processAllAvailable()
      val streamed = spark.table("norm_out")
        .collect().map(_.toSeq).toSet
      val batch = ops.CorpusOps.textNormalize(spark, sf)
        .collect().map(_.toSeq).toSet
      assert(batch.nonEmpty && streamed == batch)
    } finally q.stop()
  }

  test("streaming LR quality screen == batch trained classifier on replayed batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val w = ops.QualityTrain.trainedWeights(spark, sf)
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq

    val stream = MemoryStream[(Long, String)]
    val q = graft.streaming.CorpusStream.classifyLrStream(
        stream.toDF().toDF("doc_id", "text"), w)
      .writeStream.outputMode("append").format("memory").queryName("clf_lr_out").start()
    try {
      val (a, b) = docs.splitAt(docs.size / 2)
      stream.addData(a); q.processAllAvailable()
      stream.addData(b); q.processAllAvailable()
      val streamed = spark.table("clf_lr_out")
        .select($"doc_id", $"prob_hq", $"label")
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSet
      val batch = ops.QualityTrain.qualityClassifierLr(spark, sf)
        .select($"doc_id", $"prob_hq", $"label")
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSet
      assert(batch.nonEmpty && streamed == batch)
    } finally q.stop()
  }
}

/** streamingAnomaly: trailing-baseline z-scores over closing days, bounded
  * state, retry idempotence — driven through the factored fold body.
  */
class StreamingAnomalySpec extends SparkSuite {
  import graft.streaming.EventsPipeline

  private def mkBatch(rows: Seq[(String, String, Int)]) = {
    import spark.implicits._
    // rows: (event_type, day, count) exploded into that many events
    rows.flatMap { case (t, d, n) =>
      (1 to n).map(i => (t, java.sql.Timestamp.valueOf(s"$d 12:00:00"), i.toLong))
    }.toDF("event_type", "ts", "user_id")
  }

  test("spike day flagged against the trailing baseline; last day stays open") {
    import spark.implicits._
    val statePath = java.nio.file.Files.createTempDirectory("graft_anom").toString
    // jittered-constant rate (variance > 0), one 5× spike on day 08
    val days = Seq(
      ("2024-01-01", 100), ("2024-01-02", 98), ("2024-01-03", 103),
      ("2024-01-04", 101), ("2024-01-05", 97), ("2024-01-06", 102),
      ("2024-01-07", 99), ("2024-01-08", 500), ("2024-01-09", 100),
      ("2024-01-10", 101))
    val batches = days.grouped(4).toSeq // 3 micro-batches, multi-day each
    batches.zipWithIndex.foreach { case (b, i) =>
      EventsPipeline.anomalyFold(mkBatch(b.map { case (d, n) => ("play", d, n) }),
        statePath, i.toLong, "run-a")
    }
    val verdicts = spark.read.parquet(s"$statePath/verdicts")
      .collect().map(r => r.getAs[String]("day") ->
        (r.getAs[Long]("n_events"), r.getAs[Double]("z_score"), r.getAs[String]("verdict"))).toMap
    // every day but the still-open last one is scored exactly once
    assert(verdicts.keySet == days.map(_._1).init.toSet)
    assert(verdicts("2024-01-08")._3 == "anomaly", verdicts("2024-01-08").toString)
    (days.init.map(_._1).toSet - "2024-01-08").foreach { d =>
      assert(verdicts(d)._3 == "normal", s"$d: ${verdicts(d)}")
    }
    // day 1 scored with an empty baseline → z defined as 0
    assert(verdicts("2024-01-01")._2 == 0.0)
    // trailing semantics: the spike is NOT in the baseline of the days
    // before it, and IS in the stats afterwards
    val st = streaming.StateFold.readState(spark, statePath).get
      .filter($"kind" === "stats").collect()
    assert(st.length == 1)
    val closed = days.init.map(_._2.toDouble)
    assert(st.head.getAs[Long]("n") == closed.length)
    assert(math.abs(st.head.getAs[Double]("s") - closed.sum) < 1e-9)
    // state is bounded: stats rows = #types, open rows = #types × open days
    val open = streaming.StateFold.readState(spark, statePath).get.filter($"kind" === "open").collect()
    assert(open.length == 1 && open.head.getAs[String]("day") == "2024-01-10")
  }

  test("per-type baselines are independent: one type's spike never flags the other") {
    import spark.implicits._
    val statePath = java.nio.file.Files.createTempDirectory("graft_anom_types").toString
    // 'play' holds a jittered 100/day; 'skip' runs at a jittered 10/day —
    // a tenth of play's volume, which a SHARED baseline would call anomalous
    // every single day. Day 06 spikes 'play' only.
    val days = Seq("2024-03-01" -> (100, 11), "2024-03-02" -> (98, 10),
      "2024-03-03" -> (103, 9), "2024-03-04" -> (101, 10), "2024-03-05" -> (97, 11),
      "2024-03-06" -> (500, 10), "2024-03-07" -> (99, 9), "2024-03-08" -> (100, 10))
    days.grouped(3).zipWithIndex.foreach { case (b, i) =>
      EventsPipeline.anomalyFold(
        mkBatch(b.flatMap { case (d, (p, s)) => Seq(("play", d, p), ("skip", d, s)) }),
        statePath, i.toLong, "run-a")
    }
    val v = spark.read.parquet(s"$statePath/verdicts")
      .collect().map(r => (r.getAs[String]("event_type"), r.getAs[String]("day")) ->
        r.getAs[String]("verdict")).toMap
    assert(v(("play", "2024-03-06")) == "anomaly")
    // every skip day is normal — a shared baseline would flag them all
    v.keys.filter(_._1 == "skip").foreach { k => assert(v(k) == "normal", k.toString) }
    // play's non-spike days normal too
    (days.map(_._1).init.toSet - "2024-03-06").foreach { d =>
      assert(v(("play", d)) == "normal", d)
    }
    // state: one stats row per type
    val st = streaming.StateFold.readState(spark, statePath).get.filter($"kind" === "stats").collect()
    assert(st.map(_.getAs[String]("event_type")).sorted.toSeq == Seq("play", "skip"))
  }

  test("batch trailing twin == streaming fold, verdict for verdict") {
    import spark.implicits._
    val statePath = java.nio.file.Files.createTempDirectory("graft_anom_parity").toString
    val days = Seq("2024-04-01" -> (100, 11), "2024-04-02" -> (98, 10),
      "2024-04-03" -> (103, 9), "2024-04-04" -> (101, 10), "2024-04-05" -> (97, 11),
      "2024-04-06" -> (500, 10), "2024-04-07" -> (99, 9), "2024-04-08" -> (100, 10))
    def rows(b: Seq[(String, (Int, Int))]) =
      b.flatMap { case (d, (p, s)) => Seq(("play", d, p), ("skip", d, s)) }
    days.grouped(3).zipWithIndex.foreach { case (b, i) =>
      EventsPipeline.anomalyFold(mkBatch(rows(b)), statePath, i.toLong, "run-a")
    }
    val streamed = spark.read.parquet(s"$statePath/verdicts")
      .collect().map(r => (r.getAs[String]("event_type"), r.getAs[String]("day")) ->
        ((r.getAs[Long]("n_events"), r.getAs[Double]("z_score"), r.getAs[String]("verdict"))))
      .toMap
    val batch = core.BehaviorQueries.eventsAnomalyTrailingOn(mkBatch(rows(days)))
      .collect().map(r => (r.getAs[String]("event_type"), r.getAs[String]("day")) ->
        ((r.getAs[Long]("n_events"), r.getAs[Double]("z_score"), r.getAs[String]("verdict"))))
      .toMap
    assert(batch.keySet == streamed.keySet,
      s"day sets differ: ${batch.keySet.diff(streamed.keySet)} / ${streamed.keySet.diff(batch.keySet)}")
    batch.foreach { case (k, (n, z, v)) =>
      val (sn, sz, sv) = streamed(k)
      assert(n == sn && v == sv, s"$k: batch ($n,$v) vs streamed ($sn,$sv)")
      assert(math.abs(z - sz) < 1e-9, s"$k: z $z vs $sz")
    }
  }

  test("retry of the last committed batch is a no-op; stale-state restart fails loudly") {
    import spark.implicits._
    val statePath = java.nio.file.Files.createTempDirectory("graft_anom_retry").toString
    val b0 = mkBatch(Seq(("play", "2024-02-01", 10), ("play", "2024-02-02", 12)))
    EventsPipeline.anomalyFold(b0, statePath, 0L, "run-a")
    val state1 = streaming.StateFold.readState(spark, statePath).get.collect().map(_.toSeq).toSet
    // foreachBatch retry: same batch id, same run — must not double-count
    EventsPipeline.anomalyFold(b0, statePath, 0L, "run-a")
    assert(streaming.StateFold.readState(spark, statePath).get.collect().map(_.toSeq).toSet == state1)
    // a fresh run against existing state is ambiguous — loud failure
    intercept[IllegalStateException] {
      EventsPipeline.anomalyFold(b0, statePath, 0L, "run-b")
    }
  }
}
