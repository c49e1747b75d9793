package graft

import org.apache.spark.sql.functions._

/** The Z-order layout's whole claim, measured: file-level min/max stats
  * must prune range filters on BOTH dimensions, where a time-linear layout
  * prunes only time.
  */
class ZorderSpec extends SparkSuite {

  test("morton interleave: known values, monotone cell prefixes") {
    import spark.implicits._
    val got = Seq((0L, 0L), (65535L, 0L), (0L, 65535L), (65535L, 65535L), (1L, 1L), (2L, 1L))
      .toDF("a", "b")
      .select(ops.ZorderLayout.morton16($"a", $"b").as("z"))
      .collect().map(_.getLong(0))
    // a fills odd bit positions, b even: (1,1) -> 0b11 = 3; (2,1) -> a-bit1
    // at position 3, b-bit0 at position 0 -> 0b1001 = 9
    assert(got(0) == 0L)
    assert(got(1) == 0xAAAAAAAAL) // all odd bits
    assert(got(2) == 0x55555555L) // all even bits
    assert(got(3) == 0xFFFFFFFFL)
    assert(got(4) == 3L)
    assert(got(5) == 9L)
  }

  test("per-cell stats: every cell box tight in BOTH dims; rows conserved") {
    import spark.implicits._
    val cells = ops.ZorderLayout.layoutZorder(spark, sf).collect()
    assert(cells.length > 1)
    val total = Tables.events(spark, sf).count()
    assert(cells.map(_.getAs[Long]("n_rows")).sum == total)
    val uSpan = cells.map(r => r.getAs[Long]("max_user") - r.getAs[Long]("min_user"))
    val sSpan = cells.map(r => r.getAs[Long]("max_sec") - r.getAs[Long]("min_sec"))
    val uGlobal = uSpan.max.max(cells.map(_.getAs[Long]("max_user")).max -
      cells.map(_.getAs[Long]("min_user")).min)
    val sGlobal = cells.map(_.getAs[Long]("max_sec")).max -
      cells.map(_.getAs[Long]("min_sec")).min
    // a 16×16 morton grid cell covers ≤ ~1/4 of each dim's range (4 bits
    // per dim in the cell prefix → 1/16 ideal; slack for boundary effects)
    assert(uSpan.forall(_ <= uGlobal / 2), s"user spans: ${uSpan.sorted.reverse.take(3).mkString(",")} vs $uGlobal")
    assert(sSpan.forall(_ <= sGlobal / 2), s"sec spans: ${sSpan.sorted.reverse.take(3).mkString(",")} vs $sGlobal")
  }

  test("equi-depth cells stay balanced under quadratic skew where equi-width concentrates") {
    import spark.implicits._
    val n = 20000
    // two decorrelated heavy-tailed dims: density ~1/√v — equi-width's
    // first bins swallow most rows
    val df = spark.range(1, n + 1)
      .select($"id".as("event_id"),
        expr(s"id * id div $n").as("a"),
        expr(s"((id * 7919) % $n) * ((id * 7919) % $n) div $n").as("b"))
    val cells = ops.ZorderLayout.equidepthCells(df, "a", "b")
      .groupBy($"cell").agg(count(lit(1)).as("n_rows")).collect()
    assert(cells.map(_.getAs[Long]("n_rows")).sum == n)
    val counts = cells.map(_.getAs[Long]("n_rows"))
    val mean = n.toDouble / 256
    // balance: no equi-depth cell far above its fair share
    assert(counts.max <= 4 * mean, s"max cell ${counts.max} vs fair $mean")
    // the equi-width twin on the same data: 16×16 value-grid occupancy
    val st = df.agg(min($"a"), max($"a"), min($"b"), max($"b")).head()
    val (amn, amx, bmn, bmx) = (st.getLong(0), st.getLong(1), st.getLong(2), st.getLong(3))
    val ew = df
      .withColumn("ca", expr(s"((a - ${amn}L) * 15) div greatest(${amx}L - ${amn}L, 1)"))
      .withColumn("cb", expr(s"((b - ${bmn}L) * 15) div greatest(${bmx}L - ${bmn}L, 1)"))
      .groupBy($"ca", $"cb").agg(count(lit(1)).as("n_rows")).collect()
      .map(_.getAs[Long]("n_rows"))
    // equi-width concentrates ≥ 2× worse than equi-depth on this corpus
    assert(ew.max >= 2 * counts.max,
      s"equi-width max ${ew.max} vs equi-depth max ${counts.max}")
    // marginal uniformity of the rank coordinates (each dim ~n/16 per bin)
    val margA = ops.ZorderLayout.equidepthCells(df, "a", "b")
      .groupBy($"a4").agg(count(lit(1)).as("c")).collect().map(_.getAs[Long]("c"))
    assert(margA.max <= 2 * n / 16, s"marginal bin ${margA.max} vs fair ${n / 16}")
  }

  test("append lands batches in the saved grid: in-range exact, out-of-range clamped, O(batch) files") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft_zorder_app").toString
    ops.ZorderLayout.writeZorderLayout(spark, sf, path)
    val before = spark.read.parquet(path)
    val beforeCount = before.count()
    val st = spark.read.parquet(s"$path/_stats").head()
    val (umn, umx, smn, smx) = (st.getAs[Long]("umn"), st.getAs[Long]("umx"),
      st.getAs[Long]("smn"), st.getAs[Long]("smx"))

    // batch: real value pairs with fresh ids, plus one row beyond each edge
    val inRange = Tables.events(spark, sf)
      .select(($"event_id" + 10000000L).as("event_id"), $"user_id", $"ts".cast("long").as("sec"))
      .limit(50)
    val outliers = Seq(
      (20000001L, umx + 5000L, smn + (smx - smn) / 2),
      (20000002L, umn, smx + 999999L)).toDF("event_id", "user_id", "sec")
    ops.ZorderLayout.appendToZorderLayout(inRange.unionAll(outliers), path)

    val after = spark.read.parquet(path)
    assert(after.count() == beforeCount + 52)

    // independent morton re-implementation: the appended rows' landed cell
    // must equal the saved-grid assignment (with clamping)
    def morton(a: Long, b: Long): Long =
      (0 until 16).map(i => (((a >> i) & 1L) << (2 * i + 1)) | (((b >> i) & 1L) << (2 * i)))
        .reduce(_ | _)
    def expectedCell(u: Long, s: Long): Long = {
      val uc = math.min(math.max(u, umn), umx); val sc = math.min(math.max(s, smn), smx)
      val u16 = (uc - umn) * 65535L / math.max(umx - umn, 1L)
      val s16 = (sc - smn) * 65535L / math.max(smx - smn, 1L)
      morton(u16, s16) >> 24
    }
    val appended = after.filter($"event_id" >= 10000000L)
      // partition-dir column read-back infers int — normalize to long
      .select($"event_id", $"user_id", $"sec", $"cell".cast("long").as("cell")).collect()
    assert(appended.length == 52)
    appended.foreach { r =>
      assert(r.getAs[Long]("cell") ==
        expectedCell(r.getAs[Long]("user_id"), r.getAs[Long]("sec")),
        s"row ${r.getAs[Long]("event_id")}")
    }
  }

  test("streaming zorderSink fold: appends through the saved grid, replay adds nothing") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft_zorder_sink").toString
    ops.ZorderLayout.writeZorderLayout(spark, sf, path)
    val base = spark.read.parquet(path).count()

    val batch = Tables.events(spark, sf)
      .select(($"event_id" + 30000000L).as("event_id"), $"user_id", $"ts")
      .limit(40)
    graft.streaming.EventsPipeline.zorderFold(batch, path)
    assert(spark.read.parquet(path).count() == base + 40)

    // re-delivered batch (the foreachBatch retry): anti-join screens it out
    graft.streaming.EventsPipeline.zorderFold(batch, path)
    assert(spark.read.parquet(path).count() == base + 40)

    // a mixed batch: half replayed, half genuinely new — only the new land
    val mixed = Tables.events(spark, sf)
      .select(($"event_id" + 30000000L).as("event_id"), $"user_id", $"ts")
      .limit(60)
    graft.streaming.EventsPipeline.zorderFold(mixed, path)
    assert(spark.read.parquet(path).count() == base + 60)

    // appended rows carry the same cell the batch append path assigns
    val landed = spark.read.parquet(path).filter($"event_id" >= 30000000L)
    assert(landed.select($"cell").distinct().count() >= 1)
  }

  test("compactCells: oversized cells fold to one file, cold cells byte-untouched, idempotent") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft_zorder_cmp").toString
    ops.ZorderLayout.writeZorderLayout(spark, sf, path)
    // 6 appended batches hammer the SAME rows' cells → their dirs exceed
    // the ceiling; cells those rows never touch stay cold
    val batch = Tables.events(spark, sf)
      .select(($"event_id" + 40000000L).as("event_id"), $"user_id", $"ts".cast("long").as("sec"))
      .limit(30)
    (1 to 6).foreach { i =>
      ops.ZorderLayout.appendToZorderLayout(
        batch.select(($"event_id" + i * 1000000L).as("event_id"), $"user_id", $"sec"), path)
    }
    val before = spark.read.parquet(path).count()
    def files(cell: Int) = new java.io.File(s"$path/cell=$cell").listFiles()
      .filter(_.getName.endsWith(".parquet"))
    val hot = spark.read.parquet(path).filter($"event_id" >= 40000000L)
      .select($"cell".cast("int")).distinct().collect().map(_.getInt(0)).toSet
    assert(hot.exists(c => files(c).length > 4), "fixture failed to exceed the ceiling")
    val coldCell = spark.read.parquet(path).select($"cell".cast("int")).distinct()
      .collect().map(_.getInt(0)).find(c => !hot.contains(c)).get
    val coldMtimes = files(coldCell).map(f => f.getPath -> f.lastModified()).toMap

    val compacted = ops.ZorderLayout.compactCells(spark, path, maxFiles = 4)
    assert(compacted.nonEmpty)
    compacted.foreach(c => assert(files(c).length == 1, s"cell $c still ${files(c).length} files"))
    assert(spark.read.parquet(path).count() == before, "compaction lost rows")
    assert(files(coldCell).map(f => f.getPath -> f.lastModified()).toMap == coldMtimes,
      "cold cell rewritten")
    assert(ops.ZorderLayout.compactCells(spark, path, maxFiles = 4).isEmpty, "not idempotent")
  }

  test("prunedRangeScan: lossless vs full scan, touches fewer files, boxes stay sound under appends") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft_zorder_prune").toString
    ops.ZorderLayout.writeZorderLayout(spark, sf, path)
    val (uLo, uHi, sLo, sHi) =
      (ops.ZorderLayout.qULo, ops.ZorderLayout.qUHi, ops.ZorderLayout.qSLo, ops.ZorderLayout.qSHi)

    def sortRows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(identity)
    val pruned = ops.ZorderLayout.prunedRangeScan(spark, path, uLo, uHi, sLo, sHi)
    val full = spark.read.parquet(path)
      .filter($"user_id".between(uLo, uHi) && $"sec".between(sLo, sHi))
      .select($"event_id", $"user_id", $"sec")
    assert(sortRows(pruned).nonEmpty, "fixture rectangle matched nothing")
    assert(sortRows(pruned).sameElements(sortRows(full)), "pruning lost or fabricated rows")
    // the scan really prunes: strictly fewer data files than the layout
    // holds (inputFiles ignores partition pruning — read the executed
    // scan's numFiles metric, which reflects the pruned partition listing)
    def touchedFiles(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      tools.PlanWalk.flatten(df.queryExecution.executedPlan)
        .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.metrics("numFiles").value }.sum
    }
    val allFiles = spark.read.parquet(path).inputFiles.length.toLong
    val prunedFiles = touchedFiles(ops.ZorderLayout.prunedRangeScan(spark, path, uLo, uHi, sLo, sHi))
    assert(prunedFiles < allFiles, s"pruned scan touched $prunedFiles of $allFiles files")

    // soundness under appends: a row whose TRUE user_id exceeds the grid
    // edge lands clamped in an edge cell — the merged boxes must widen so
    // a rectangle over the out-of-range region still finds it
    val st = spark.read.parquet(s"$path/_stats").head()
    val (umx, smn, smx) = (st.getAs[Long]("umx"), st.getAs[Long]("smn"), st.getAs[Long]("smx"))
    val outlier = Seq((50000001L, umx + 100L, smn + (smx - smn) / 2))
      .toDF("event_id", "user_id", "sec")
    ops.ZorderLayout.appendToZorderLayout(outlier, path)
    val edge = ops.ZorderLayout.prunedRangeScan(spark, path, umx + 1, umx + 200, smn, smx)
    assert(sortRows(edge).toSeq == Seq((50000001L, umx + 100L, smn + (smx - smn) / 2)),
      "stale boxes dropped the clamped outlier")
  }

  test("written layout prunes range scans on BOTH dims; linear layout only on one") {
    import spark.implicits._
    val zPath = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    ops.ZorderLayout.writeZorderLayout(spark, sf, zPath)

    // per-file (cell) stats of the layout as a scan planner would read them
    val zStats = spark.read.parquet(zPath)
      .groupBy($"cell")
      .agg(min($"user_id").as("mnu"), max($"user_id").as("mxu"),
        min($"sec").as("mns"), max($"sec").as("mxs"))
      .collect()
    val nFiles = zStats.length.toDouble

    // the linear twin: same rows, same file count, laid out by time alone
    val ev = ops.ZorderLayout.zMapped(spark, sf)
    val (smn, smx) = {
      val r = ev.agg(min($"sec"), max($"sec")).head(); (r.getLong(0), r.getLong(1))
    }
    val (umn, umx) = {
      val r = ev.agg(min($"user_id"), max($"user_id")).head(); (r.getLong(0), r.getLong(1))
    }
    val linStats = ev
      .withColumn("bucket", expr(s"((sec - ${smn}L) * ${zStats.length}) div greatest(${smx}L - ${smn}L + 1, 1)"))
      .groupBy($"bucket")
      .agg(min($"user_id").as("mnu"), max($"user_id").as("mxu"),
        min($"sec").as("mns"), max($"sec").as("mxs"))
      .collect()

    def touched(stats: Array[org.apache.spark.sql.Row],
        lo: Long, hi: Long, mnCol: String, mxCol: String): Double =
      stats.count(r => r.getAs[Long](mxCol) >= lo && r.getAs[Long](mnCol) <= hi).toDouble / stats.length

    // a 1/8-wide slice in each dimension, mid-range
    val uLo = umn + (umx - umn) * 4 / 8; val uHi = umn + (umx - umn) * 5 / 8
    val sLo = smn + (smx - smn) * 4 / 8; val sHi = smn + (smx - smn) * 5 / 8

    val zUser = touched(zStats, uLo, uHi, "mnu", "mxu")
    val zTime = touched(zStats, sLo, sHi, "mns", "mxs")
    val linUser = touched(linStats, uLo, uHi, "mnu", "mxu")
    val linTime = touched(linStats, sLo, sHi, "mns", "mxs")

    // z-order: BOTH dims prune well (ideal 2/16 of cells + boundaries)
    assert(zUser <= 0.40, s"z-layout user-slice touches ${zUser * nFiles}/$nFiles files")
    assert(zTime <= 0.40, s"z-layout time-slice touches ${zTime * nFiles}/$nFiles files")
    // linear: time prunes hard, the user dim reads essentially everything
    assert(linTime <= 0.30, s"linear time pruning broke: $linTime")
    // (not ≥0.9: at test scale a few small time-buckets get narrow user
    // ranges by chance — "reads most files" is the property)
    assert(linUser >= 0.6, s"linear layout unexpectedly prunes user dim: $linUser")
    // and the z layout beats linear on the dimension linear ignores by a lot
    assert(zUser * 2 < linUser, s"z $zUser vs linear $linUser")
  }
}
