package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Z-order (Morton-curve) data layout — the multi-dimensional clustering
  * pass behind Delta's OPTIMIZE ZORDER and Iceberg's sort orders. A table
  * laid out by ONE sort key prunes scans on that key only; interleaving
  * the bits of TWO normalized keys into one Morton value and clustering by
  * its prefix gives every file a tight bounding box in BOTH dimensions, so
  * min/max file stats prune range filters on either key (the difference
  * between reading ~√F and F of F files at 100 TB — ZorderSpec measures
  * exactly this against a linear layout).
  *
  * Everything is integer-exact and plan-side: the per-dim [min,max] stats
  * ride as a broadcast one-row cross join (the delta_load watermark
  * device, no driver collect), normalization is `(x−mn)·65535 div range`,
  * and the 16+16-bit interleave is a 32-term shift/mask sum that DuckDB
  * evaluates verbatim — so the per-cell stats table is oracle
  * hash-exact, custom layout arithmetic and all.
  *
  * Scale shape: one stats pass (4 numbers), one map-side projection to
  * (cell, z), and the layout write is a single exchange on cell +
  * in-partition sort — the same two-stage discipline as corpus_shard.
  * Reference analogy: the reference warehouse orders its fact table by
  * played_at alone (scripts/dm/dm_ddl.sql:1 btree indexes) — time-range
  * dashboards prune, per-user history scans don't; Z-order serves both.
  */
object ZorderLayout {

  /** Interleave the low 16 bits of `a` (odd positions) and `b` (even):
    * the classic Morton encoding, as a flat 32-term codegen sum.
    */
  private[graft] def morton16(a: Column, b: Column): Column =
    (0 until 16).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i + 1) +
        shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i)
    }.reduce(_ + _)

  /** Events projected to (user_id, sec, z, cell): both dims normalized to
    * the 16-bit grid against plan-side corpus min/max, Morton-interleaved,
    * cell = top 8 z bits (a 16×16 grid of bounding boxes).
    */
  private[graft] def zMapped(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select($"event_id", $"user_id", $"ts".cast("long").as("sec"))
    val stats = ev.agg(
      min($"user_id").as("umn"), max($"user_id").as("umx"),
      min($"sec").as("smn"), max($"sec").as("smx"))
    ev.crossJoin(broadcast(stats))
      .withColumn("u16", expr("((user_id - umn) * 65535) div greatest(umx - umn, 1)"))
      .withColumn("s16", expr("((sec - smn) * 65535) div greatest(smx - smn, 1)"))
      .withColumn("z", morton16($"u16", $"s16"))
      .withColumn("cell", shiftright($"z", 24))
      .select($"event_id", $"user_id", $"sec", $"z", $"cell")
  }

  /** §2 entry `layout_zorder`: the per-cell bounding-box stats table the
    * layout exists to produce — what a scan planner consults to prune.
    * Integer-exact, oracle hash-checked (DuckDB runs the same 32-term
    * interleave).
    */
  def layoutZorder(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    zMapped(spark, dir)
      .groupBy($"cell")
      .agg(count(lit(1)).as("n_rows"),
        min($"user_id").as("min_user"), max($"user_id").as("max_user"),
        min($"sec").as("min_sec"), max($"sec").as("max_sec"))
      .orderBy($"cell")
  }

  /** The write side: one file per z-cell, rows z-ordered within each —
    * exchange on cell + in-partition sort, then ZorderSpec reads the files
    * back and measures two-dimensional pruning against a time-linear twin.
    * The normalization stats land beside the data (`_stats`), so appended
    * batches keep the SAME grid — the appendToPcaIndex contract: continuous
    * ingestion never re-normalizes and never reshuffles landed cells.
    */
  /** Per-cell bounding boxes of a mapped frame — the prune metadata
    * [[prunedRangeScan]] consults (≤256 rows by construction: cell is the
    * top 8 z bits).
    */
  private def cellBoxes(mapped: DataFrame): DataFrame = {
    import mapped.sparkSession.implicits._
    mapped.groupBy($"cell")
      .agg(count(lit(1)).as("n_rows"),
        min($"user_id").as("min_user"), max($"user_id").as("max_user"),
        min($"sec").as("min_sec"), max($"sec").as("max_sec"))
  }

  def writeZorderLayout(spark: SparkSession, dir: String, outPath: String): Unit = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select($"event_id", $"user_id", $"ts".cast("long").as("sec"))
    val mapped = zMapped(spark, dir)
    mapped
      .repartition($"cell")
      .sortWithinPartitions($"cell", $"z", $"event_id")
      .write.mode("overwrite").partitionBy("cell").parquet(outPath)
    // stats AFTER the data: overwriting the parent dir above would wipe
    // previously-written _stats/_cellstats subdirs
    ev.agg(min($"user_id").as("umn"), max($"user_id").as("umx"),
        min($"sec").as("smn"), max($"sec").as("smx"))
      .coalesce(1).write.mode("overwrite").parquet(s"$outPath/_stats")
    // the per-cell bounding boxes a pruned scan consults — persisted with
    // the layout so serving never re-derives them from the data files
    cellBoxes(mapped).coalesce(1)
      .write.mode("overwrite").parquet(s"$outPath/_cellstats")
  }

  /** Append a batch of (event_id, user_id, sec) rows through the SAVED
    * normalization grid: values beyond the landed [min,max] clamp to the
    * edge cells (their stats boxes widen; a periodic re-layout reclaims
    * them — the standard OPTIMIZE cadence), in-range rows land in exactly
    * the cell a full rebuild would give them. Per-batch I/O is O(batch):
    * an exchange on cell + appended files in only the touched cell dirs.
    */
  def appendToZorderLayout(batch: DataFrame, outPath: String): Unit = {
    import batch.sparkSession.implicits._
    val spark = batch.sparkSession
    val stats = spark.read.parquet(s"$outPath/_stats")
    // materialized once: written below AND folded into the box update
    val mapped = batch.crossJoin(broadcast(stats))
      .withColumn("uc", least(greatest($"user_id", $"umn"), $"umx"))
      .withColumn("sc", least(greatest($"sec", $"smn"), $"smx"))
      .withColumn("u16", expr("((uc - umn) * 65535) div greatest(umx - umn, 1)"))
      .withColumn("s16", expr("((sc - smn) * 65535) div greatest(smx - smn, 1)"))
      .withColumn("z", morton16($"u16", $"s16"))
      .withColumn("cell", shiftright($"z", 24))
      .select($"event_id", $"user_id", $"sec", $"z", $"cell")
      .localCheckpoint()
    mapped
      .repartition($"cell")
      .sortWithinPartitions($"cell", $"z", $"event_id")
      .write.mode("append").partitionBy("cell").parquet(outPath)
    // keep the prune boxes SOUND under appends: clamped out-of-range rows
    // land in edge cells whose true bounds now exceed the grid edge — a
    // pruned scan consulting stale boxes would silently drop them. Merge
    // the batch's boxes into the ledger: O(cells + batch), no data re-scan.
    val merged = spark.read.parquet(s"$outPath/_cellstats")
      .unionByName(cellBoxes(mapped))
      .groupBy($"cell")
      .agg(sum($"n_rows").as("n_rows"),
        min($"min_user").as("min_user"), max($"max_user").as("max_user"),
        min($"min_sec").as("min_sec"), max($"max_sec").as("max_sec"))
      .localCheckpoint() // materialize before overwriting what it reads
    merged.coalesce(1).write.mode("overwrite").parquet(s"$outPath/_cellstats")
  }

  /** The READ side the layout exists for: a 2-D range query served through
    * the persisted per-cell bounding boxes. The boxes (≤256 rows — grid
    * metadata, the bounded-model contract) select the cells whose box
    * intersects the query rectangle; the scan reads ONLY those cell
    * directories (partition-pruned), and the exact predicate re-applies on
    * the survivors — so pruning is LOSSLESS by construction (box
    * intersection over-approximates membership; the residual filter makes
    * the result identical to a full scan) and the entry shares the plain
    * events-table oracle. At 100 TB this is the difference between reading
    * ~the query rectangle's cells and reading everything.
    */
  def prunedRangeScan(spark: SparkSession, path: String,
      uLo: Long, uHi: Long, sLo: Long, sHi: Long): DataFrame = {
    import spark.implicits._
    val cells = spark.read.parquet(s"$path/_cellstats")
      .filter($"max_user" >= uLo && $"min_user" <= uHi &&
        $"max_sec" >= sLo && $"min_sec" <= sHi)
      .select($"cell").collect().map(_.getLong(0))
    spark.read.parquet(path)
      .filter($"cell".isin(cells: _*)) // partition-pruned: only matching cell dirs
      .filter($"user_id".between(uLo, uHi) && $"sec".between(sLo, sHi))
      .select($"event_id", $"user_id", $"sec")
  }

  /** GDPR purge through the persisted layout — the etl_user_purge bucket
    * discipline on the cell axis, and the place z-ordering itself pays
    * off for deletion: one user's rows cluster into the few cells along
    * their user-coordinate row of the grid, so the probe finds ≤ that
    * many `cell=` dirs and only they rewrite (emptied dirs removed,
    * cold cells byte-identical, idempotent re-delete — the shared
    * [[LlmQueries.deleteKeysFromPartitionedTable]] routine). The
    * `_cellstats` prune boxes stay UNTOUCHED and stay sound: deletion
    * only shrinks a cell's true bounding box, and an over-wide box can
    * only under-prune, never lose a row — the same one-sided contract
    * appends rely on; the periodic re-layout reclaims the slack.
    */
  def deleteUsersFromZorderLayout(spark: SparkSession, path: String,
      userIds: Seq[Long]): Seq[Int] =
    LlmQueries.deleteKeysFromPartitionedTable(spark, path, "user_id", "cell",
      userIds, Seq("cell", "z", "event_id"))

  /** Equi-depth variant over any two long columns — the skew-robust
    * normalization [[layoutZorder]]'s equi-width grid lacks: under a
    * heavy-tailed dim (a Zipf user, a bursty time axis) equi-width packs
    * most rows into a few cells and the layout stops pruning. Here each
    * dim maps through its own 15 approx-quantile edges (one
    * percentile_approx pass, mergeable KLL-style sketch, plan-side
    * broadcast row — no collect) to a 4-bit RANK coordinate, so each
    * dim's marginal is ~n/16 per bin by construction; z interleaves the two
    * 4-bit ranks into a 16×16 grid of ~equal-count cells. ZorderSpec
    * pins the balance claim on a quadratically-skewed corpus where the
    * equi-width twin concentrates 4× worse.
    */
  private[graft] def equidepthCells(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    import df.sparkSession.implicits._
    val qs = array((1 to 15).map(i => lit(i / 16.0)): _*)
    val edges = df.agg(
      percentile_approx(col(aCol).cast("double"), qs, lit(10000)).as("ae"),
      percentile_approx(col(bCol).cast("double"), qs, lit(10000)).as("be"))
    def rank4(x: Column, e: Column): Column =
      size(filter(e, b => b < x.cast("double"))).cast("long")
    df.crossJoin(broadcast(edges))
      .withColumn("a4", rank4(col(aCol), $"ae"))
      .withColumn("b4", rank4(col(bCol), $"be"))
      .withColumn("cell", morton16($"a4", $"b4"))
      .drop("ae", "be")
  }

  /** §2 entry `layout_zorder_equidepth`: the per-cell stats table of the
    * rank-normalized layout over events (user_id × time). Rows-only — the
    * quantile sketch's edge placement is engine-specific; the spec pins
    * balance, marginal uniformity, and row conservation instead.
    */
  def layoutZorderEquidepth(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select($"event_id", $"user_id", $"ts".cast("long").as("sec"))
    equidepthCells(ev, "user_id", "sec")
      .groupBy($"cell")
      .agg(count(lit(1)).as("n_rows"),
        min($"user_id").as("min_user"), max($"user_id").as("max_user"),
        min($"sec").as("min_sec"), max($"sec").as("max_sec"))
      .orderBy($"cell")
  }

  private val savedLayouts =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), String]

  /** Test hook mirroring the other persisted families. */
  private[graft] def persistedZorderLayoutPath(spark: SparkSession, dir: String): Option[String] =
    savedLayouts.get((spark, dir))

  // the fixed 2-D query rectangle the §2 entry serves: a 5-user band over
  // ~one week of the corpus month (a slice at every SF)
  private[graft] val (qULo, qUHi, qSLo, qSHi) =
    (3L, 7L, 1704500000L, 1705100000L)

  /** §2 entry `layout_zorder_pruned`: write the layout once per
    * (session, dir) — the savedIndexes lifecycle — then serve the fixed
    * 2-D range query through [[prunedRangeScan]]. Lossless pruning →
    * shares the plain full-scan oracle over the events table
    * (the dedup_jaccard_prefix discipline: the fast path is held to the
    * slow path's exact answer).
    */
  def layoutZorderPruned(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val path = savedLayouts.synchronized {
      savedLayouts.getOrElseUpdate((spark, dir), {
        val p = s"${System.getProperty("java.io.tmpdir")}/graft_zorder_layout_" +
          graft.Tables.dirKey(dir) +
          "_" + ProcessHandle.current().pid() +
          "_" + Integer.toHexString(System.identityHashCode(spark))
        writeZorderLayout(spark, dir, p)
        p
      })
    }
    prunedRangeScan(spark, path, qULo, qUHi, qSLo, qSHi)
      .orderBy($"event_id")
  }

  val layoutZorderPrunedSql: String =
    s"""SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec
       |FROM events
       |WHERE user_id BETWEEN $qULo AND $qUHi
       |  AND CAST(floor(epoch(ts)) AS BIGINT) BETWEEN $qSLo AND $qSHi
       |ORDER BY event_id""".stripMargin

  /** OPTIMIZE cadence for the streamed layout: cells whose file count grew
    * past `maxFiles` (continuous [[appendToZorderLayout]] ingestion lands
    * one file per touched cell per batch) are rewritten as ONE z-sorted
    * file each — the [[graft.streaming.EventsPipeline.compactBuckets]]
    * discipline on the cell axis. Census is listing metadata only; I/O is
    * O(oversized cells); untouched cells keep their files byte-identical
    * (dynamic partition overwrite); idempotent — a second call finds
    * nothing oversized. Returns the compacted cell ids.
    */
  def compactCells(spark: SparkSession, path: String, maxFiles: Int = 4): Seq[Int] = {
    import org.apache.hadoop.fs.Path
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Seq.empty
    val oversized = fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("cell="))
      .filter(d => fs.listStatus(d.getPath)
        .count(_.getPath.getName.endsWith(".parquet")) > maxFiles)
      .map(_.getPath.getName.stripPrefix("cell=").toInt)
      .sorted
    if (oversized.nonEmpty) {
      spark.read.parquet(path)
        .filter(col("cell").isin(oversized: _*)) // partition-pruned scan
        .repartition(oversized.length, col("cell"))
        .sortWithinPartitions(col("cell"), col("z"), col("event_id"))
        // materialize before overwriting the same cells being read
        .localCheckpoint()
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("cell")
        .parquet(path)
    }
    oversized
  }

  /** The DuckDB twin of [[morton16]]/[[layoutZorder]], generated from the
    * same loop so the two engines cannot drift.
    */
  private def mortonSql(a: String, b: String): String =
    (0 until 16).map { i =>
      s"((($a >> $i) & 1) << ${2 * i + 1}) + ((($b >> $i) & 1) << ${2 * i})"
    }.mkString(" + ")

  val layoutZorderSql: String =
    s"""WITH ev AS (
       |  SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events
       |), st AS (
       |  SELECT min(user_id) AS umn, max(user_id) AS umx,
       |         min(sec) AS smn, max(sec) AS smx FROM ev
       |), m AS (
       |  SELECT event_id, user_id, sec,
       |    ((user_id - umn) * 65535) // greatest(umx - umn, 1) AS u16,
       |    ((sec - smn) * 65535) // greatest(smx - smn, 1) AS s16
       |  FROM ev CROSS JOIN st
       |), z AS (
       |  SELECT event_id, user_id, sec, (${mortonSql("u16", "s16")}) AS zv FROM m
       |)
       |SELECT zv >> 24 AS cell, COUNT(*) AS n_rows,
       |  min(user_id) AS min_user, max(user_id) AS max_user,
       |  min(sec) AS min_sec, max(sec) AS max_sec
       |FROM z GROUP BY 1 ORDER BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "layout_zorder"           -> (layoutZorder _),
    "layout_zorder_equidepth" -> (layoutZorderEquidepth _),
    "layout_zorder_pruned"    -> (layoutZorderPruned _)
  )

  val oracleSql: Map[String, String] = Map(
    "layout_zorder" -> layoutZorderSql,
    "layout_zorder_pruned" -> layoutZorderPrunedSql
  )
}
