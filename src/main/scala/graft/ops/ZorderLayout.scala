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
  def writeZorderLayout(spark: SparkSession, dir: String, outPath: String): Unit = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select($"event_id", $"user_id", $"ts".cast("long").as("sec"))
    zMapped(spark, dir)
      .repartition($"cell")
      .sortWithinPartitions($"cell", $"z", $"event_id")
      .write.mode("overwrite").partitionBy("cell").parquet(outPath)
    // stats AFTER the data: overwriting the parent dir above would wipe
    // a previously-written _stats subdir
    ev.agg(min($"user_id").as("umn"), max($"user_id").as("umx"),
        min($"sec").as("smn"), max($"sec").as("smx"))
      .coalesce(1).write.mode("overwrite").parquet(s"$outPath/_stats")
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
    val stats = batch.sparkSession.read.parquet(s"$outPath/_stats")
    batch.crossJoin(broadcast(stats))
      .withColumn("uc", least(greatest($"user_id", $"umn"), $"umx"))
      .withColumn("sc", least(greatest($"sec", $"smn"), $"smx"))
      .withColumn("u16", expr("((uc - umn) * 65535) div greatest(umx - umn, 1)"))
      .withColumn("s16", expr("((sc - smn) * 65535) div greatest(smx - smn, 1)"))
      .withColumn("z", morton16($"u16", $"s16"))
      .withColumn("cell", shiftright($"z", 24))
      .select($"event_id", $"user_id", $"sec", $"z", $"cell")
      .repartition($"cell")
      .sortWithinPartitions($"cell", $"z", $"event_id")
      .write.mode("append").partitionBy("cell").parquet(outPath)
  }

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
    "layout_zorder_equidepth" -> (layoutZorderEquidepth _)
  )

  val oracleSql: Map[String, String] = Map(
    "layout_zorder" -> layoutZorderSql
  )
}
