package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Right-to-be-forgotten PURGE over a bucketed warehouse — the
  * batch-side deletion discipline GDPR/CCPA forces on every event
  * store (the streaming side's delete story is CdcStream's tombstone
  * machinery; this is the targeted hard-delete with I/O proportional
  * to the keys' buckets, not the warehouse):
  *
  *  1. the warehouse is laid out `_bucket = hash(user) % B` (the
  *     mergeWarehouseSink layout);
  *  2. the purge key set maps to its bucket ids — the ONLY buckets
  *     read or rewritten (dynamic partition overwrite swaps whole
  *     bucket dirs; untouched buckets stay byte-identical, spec-pinned
  *     by mtime);
  *  3. affected buckets rewrite WITHOUT the purged keys (an anti-join
  *     inside the bucket slice);
  *  4. the operator emits an AUDIT row — the compliance artifact —
  *     whose counts the driver gate hash-checks against DuckDB
  *     computing the same accounting straight off the source table.
  *
  * Idempotent: a second purge of the same keys finds zero rows.
  */
object UserPurge {

  private val Buckets = 16

  private def bucketed(ev: DataFrame): DataFrame =
    ev.withColumn("_bucket",
      pmod(xxhash64(col("user_id").cast("string")), lit(Buckets)).cast("int"))

  /** Build the bucketed warehouse once per (session, dir), purge the
    * deterministic key set (user_id % 97 == 0), return the audit row.
    */
  def userPurge(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val wh = warehousePath(spark, dir)
    val purgeKeys = Tables.events(spark, dir)
      .select($"user_id").distinct().filter($"user_id" % 97 === 0)
    val audit = purgeFrom(spark, wh, purgeKeys)
    val after = spark.read.parquet(wh)
    audit.crossJoin(broadcast(after.agg(count(lit(1)).as("rows_after"))))
  }

  /** The purge core over any bucketed warehouse path: reads ONLY the
    * purge keys' buckets, rewrites them without the purged rows, and
    * returns (n_purge_users, n_purged_rows, rows_before).
    */
  private[graft] def purgeFrom(spark: SparkSession, wh: String, purgeKeys: DataFrame): DataFrame = {
    import spark.implicits._
    val keyed = bucketed(purgeKeys.select($"user_id"))
    // bounded pull: ≤ B bucket ids (the affected-bucket contract the
    // merge sinks use)
    val hot = keyed.select($"_bucket").distinct().as[Int].collect().toSeq.sorted
    val whDf = spark.read.parquet(wh)
    val slice = whDf.filter($"_bucket".isin(hot: _*))
    val purged = slice.join(purgeKeys.select($"user_id"), Seq("user_id"), "left_semi")
    val stats = purged.agg(
      countDistinct($"user_id").as("n_purge_users"),
      count(lit(1)).as("n_purged_rows"))
    val statsRow = stats.crossJoin(broadcast(whDf.agg(count(lit(1)).as("rows_before"))))
      .head() // 1 row — materialize BEFORE the overwrite below invalidates the scan
    val kept = slice.join(purgeKeys.select($"user_id"), Seq("user_id"), "left_anti")
    // localCheckpoint detaches lineage from the files the dynamic
    // overwrite below replaces (the scd2Fold read-then-rewrite contract)
    kept.repartition($"_bucket").localCheckpoint()
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("_bucket")
      .parquet(wh)
    import spark.implicits._
    Seq((statsRow.getAs[Long]("n_purge_users"), statsRow.getAs[Long]("n_purged_rows"),
      statsRow.getAs[Long]("rows_before")))
      .toDF("n_purge_users", "n_purged_rows", "rows_before")
  }

  /** The warehouse is REBUILT on every call (not cached): the entry
    * purges it, so serving a second call from a cached already-purged
    * warehouse would report zero purged rows — the entry must be
    * call-deterministic for the gate (and the bench's best-of-2). Path
    * keyed by dir hash + pid + session identity (the persisted-index
    * path discipline against cross-process races).
    */
  private[graft] def warehousePath(spark: SparkSession, dir: String): String = {
    val p = s"${System.getProperty("java.io.tmpdir")}/graft_purge_wh_" +
      graft.Tables.dirKey(dir) +
      "_" + ProcessHandle.current().pid() +
      "_" + Integer.toHexString(System.identityHashCode(spark))
    bucketed(Tables.events(spark, dir))
      .write.mode("overwrite").partitionBy("_bucket").parquet(p)
    p
  }

  val userPurgeSql: String =
    """WITH purge AS (
      |  SELECT DISTINCT user_id FROM events WHERE user_id % 97 = 0
      |)
      |SELECT
      |  CAST((SELECT COUNT(*) FROM purge) AS BIGINT) AS n_purge_users,
      |  CAST((SELECT COUNT(*) FROM events WHERE user_id IN (SELECT user_id FROM purge)) AS BIGINT) AS n_purged_rows,
      |  CAST((SELECT COUNT(*) FROM events) AS BIGINT) AS rows_before,
      |  CAST((SELECT COUNT(*) FROM events WHERE user_id NOT IN (SELECT user_id FROM purge)) AS BIGINT) AS rows_after""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "etl_user_purge" -> (userPurge _)
  )

  val oracleSql: Map[String, String] = Map(
    "etl_user_purge" -> userPurgeSql
  )
}
