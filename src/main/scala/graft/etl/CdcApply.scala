package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** CDC (change-data-capture) APPLY — folding a log of insert / update /
  * delete operations into the current-state snapshot: the operator behind
  * Delta/Iceberg MERGE, Debezium consumers, and the reference's own
  * in-place upsert (ts_version_mapping.py UPSERT_SQL applies "latest
  * mapping wins" — this generalizes it with ordering and deletes; the
  * history-PRESERVING alternative is [[EtlQueries]]'s SCD2 build).
  *
  * The CDC log is derived deterministically from `events`: event_id is the
  * LSN (a change log's sequence number — totally ordered by definition),
  * key = lsn mod 200, op from lsn mod 10 (9 → D, 6-8 → U, else I), the
  * (event_type, value, ts) columns ride as the payload.
  *
  * Scale shapes:
  *   - "latest op per key" is `max(struct(lsn, …))` — ONE partial-agg
  *     groupBy (map-side combine, exchange carries one row per (key,
  *     partition)), not a per-key window sort; lsn uniqueness makes the
  *     struct max deterministic.
  *   - the entry computes state-at-watermark (70% of the log), then MERGES
  *     the remaining ops on top — the snapshot+batch composition a
  *     continuously-fed warehouse runs — and is held to the ORACLE that
  *     applies the whole log in one shot: merge-equals-rebuild is the
  *     hash-checked claim, the delta_load discipline on the CDC axis.
  *   - the watermark is a 1-row broadcast aggregate (no collect), and the
  *     merge is key-equi-join + union — no shuffle beyond the key.
  *
  * The streaming twin ([[graft.streaming.CdcStream.cdcMergeSink]]) applies
  * the same fold continuously onto a bucketed warehouse with tombstoned
  * deletes and LSN-guarded idempotence.
  */
object CdcApply {

  private val Keys = 200L

  /** The derived CDC log: (lsn, key, op, event_type, value, ts). */
  private[graft] def cdcLog(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir).select(
      $"event_id".as("lsn"),
      pmod($"event_id", lit(Keys)).as("key"),
      when(pmod($"event_id", lit(10L)) === 9, "D")
        .when(pmod($"event_id", lit(10L)) >= 6, "U")
        .otherwise("I").as("op"),
      $"event_type", $"value", $"ts")
  }

  /** Latest op per key via partial-agg struct max (lsn leads, so the max
    * IS the latest; remaining fields never decide — lsn is unique).
    */
  private[graft] def latestPerKey(cdc: DataFrame): DataFrame = {
    import cdc.sparkSession.implicits._
    cdc.groupBy($"key")
      .agg(max(struct($"lsn", $"op", $"event_type", $"value", $"ts")).as("_s"))
      .select($"key", $"_s.lsn".as("last_lsn"), $"_s.op".as("last_op"),
        $"_s.event_type".as("event_type"), $"_s.value".as("value"),
        $"_s.ts".as("updated_at"))
  }

  /** One-shot apply: fold the whole log, drop deleted keys. */
  private[graft] def applyCdc(cdc: DataFrame): DataFrame = {
    import cdc.sparkSession.implicits._
    latestPerKey(cdc).filter($"last_op" =!= "D")
  }

  /** The gate entry: state at the 70% LSN watermark, merged with the
    * remaining 30% as an incoming batch — latest-wins upserts, deletes
    * drop. Hash-held to the one-shot oracle.
    */
  def etlCdcApply(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cdc = cdcLog(spark, dir)
    val maxLsn = cdc.agg(max($"lsn").as("max_lsn"))
    val tagged = cdc.crossJoin(broadcast(maxLsn))
    val snapshot = applyCdc(
      tagged.filter($"lsn" * 10 <= $"max_lsn" * 7).drop("max_lsn"))
    val batchLatest = latestPerKey(
      tagged.filter($"lsn" * 10 > $"max_lsn" * 7).drop("max_lsn"))
    // batch keys override the snapshot wholesale (all batch ops are later
    // than every snapshot op per key — the log is LSN-split), deletes
    // simply don't re-enter
    snapshot.join(batchLatest.select($"key"), Seq("key"), "left_anti")
      .unionByName(batchLatest.filter($"last_op" =!= "D"))
      .orderBy($"key")
  }

  val etlCdcApplySql: String =
    """WITH cdc AS (
      |  SELECT event_id AS lsn, event_id % 200 AS key,
      |    CASE WHEN event_id % 10 = 9 THEN 'D'
      |         WHEN event_id % 10 >= 6 THEN 'U'
      |         ELSE 'I' END AS op,
      |    event_type, value, ts
      |  FROM events
      |), latest AS (
      |  SELECT *, row_number() OVER (PARTITION BY key ORDER BY lsn DESC) AS rn
      |  FROM cdc
      |)
      |SELECT key, lsn AS last_lsn, op AS last_op, event_type, value, ts AS updated_at
      |FROM latest WHERE rn = 1 AND op <> 'D'
      |ORDER BY key""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "etl_cdc_apply" -> (etlCdcApply _)
  )

  val oracleSql: Map[String, String] = Map(
    "etl_cdc_apply" -> etlCdcApplySql
  )
}
