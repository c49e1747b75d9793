package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Snapshot RECONCILIATION — the audit step a warehouse migration or a
  * dual-write cutover runs: FULL OUTER join two snapshots of the same
  * keyspace and classify every key as added / removed / changed
  * (matching keys with identical payloads are dropped — the output is
  * the exception report, not a copy of the table).
  *
  * The reference's pipeline has the one-directional form of this
  * (new-item detection = anti join, extractor.py's set difference);
  * reconciliation is its bidirectional completion, and the one shape in
  * the join family the §2 inventory didn't yet exercise end-to-end:
  * FULL OUTER with null-safe payload comparison (`<=>` / IS DISTINCT
  * FROM — a plain `=!=` would silently drop rows where either side's
  * payload is NULL).
  *
  * Scale: one shuffle on the join key for both snapshots (sort-merge at
  * warehouse scale, the natural plan); the classification is a map-side
  * CASE over the joined row. At 100 TB both sides bucketize on the key
  * and the join is co-partitioned.
  */
object Reconcile {

  /** The two synthetic snapshots: A drops every 7th key (rows "added"
    * since A), B drops every 5th (rows "removed" since A) and rewrites
    * the status of every 3rd ("changed"). Deterministic slices of the
    * orders table — both engines derive identical snapshots.
    */
  private[graft] def snapshots(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    import spark.implicits._
    val o = Tables.orders(spark, dir)
      .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
    val a = o.filter($"o_orderkey" % 7 =!= 0)
      .select($"o_orderkey".as("a_key"), $"o_orderstatus".as("a_status"),
        $"o_totalprice".as("a_price"))
    val b = o.filter($"o_orderkey" % 5 =!= 0)
      .select($"o_orderkey".as("b_key"),
        when($"o_orderkey" % 3 === 0, lit("X")).otherwise($"o_orderstatus").as("b_status"),
        $"o_totalprice".as("b_price"))
    (a, b)
  }

  def reconcileSnapshots(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (a, b) = snapshots(spark, dir)
    a.join(b, $"a_key" === $"b_key", "full_outer")
      .withColumn("change_type",
        when($"a_key".isNull, lit("added"))
          .when($"b_key".isNull, lit("removed"))
          .when(!($"a_status" <=> $"b_status") || !($"a_price" <=> $"b_price"), lit("changed"))
          .otherwise(lit("same")))
      .filter($"change_type" =!= "same")
      .select(coalesce($"a_key", $"b_key").as("o_orderkey"), $"change_type",
        $"a_status".as("old_status"), $"b_status".as("new_status"))
      .orderBy($"o_orderkey")
  }

  val reconcileSql: String =
    """WITH a AS (
      |  SELECT o_orderkey AS a_key, o_orderstatus AS a_status, o_totalprice AS a_price
      |  FROM orders WHERE o_orderkey % 7 <> 0
      |), b AS (
      |  SELECT o_orderkey AS b_key,
      |    CASE WHEN o_orderkey % 3 = 0 THEN 'X' ELSE o_orderstatus END AS b_status,
      |    o_totalprice AS b_price
      |  FROM orders WHERE o_orderkey % 5 <> 0
      |), j AS (
      |  SELECT *,
      |    CASE WHEN a_key IS NULL THEN 'added'
      |         WHEN b_key IS NULL THEN 'removed'
      |         WHEN (a_status IS DISTINCT FROM b_status)
      |           OR (a_price IS DISTINCT FROM b_price) THEN 'changed'
      |         ELSE 'same' END AS change_type
      |  FROM a FULL OUTER JOIN b ON a_key = b_key
      |)
      |SELECT COALESCE(a_key, b_key) AS o_orderkey, change_type,
      |  a_status AS old_status, b_status AS new_status
      |FROM j WHERE change_type <> 'same'
      |ORDER BY o_orderkey""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "etl_reconcile_snapshots" -> (reconcileSnapshots _)
  )

  val oracleSql: Map[String, String] = Map(
    "etl_reconcile_snapshots" -> reconcileSql
  )
}
