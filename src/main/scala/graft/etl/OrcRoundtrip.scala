package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** §2 entry `etl_orc_roundtrip` — the ORC source/sink beside the
  * parquet/CSV/JSON ingest family: the staging extract lands as
  * Hive-layout PARTITIONED ORC (`l_returnflag=` dirs, the layout a
  * downstream Hive/Trino/Presto reader expects), is read back through
  * Spark's native vectorized ORC reader, and the entry emits a
  * per-partition rollup of the READ-BACK data. The DuckDB oracle runs
  * the same rollup on the SOURCE parquet — so the driver gate proves
  * the round trip preserves every value exactly (longs, strings, and
  * the DECIMAL(12,2) quantity — the type ORC's decimal writer must not
  * perturb), not merely that files appeared.
  *
  * Scale shape: the write is one partitionBy exchange (3 partitions —
  * flag cardinality, not data volume); the read-back rollup is one
  * map-side-combined groupBy whose scan PRUNES by partition dir on a
  * flag filter (spec-pinned via the scan's partitionFilters and the
  * pruned file listing). Write happens ONCE per
  * (session, dir) — the persisted-artifact discipline; the entry
  * re-reads the landed files every call, which IS the operator.
  * Reference anchor: the reference lands staging extracts as database
  * tables (etl/transformer.py staging loads, staging_ddl.sql); ORC is
  * the columnar-warehouse analog of that landing zone.
  */
object OrcRoundtrip {

  private val built =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), String]

  private[graft] def orcPath(spark: SparkSession, dir: String): String =
    built.synchronized {
      built.getOrElseUpdate((spark, dir), {
        import spark.implicits._
        // SHA-256 prefix, not String.hashCode: two distinct dirs in one
        // process colliding on 32 bits would silently overwrite each
        // other's artifact while the cache still points at it.
        val dirDigest = java.security.MessageDigest.getInstance("SHA-256")
          .digest(dir.getBytes("UTF-8")).take(12).map("%02x".format(_)).mkString
        val p = s"${System.getProperty("java.io.tmpdir")}/graft_orc_" + dirDigest +
          "_" + ProcessHandle.current().pid() +
          "_" + Integer.toHexString(System.identityHashCode(spark))
        Tables.lineitem(spark, dir)
          .select($"l_orderkey", $"l_partkey",
            $"l_quantity".cast("decimal(12,2)").as("qty"),
            $"l_returnflag")
          .write.mode("overwrite")
          .partitionBy("l_returnflag")
          .orc(p)
        p
      })
    }

  def etlOrcRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.read.orc(orcPath(spark, dir))
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n_rows"),
        countDistinct($"l_partkey").as("n_parts"),
        sum($"qty").as("qty_sum"))
      .select($"l_returnflag", $"n_rows", $"n_parts",
        $"qty_sum".cast("double").as("sum_qty"))
      .orderBy($"l_returnflag")
  }

  /** The same rollup on the SOURCE parquet — equality proves the ORC
    * round trip value-exact.
    */
  val etlOrcRoundtripSql: String =
    """SELECT l_returnflag,
      |  CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem
      |GROUP BY 1
      |ORDER BY 1""".stripMargin

  /** §2 entries `etl_csv_roundtrip` / `etl_json_roundtrip` — the TEXT
    * landing zones beside the columnar one: the same partitioned
    * staging extract lands as Hive-layout CSV (header, explicit
    * read-back schema — inference would silently widen the decimal)
    * and as JSON-lines, each read back and rolled up against the SAME
    * source-parquet oracle — so the driver gate proves BOTH text
    * serializers preserve longs, strings and the DECIMAL(12,2) exactly
    * (the decimal is the type a naive float round-trip perturbs).
    * Same once-per-(session, dir) write discipline; the read-back scan
    * still prunes on the partition dir.
    */
  private val builtText =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String, String), String]

  private def textPath(spark: SparkSession, dir: String, fmt: String): String =
    builtText.synchronized {
      builtText.getOrElseUpdate((spark, dir, fmt), {
        import spark.implicits._
        val p = s"${System.getProperty("java.io.tmpdir")}/graft_${fmt}_" +
          graft.Tables.dirKey(dir) +
          "_" + ProcessHandle.current().pid() +
          "_" + Integer.toHexString(System.identityHashCode(spark))
        val df = Tables.lineitem(spark, dir)
          .select($"l_orderkey", $"l_partkey",
            $"l_quantity".cast("decimal(12,2)").as("qty"),
            $"l_returnflag")
        val w = df.write.mode("overwrite").partitionBy("l_returnflag")
        if (fmt == "csv") w.option("header", "true").csv(p) else w.json(p)
        p
      })
    }

  // The partition column is in the EXPLICIT schema (Spark resolves it
  // from the directory layout but keeps the user-schema position): the
  // read-back contract must not depend on the implicit append-at-end
  // behavior — one basePath/layout change away from a silent drop.
  private val landedSchema =
    "l_orderkey BIGINT, l_partkey BIGINT, qty DECIMAL(12,2), l_returnflag STRING"

  private def textRoundtrip(spark: SparkSession, dir: String, fmt: String): DataFrame = {
    import spark.implicits._
    val p = textPath(spark, dir, fmt)
    val back =
      if (fmt == "csv")
        spark.read.schema(landedSchema).option("header", "true").csv(p)
      else spark.read.schema(landedSchema).json(p)
    back
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n_rows"),
        countDistinct($"l_partkey").as("n_parts"),
        sum($"qty").as("qty_sum"))
      .select($"l_returnflag", $"n_rows", $"n_parts",
        $"qty_sum".cast("double").as("sum_qty"))
      .orderBy($"l_returnflag")
  }

  def etlCsvRoundtrip(spark: SparkSession, dir: String): DataFrame =
    textRoundtrip(spark, dir, "csv")

  def etlJsonRoundtrip(spark: SparkSession, dir: String): DataFrame =
    textRoundtrip(spark, dir, "json")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "etl_orc_roundtrip"  -> (etlOrcRoundtrip _),
    "etl_csv_roundtrip"  -> (etlCsvRoundtrip _),
    "etl_json_roundtrip" -> (etlJsonRoundtrip _)
  )

  val oracleSql: Map[String, String] = Map(
    "etl_orc_roundtrip"  -> etlOrcRoundtripSql,
    "etl_csv_roundtrip"  -> etlOrcRoundtripSql,
    "etl_json_roundtrip" -> etlOrcRoundtripSql
  )
}
