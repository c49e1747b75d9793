package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Guards the loader layer against testdata drift.
  *
  * Round 7 post-mortem: the driver regenerated `events.parquet` from
  * TIMESTAMP(NANOS) to TIMESTAMP(MICROS) and every events-reading query died
  * with the same AnalysisException — 27 red tests, zero of them naming the
  * actual cause. This suite makes the next drift ONE obvious red test:
  *  - every live table loads and `events.ts` normalizes to TimestampType;
  *  - each dtype the adaptive loader claims to support is exercised against
  *    a written fixture (raw-nanos long, TIMESTAMP_NTZ, TIMESTAMP);
  *  - an unsupported dtype fails loudly in the loader, not downstream.
  */
class TablesSpec extends SparkSuite {

  private def fixtureDir(): String =
    java.nio.file.Files.createTempDirectory("graft_tables_spec").toString

  test("all live tables load; events.ts normalizes to TimestampType") {
    val names = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    names.foreach { n =>
      assert(Tables.table(spark, sf, n).columns.nonEmpty, n)
    }
    val ev = Tables.events(spark, sf)
    assert(ev.schema("ts").dataType == TimestampType,
      s"events.ts must normalize to TimestampType, got ${ev.schema("ts").dataType}")
    assert(ev.select(min("ts"), max("ts")).first().getTimestamp(0) != null)
  }

  test("live table schemas match the contract every query compiles against") {
    // name -> (column, loaded Spark dtype). A driver-side regeneration that
    // drifts ANY column (the round-7 events µs/ns incident) turns into this
    // one named failure instead of dozens of downstream AnalysisExceptions.
    // Timestamps may load as timestamp OR timestamp_ntz (writer-dependent);
    // both normalize fine downstream, so either spelling passes.
    val expected: Map[String, Seq[(String, String)]] = Map(
      "region" -> Seq("r_regionkey" -> "int", "r_name" -> "string"),
      "nation" -> Seq("n_nationkey" -> "int", "n_name" -> "string", "n_regionkey" -> "int"),
      "customer" -> Seq("c_custkey" -> "bigint", "c_name" -> "string",
        "c_nationkey" -> "int", "c_acctbal" -> "double", "c_mktsegment" -> "string"),
      "supplier" -> Seq("s_suppkey" -> "bigint", "s_name" -> "string",
        "s_nationkey" -> "int", "s_acctbal" -> "double"),
      "part" -> Seq("p_partkey" -> "bigint", "p_name" -> "string", "p_brand" -> "string",
        "p_type" -> "string", "p_size" -> "int", "p_retailprice" -> "double"),
      "orders" -> Seq("o_orderkey" -> "bigint", "o_custkey" -> "bigint",
        "o_orderstatus" -> "string", "o_totalprice" -> "double",
        "o_orderdate" -> "timestamp", "o_orderpriority" -> "string"),
      "lineitem" -> Seq("l_orderkey" -> "bigint", "l_partkey" -> "bigint",
        "l_suppkey" -> "bigint", "l_linenumber" -> "int", "l_quantity" -> "double",
        "l_extendedprice" -> "double", "l_discount" -> "double", "l_tax" -> "double",
        "l_returnflag" -> "string", "l_linestatus" -> "string", "l_shipdate" -> "timestamp"),
      "events" -> Seq("event_id" -> "bigint", "ts" -> "timestamp", "user_id" -> "bigint",
        "event_type" -> "string", "value" -> "double", "props" -> "string"),
      "documents" -> Seq("doc_id" -> "bigint", "text" -> "string", "lang" -> "string",
        "source" -> "string", "n_chars" -> "bigint"),
      "embeddings" -> Seq("vec_id" -> "bigint", "embedding" -> "array<float>",
        "label" -> "int"))
    expected.foreach { case (name, cols) =>
      val got = Tables.table(spark, sf, name).schema
        .map(f => f.name -> f.dataType.simpleString)
      val normalized = got.map { case (n, t) =>
        n -> (if (t == "timestamp_ntz") "timestamp" else t)
      }
      assert(normalized == cols, s"$name schema drift:\n  got  $got\n  want $cols")
    }
  }

  test("events loader: raw-nanos LongType fixture floor-divides to micros") {
    import spark.implicits._
    val dir = fixtureDir()
    // 2024-01-01T00:00:00.000000001 UTC in nanos: the sub-micro digit must
    // truncate (DuckDB TIMESTAMP_NS → TIMESTAMP semantics)
    val nanos = 1704067200L * 1000000000L + 1L
    Seq((1L, nanos)).toDF("event_id", "ts").write.mode("overwrite")
      .parquet(s"$dir/events.parquet")
    val got = Tables.events(spark, dir)
    assert(got.schema("ts").dataType == TimestampType)
    val ts = got.select($"ts".cast("string")).first().getString(0)
    assert(ts == "2024-01-01 00:00:00", ts)
  }

  test("events loader: TIMESTAMP_NTZ fixture passes through as the same UTC instant") {
    import spark.implicits._
    val dir = fixtureDir()
    Seq((1L, "2024-06-15 12:34:56.789012")).toDF("event_id", "s")
      .select($"event_id", $"s".cast(TimestampNTZType).as("ts"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    // written NTZ must round-trip as NTZ (else this fixture tests nothing)
    assert(spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType == TimestampNTZType)
    val got = Tables.events(spark, dir)
    assert(got.schema("ts").dataType == TimestampType)
    assert(got.select($"ts".cast("string")).first().getString(0) == "2024-06-15 12:34:56.789012")
  }

  test("events loader: TimestampType fixture passes through unchanged") {
    import spark.implicits._
    val dir = fixtureDir()
    Seq((1L, java.sql.Timestamp.valueOf("2024-06-15 12:34:56.789012")))
      .toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Tables.events(spark, dir)
    assert(got.schema("ts").dataType == TimestampType)
    assert(got.select($"ts".cast("string")).first().getString(0) == "2024-06-15 12:34:56.789012")
  }

  test("events loader: an unsupported ts dtype fails loudly in the loader") {
    import spark.implicits._
    val dir = fixtureDir()
    Seq((1L, "not a timestamp")).toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val e = intercept[IllegalStateException](Tables.events(spark, dir))
    assert(e.getMessage.contains("events.ts"), e.getMessage)
  }
}
