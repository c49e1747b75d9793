package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver's star-schema testdata (see TESTDATA.md).
  *
  * Each loader is a plain parquet scan: projection and predicates applied by
  * callers are pushed into the scan by Catalyst (verified in PlanSpec), so
  * at 100 TB each query reads only the columns/row-groups it needs.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects. Read it as raw nanos (legacy long mode) and floor-divide
    * to a microsecond timestamp — the same truncation DuckDB applies when
    * casting TIMESTAMP_NS to TIMESTAMP, so oracle comparisons agree.
    * Integer arithmetic only: nanos (~1.7e18) overflow double precision.
    * `spark.sql.legacy.parquet.nanosAsLong` is set once at session build
    * (GraftSession/Bench/Verify/test suites) — reads must not mutate shared
    * session state.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    require(spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "true",
      "set spark.sql.legacy.parquet.nanosAsLong=true at session build (see GraftSession)")
    table(spark, dir, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
