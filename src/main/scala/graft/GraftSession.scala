package graft

import org.apache.spark.sql.SparkSession

/** Tuned local session for tests/benchmarks.
  *
  * Settings chosen for the cluster-shaped workload, applied in local mode:
  *  - AQE on (runtime shuffle coalescing + skew-join splitting),
  *  - shuffle partitions sized to cores (not the 200 default),
  *  - UTC session timezone (oracle parity with DuckDB).
  */
object GraftSession {
  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      // runtime bloom-filter pruning: inert at test scale (below the 10MB
      // creation threshold), prunes shuffle-join probe sides at real scale
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
