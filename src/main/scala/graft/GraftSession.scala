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
      // subset-key co-partitioning (r15): a join whose children are both
      // hash-partitioned on a SUBSET of the join keys (e.g. the voting
      // tails' user_id layout under a (user_id, item_id) anti-join) is
      // already co-located; the default=true setting would re-exchange
      // both sides on the full key set. Scale-independent planner knob,
      // not a local-core tuning.
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
