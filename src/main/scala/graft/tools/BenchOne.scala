package graft.tools

import org.apache.spark.sql.SparkSession

/** Single-query profiler: times one `SparkEntry.queries` entry N times at a
  * given SF dir and dumps its formatted plan. Usage:
  *   sbt "runMain graft.tools.BenchOne <query> [reps] [sfDir]"
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name  = args.headOption.getOrElse("text_cooccurrence")
    val reps  = if (args.length > 1) args(1).toInt else 3
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
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

    val q = graft.SparkEntry.queries(name)
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      q(spark, sfDir).write.mode("overwrite").format("noop").save()
      System.err.println(f"[benchone] $name rep $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    System.err.println(q(spark, sfDir).queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    spark.stop()
  }
}
