package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for a list of entries to files — the
  * r15 optimization round's before/after plan evidence
  * (plans/r15/<query>_{before,after}.txt). Usage:
  *   sbt "runMain graft.tools.DumpR15 <outDir> <suffix> <query...>"
  */
object DumpR15 {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names  = args.drop(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
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
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      val plan = graft.SparkEntry.queries(name)(spark, "/root/testdata/sf0.1")
        .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"), plan)
      System.err.println(s"[dump] $name -> ${name}_$suffix.txt (${plan.length} chars)")
    }
    spark.stop()
  }
}
