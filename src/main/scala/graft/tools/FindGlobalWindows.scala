package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Diagnostic: list queries whose executed plan contains a WindowExec with
  * an empty partition spec (single-partition global window — the 100 TB
  * red flag this repo eliminates; see Curation two-level scan).
  */
object FindGlobalWindows {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        // PlanWalk descends through AdaptiveSparkPlanExec — a plain
        // .collect on the executedPlan sees only the AQE leaf wrapper
        val hits = PlanWalk.globalWindows(df.queryExecution.executedPlan)
        if (hits.nonEmpty) println(s"GLOBALWINDOW $name: ${hits.size}")
      } catch { case e: Throwable => println(s"ERR $name: ${e.getMessage.take(100)}") }
    }
    spark.stop()
    println("DONE")
  }
}
