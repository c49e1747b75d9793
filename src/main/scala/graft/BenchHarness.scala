package graft

import org.apache.spark.sql.SparkSession

/** Prices the bench-EXCLUDED eval-harness family once per round (r13
  * verdict #6): these entries are deliberately absent from Bench's
  * headline list because each re-runs operators the suite already times
  * individually (double-counting) — but their real cost should stay
  * visible round-over-round in an artifact, not only in SURVEY prose.
  *
  * Protocol: one untimed warm-up run, then ONE timed warm run per entry
  * (no interleaved min-of-2 — this artifact tracks drift, not contention
  * adjudication; a contended number here is re-read against next round's
  * file, not re-benched). Output: BENCH_HARNESS.json, one JSON line with
  * the same field shape as bench.json.
  */
object BenchHarness {

  /** The excluded-harness family, by exclusion reason (the reasons live
    * as comments beside Bench.headline).
    */
  val harness: Seq[String] = Seq(
    // rec eval harnesses: re-run the CF train chain the suite times
    "rec_eval_prk", "rec_eval_ndcg", "rec_eval_mrr",
    "rec_eval_prk_baseline", "rec_eval_exposure_gini", "rec_coverage_eval",
    // ANN / dedup measurement harnesses: run every family path
    // back-to-back
    "ann_recall_eval", "ann_matryoshka_eval", "dedup_recall_eval",
    "dedup_soft_weights",
    // composites over already-timed entries
    "events_ab_readout", "knn_graph_modularity", "knn_graph_conductance")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
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

    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    def runOnce(name: String): Double = {
      System.err.println(s"[harness] start $name")
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      catch {
        case e: Throwable =>
          System.err.println(s"[harness] $name failed: $e")
          errors(name) = (e.getClass.getSimpleName + ": " +
            Option(e.getMessage).getOrElse("").takeWhile(_ != '\n').take(200))
          return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }

    harness.foreach(runOnce) // warm-up pass (JIT + shared cached frames)
    val results = harness.map(n => n -> runOnce(n))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errsJson = errors.map { case (k, v) =>
      val clean = v.filter(_ >= ' ').replace("\\", "\\\\").replace("\"", "\\\"")
      "\"" + k + "\":\"" + clean + "\""
    }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val json = s"""{"metric":"harness_total","value":$total,"unit":"sec","queries":$qs,"errors":$errsJson,"sf":"$sfDir"}"""
    java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_HARNESS.json"),
      json.getBytes("UTF-8"))
    spark.stop()
    println(json)
    System.out.flush()
  }
}
