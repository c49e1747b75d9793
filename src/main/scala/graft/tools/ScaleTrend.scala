package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Scale-trend harness (SURVEY §4): measures how each expensive benched
  * entry's wall-clock grows from the driver's sf0.1 corpus to the
  * builder-owned ScaleGen corpus at `mult`× the rows, and writes
  * SCALE_TREND.json with per-entry (base_s, scaled_s, ratio).
  *
  * An entry that scales ≲ O(n log n) should show ratio ≤ ~13 at 10×;
  * anything materially above that is either a documented
  * contract-quadratic shape (pair-output dedups) or a scaling bug to fix.
  * This turns the repo's "would it survive 100×?" plan-audit claims into
  * measurements.
  *
  * Protocol mirrors Bench: persisted/served entries get their build-once
  * landing jobs run OUTSIDE the timed region (their §2 claim is the serve
  * path), then two full interleaved passes per dir with per-entry min, a
  * third tiebreak rep when a pair disagrees >3× and >1 s. Both dirs run
  * in ONE session so the JVM/codegen warmup is shared; base runs first.
  */
object ScaleTrend {
  /** the scale-trend cohort: the most expensive benched entries (by
    * BENCH_r14 per-query cost) plus one canonical representative per
    * cheap family whose scaling law is worth pinning (scan/agg, fact
    * build, sessionize, LSH dedup, IVF ANN, tf-idf, BPE, sequential A/B).
    */
  val entries: Seq[String] = Seq(
    // top-25 by r14 bench cost
    "dedup_cascade", "curation_pipeline", "rec_als_implicit",
    "rec_als_topn_d4", "rec_user_topn", "rec_als_topn",
    "dedup_jaccard_prefix", "dedup_containment_keeper",
    "dedup_jaccard_prefix_keeper", "knn_graph_hits",
    "rec_user_topn_persisted", "rec_item_item_cf", "decontaminate_fuzzy",
    "dedup_simhash_keeper", "rec_basket_lift", "ann_topk_sq8",
    "rec_item_item_cf_persisted", "knn_graph_clusters", "knn_graph_pagerank",
    "ann_topk_graph", "dm_audience_overlap", "dm_skyline_tracks",
    "agg_mad_exact", "ann_topk_pq_refine", "dm_monthly_agg",
    // family representatives
    "q1_pricing_summary", "etl_fact_build", "sessionize_events",
    "dedup_minhash_lsh", "ann_topk_ivf", "text_tfidf", "bpe_train_merges",
    "events_ab_sequential")

  def main(args: Array[String]): Unit = {
    val baseDir   = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val scaledDir = sys.env.getOrElse("SPARK_GRAFT_SCALED_DIR", "target/scaledata/sf1")
    val mult      = sys.env.getOrElse("SPARK_GRAFT_SCALE_MULT", "10").toInt
    val cpus      = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val picked    = if (args.nonEmpty) args.toSeq else entries
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
    def runOnce(name: String, dir: String): Double = {
      System.err.println(s"[trend] start $name @ $dir")
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, dir)
        .write.mode("overwrite").format("noop").save()
      catch {
        case e: Throwable =>
          System.err.println(s"[trend] $name @ $dir failed: $e")
          errors(s"$name@$dir") = e.getClass.getSimpleName + ": " +
            Option(e.getMessage).getOrElse("").takeWhile(_ != '\n').take(200)
          return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }

    def measure(dir: String): Map[String, Seq[Double]] = {
      // untimed pre-builds: persisted index saves, served-state folds, the
      // centrality pair's pinned graph — the timed claim is the serve path
      runOnce("q1_pricing_summary", dir) // warmup (also first-touch of the dir)
      picked.filter(_.endsWith("_persisted")).foreach(runOnce(_, dir))
      picked.filter(_.endsWith("_served")).foreach(runOnce(_, dir))
      if (picked.exists(_.startsWith("knn_graph")) || picked.contains("ann_topk_graph"))
        graft.ops.KnnGraph.exactGraphOf(spark, dir)
      val p1 = picked.map(n => n -> runOnce(n, dir))
      val p2 = picked.map(n => n -> runOnce(n, dir))
      val tb = p1.zip(p2).collect { case ((n, a), (_, b))
        if a >= 0 && b >= 0 && math.max(a, b) > 3 * math.min(a, b) &&
          math.max(a, b) - math.min(a, b) > 1.0 =>
        System.err.println(s"[trend] tiebreak rep for $n (${a}s vs ${b}s)")
        n -> runOnce(n, dir)
      }.toMap
      p1.zip(p2).map { case ((n, a), (_, b)) =>
        n -> (Seq(a, b) ++ tb.get(n))
      }.toMap
    }

    val baseReps   = measure(baseDir)
    val scaledReps = measure(scaledDir)

    def best(reps: Seq[Double]): Double = {
      val v = reps.filter(_ >= 0); if (v.isEmpty) -1.0 else v.min
    }
    def fmt(d: Double): String = if (d < 0) "-1.0" else f"$d%.3f"
    val body = picked.map { n =>
      val b = best(baseReps(n)); val s = best(scaledReps(n))
      val ratio = if (b > 0 && s >= 0) s / b else -1.0
      s""""$n":{"base_s":${fmt(b)},"scaled_s":${fmt(s)},"ratio":${fmt(ratio)},""" +
        s""""base_reps":[${baseReps(n).map(fmt).mkString(",")}],""" +
        s""""scaled_reps":[${scaledReps(n).map(fmt).mkString(",")}]}"""
    }.mkString("{", ",", "}")
    val errsJson = errors.map { case (k, v) =>
      val clean = v.filter(_ >= ' ').replace("\\", "\\\\").replace("\"", "\\\"")
      "\"" + k + "\":\"" + clean + "\""
    }.mkString("{", ",", "}")
    val json = s"""{"mult":$mult,"base":"$baseDir","scaled":"$scaledDir","cpus":$cpus,"entries":$body,"errors":$errsJson}"""
    java.nio.file.Files.write(java.nio.file.Paths.get("SCALE_TREND.json"),
      json.getBytes("UTF-8"))
    spark.stop()
    println(json)
    System.out.flush()
  }
}
