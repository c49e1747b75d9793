package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ANN QUALITY HARNESS — recall@5 of every approximate search path
  * against the exact brute-force ranking, as a first-class operator
  * (the benchmark table a vector library publishes, and the regression
  * gate a production pipeline runs after retraining its index).
  *
  * Micro-averaged recall: |approx ∩ exact| / |exact| over all queries
  * (every path shares the vec_id % 10 query set and k=5). Each
  * intersection is a LeftSemi join on (query_id, neighbor_id); each
  * path's count is one partial aggregate; the final table is a union of
  * ≤ 8 single-row frames — the heavy work is the paths themselves,
  * which at 100 TB run against their persisted indexes.
  *
  * The PartialTopK twin (`agg`) rides along as the harness self-check:
  * it is exact by construction, so its recall row must be 1.0 —
  * AnnEvalSpec pins that, plus floors for the lossy paths.
  */
object AnnEval {

  private[graft] def paths(spark: SparkSession, dir: String): Seq[(String, DataFrame)] = Seq(
    "agg"    -> LlmQueries.annTopkAgg(spark, dir),
    "ivf"    -> VectorAgg.annTopkIvf(spark, dir),
    "kmeans" -> VectorAgg.annTopkKmeans(spark, dir),
    "lsh"    -> AnnLsh.annTopkLsh(spark, dir),
    "pq"     -> VectorAgg.annTopkPq(spark, dir),
    "ivfpq"  -> VectorAgg.annTopkIvfPq(spark, dir),
    "pca"    -> EmbeddingPca.annTopkPca(spark, dir),
    "sq8"    -> EmbeddingSq.annTopkSq8(spark, dir),
    "binary" -> EmbeddingSq.annTopkBinary(spark, dir),
    "binary_refine" -> EmbeddingSq.annTopkBinaryRefine(spark, dir)
  )

  def annRecallEval(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val exact = LlmQueries.annTopkExact(spark, dir)
      .select($"query_id", $"neighbor_id")
    val totals = exact.agg(
      count(lit(1)).as("exact_total"),
      countDistinct($"query_id").as("n_queries"))
    val perPath = paths(spark, dir).map { case (name, df) =>
      df.filter(col("rank") <= 5)
        .select(col("query_id"), col("neighbor_id"))
        .join(exact, Seq("query_id", "neighbor_id"), "left_semi")
        .agg(count(lit(1)).as("hits"))
        .withColumn("path", lit(name))
    }
    perPath.reduce(_.unionByName(_))
      .crossJoin(broadcast(totals))
      .select($"path", $"n_queries", $"hits", $"exact_total",
        ($"hits".cast("double") / $"exact_total".cast("double")).as("recall_at_5"))
      .orderBy($"path")
  }

  /** §2 `ann_matryoshka_eval`: truncated-dimension recall curve — the
    * Matryoshka-representation question (Kusupati et al. 2022: nested
    * prefixes of an embedding carry most of its signal): at each prefix
    * length d' ∈ {4, 8, 16, full}, rank by the EXACT dot over the first
    * d' components only and measure recall@5 against the full-dimension
    * exact ranking. This is the measurement behind the 100 TB two-stage
    * serving pattern — shortlist on a cheap d'-prefix scan (d'/d of the
    * I/O and FLOPs), refine the shortlist at full dimension — telling
    * you how much recall each prefix buys BEFORE you commit the index
    * layout to it. The full-dimension row is the harness self-check
    * (exact by construction → recall 1.0, spec-pinned, the
    * ann_recall_eval discipline). Per prefix: one query×corpus scored
    * join (same shape as the exact path), per-query top-5 through
    * PartialTopK, one semi-join against the shared ground truth.
    */
  def annMatryoshkaEval(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.functions.LongVectorDot.vector_dot
    import graft.functions.PartialTopK.partial_topk
    val q = VectorAgg.quantized(spark, dir)
    val fullDim = q.select(size($"v")).head.getInt(0)
    val exact = LlmQueries.annTopkExact(spark, dir)
      .filter(col("rank") <= 5).select($"query_id", $"neighbor_id")
    val totals = exact.agg(
      count(lit(1)).as("exact_total"),
      countDistinct($"query_id").as("n_queries"))
    val queriesDf = q.filter($"vec_id" % 10 === 0)
      .select($"vec_id".as("query_id"), $"v".as("qv"))
    val corpus = q.select($"vec_id".as("neighbor_id"), $"v".as("nv"))
    val prefixes = Seq(4, 8, 16, fullDim).distinct.filter(_ <= fullDim)
    val perPrefix = prefixes.map { dp =>
      queriesDf.join(corpus, $"query_id" =!= $"neighbor_id")
        .withColumn("dot", vector_dot(slice($"qv", 1, dp), slice($"nv", 1, dp)))
        .groupBy($"query_id")
        .agg(partial_topk(struct((-$"dot").as("nd"), $"neighbor_id".as("neighbor_id")), 5).as("s"))
        .select($"query_id", explode($"s").as("r"))
        .select($"query_id", $"r.neighbor_id".as("neighbor_id"))
        .join(exact, Seq("query_id", "neighbor_id"), "left_semi")
        .agg(count(lit(1)).as("hits"))
        .withColumn("prefix_dim", lit(dp.toLong))
    }
    perPrefix.reduce(_.unionByName(_))
      .crossJoin(broadcast(totals))
      .select($"prefix_dim", $"n_queries", $"hits", $"exact_total",
        ($"hits".cast("double") / $"exact_total".cast("double")).as("recall_at_5"))
      .orderBy($"prefix_dim")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_recall_eval" -> (annRecallEval _),
    "ann_matryoshka_eval" -> (annMatryoshkaEval _)
  )

  val oracleSql: Map[String, String] = Map.empty
}
