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
    "sq8"    -> EmbeddingSq.annTopkSq8(spark, dir)
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_recall_eval" -> (annRecallEval _)
  )

  val oracleSql: Map[String, String] = Map.empty
}
