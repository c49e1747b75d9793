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
    // the oracle's prefix list is a compile-time constant — fail LOUDLY on
    // a corpus whose dimension disagrees instead of letting the SQL emit
    // silently-wrong prefix rows (the binarySigs raise_error discipline,
    // driver-side here because fullDim is already a driver scalar)
    require(fullDim == matryoshkaFullDim,
      s"ann_matryoshka_eval's oracle is pinned to dim=$matryoshkaFullDim prefixes " +
        s"but the corpus has dim=$fullDim — regenerate annMatryoshkaEvalSql's prefix list")
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

  /** Oracle for `ann_matryoshka_eval` (PROMOTED r11-cont): every prefix
    * ranking is an exact integer dot over the first d' components, the
    * hit counts are semi-join cardinalities, and recall is one IEEE
    * division of exact integers — the whole measurement harness
    * hash-checks. (ann_recall_eval stays rows-only: its PCA path runs a
    * driver-side Jacobi eigensolve, which is bounded model state, not
    * SQL.) The full dimension is pinned at 64 — the corpus dimension
    * every other embedding oracle also assumes (binarySigs raises above
    * it).
    */
  /** The one full-dimension constant both engines share: the Spark entry
    * requires the corpus to match it, the oracle's prefix list derives
    * from it — they cannot drift apart silently. */
  val matryoshkaFullDim = 64

  val annMatryoshkaEvalSql: String = {
    def pdot(a: String, b: String, dp: Int) =
      s"CAST(list_sum(list_transform(range(1, $dp + 1), j -> $a[j] * $b[j])) AS BIGINT)"
    val prefixes = Seq(4, 8, 16, matryoshkaFullDim)
    val perPrefix = prefixes.map { dp =>
      s"""
         |, t$dp AS (
         |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         |    row_number() OVER (PARTITION BY a.vec_id
         |      ORDER BY ${pdot("a.v", "b.v", dp)} DESC, b.vec_id) AS rn
         |  FROM n a JOIN n b ON a.vec_id % 10 = 0 AND a.vec_id <> b.vec_id
         |), h$dp AS (
         |  SELECT CAST($dp AS BIGINT) AS prefix_dim, CAST(COUNT(*) AS BIGINT) AS hits
         |  FROM t$dp t JOIN exact5 e ON e.query_id = t.query_id AND e.neighbor_id = t.neighbor_id
         |  WHERE t.rn <= 5
         |)""".stripMargin
    }.mkString
    val unioned = prefixes.map(dp => s"SELECT * FROM h$dp").mkString(" UNION ALL ")
    LlmQueries.quantizedCte +
      s"""
         |, exact5 AS MATERIALIZED (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         |      row_number() OVER (PARTITION BY a.vec_id
         |        ORDER BY CAST(list_sum(list_transform(range(1, len(a.v) + 1), j -> a.v[j] * b.v[j])) AS BIGINT) DESC, b.vec_id) AS rn
         |    FROM n a JOIN n b ON a.vec_id % 10 = 0 AND a.vec_id <> b.vec_id) WHERE rn <= 5
         |), totals AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS exact_total,
         |    CAST(COUNT(DISTINCT query_id) AS BIGINT) AS n_queries
         |  FROM exact5
         |)$perPrefix
         |SELECT u.prefix_dim, t.n_queries, u.hits, t.exact_total,
         |  CAST(u.hits AS DOUBLE) / CAST(t.exact_total AS DOUBLE) AS recall_at_5
         |FROM ($unioned) u
         |CROSS JOIN totals t
         |ORDER BY u.prefix_dim""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    "ann_matryoshka_eval" -> annMatryoshkaEvalSql
  )
}
