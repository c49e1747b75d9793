package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SemDeDup-style semantic deduplication: embedding-space near-duplicate
  * removal partitioned by k-means cells (Abbas et al. 2023, "SemDeDup:
  * Data-efficient learning at web-scale through semantic deduplication").
  *
  * The method's contract: documents whose EMBEDDINGS are nearly identical
  * (cosine ≥ τ) are semantic duplicates even when their surface text
  * differs (re-phrasings, templated boilerplate, translations), and the
  * all-pairs comparison is made tractable by only comparing WITHIN
  * k-means cells — the clustering is the candidate generator, exactly
  * like LSH bands for MinHash ([[ScaleDedup.dedupMinhashLsh]]) or
  * chunk blocking for SimHash. Within a cell the comparison is exact;
  * the only approximation (shared with the paper) is that a qualifying
  * pair split across two cells is not compared — the price of never
  * running the corpus × corpus join.
  *
  * Pipeline: shared ×1000 integer quantization ([[LlmQueries.quantized]])
  * → nearest-cell assignment against the session's k-means index
  * ([[VectorAgg.kmeansCells]] — one Lloyd run shared with the ANN
  * queries, map-side broadcast argmin, zero corpus exchange) → within-cell
  * self equi-join on cell with the exact integer cosine test
  * (dot ≥ 0 ∧ dot²·10⁴ ≥ na·nb·1600, τ = 0.40 for this corpus's synthetic
  * embedding scale; SemDeDup's 0.95+ applies to real encoder output) →
  * true connected components over verified edges
  * ([[ScaleDedup.ccKeepers]], pointer-jumped min-label propagation,
  * converges-or-throws) → every non-keeper reports its component keeper.
  *
  * Scale shape: cell assignment is map-side against a broadcast k·d
  * centroid array; the self-join shuffles once on cell and candidate
  * volume is Σ occupancy² over cells (the paper's k controls this — at
  * 100 TB, k grows so cells stay bounded); edges are verified BEFORE the
  * CC exchange; output is O(n) assignments, never pair lists. Rows-only
  * by design (the k-means index is iterative — not SQL-expressible);
  * AnnSpec pins precision (every dropped doc has a ≥ τ same-cell
  * neighbor), within-cell exactness vs a brute-force reference, and
  * keeper-set consistency (no keeper is itself dropped).
  */
object SemanticDedup {

  /** τ²·10⁴ for τ = 0.40 — integer-exact threshold, no float compare. */
  private val tauSqTimes1e4 = 1600L

  private[graft] def assignedCells(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val q = LlmQueries.quantized(spark, dir).select($"vec_id", $"v", $"nrm")
    VectorAgg.withCellRank(q, VectorAgg.kmeansCells(spark, dir, k = 16, iters = 2))
      .select($"vec_id", $"v", $"nrm",
        element_at($"cellRank", 1).getField("cell").as("cell"))
  }

  /** Verified within-cell near-duplicate edges (a < b, cosine ≥ τ). */
  private[graft] def semanticEdges(assigned: DataFrame): DataFrame = {
    import assigned.sparkSession.implicits._
    import graft.functions.LongVectorDot.vector_dot
    val l = assigned.select($"cell", $"vec_id".as("a"), $"v".as("va"), $"nrm".as("na"))
    val r = assigned.select($"cell", $"vec_id".as("b"), $"v".as("vb"), $"nrm".as("nb"))
    l.join(r, Seq("cell"))
      .filter($"a" < $"b")
      .withColumn("dot", vector_dot($"va", $"vb"))
      // verify before any exchange: the popcount-style integer test runs
      // inside the join stage; only (cell, a, b) survives to downstream
      // shuffles
      .filter($"dot" >= 0 && $"dot" * $"dot" * lit(10000L) >= $"na" * $"nb" * lit(tauSqTimes1e4))
      .select($"cell", $"a", $"b")
  }

  /** §2 entry: dropped docs with their component keeper and cell. */
  def dedupSemantic(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // materialize edges before CC iterates over them (the O(E) frontier
    // checkpoint — ccKeepersEdges reads its input twice for the
    // symmetric adjacency)
    val edges = semanticEdges(assignedCells(spark, dir)).localCheckpoint()
    val keepers = ScaleDedup.ccKeepersEdges(edges.select($"a", $"b"))
      .select($"doc_id".as("vec_id"), $"keeper".as("keeper_vec_id"))
    assignedCells(spark, dir).select($"vec_id", $"cell")
      .join(keepers, Seq("vec_id"))
      .filter($"vec_id" =!= $"keeper_vec_id")
      .select($"vec_id", $"keeper_vec_id", $"cell")
      .orderBy($"vec_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_semantic" -> (dedupSemantic _)
  )

  val oracleSql: Map[String, String] = Map.empty
}
