package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** The production dedup CASCADE — exact → MinHash near-dup → semantic —
  * as ONE operator: the staged policy every web-scale corpus pipeline
  * runs (RefinedWeb/FineWeb-style), where each stage only examines the
  * previous stage's survivors, so the expensive stages see a corpus
  * already thinned by the cheap ones.
  *
  * Stages (each reusing the standalone operator's core verbatim, so the
  * cascade cannot disagree with its parts):
  *   1. EXACT — min-id keeper on the canonical bag-of-words form
  *      ([[LlmQueries.dedupExactKeeperOn]] over [[BloomDedup.canonText]],
  *      the incremental-Bloom entry's duplicate definition): O(n).
  *   2. NEAR-DUP — MinHash-LSH band buckets + true-CC keeper labels over
  *      the stage-1 survivors ([[ScaleDedup.bandRows]] + ccKeepers, the
  *      round-10 resolution): candidate work = bucket occupancy.
  *   3. SEMANTIC — SemDeDup cell-blocked embedding cosine over the
  *      stage-2 survivors ([[SemanticDedup.semanticEdges]] filtered to
  *      pairs with BOTH endpoints alive, then the shared ccKeepers
  *      components). Cell assignment stays against the full-corpus Lloyd
  *      index — the coarse quantizer is corpus-level state, stage
  *      filtering prunes the pairs, not the geometry.
  *
  * Output: one row per document — the kept/dropped verdict, the stage
  * that dropped it (0 = survived all three), and its keeper. Rows-only
  * (stage 3 is sketch-free but cell-blocked, not SQL-expressible);
  * CascadeSpec pins stage-1/2 agreement with the standalone keepers,
  * monotone survivor sets, and non-vacuous drops at every stage.
  *
  * Scale: stages compose as anti-joins on bounded dropped-id sets; no
  * stage re-reads corpus text the standalone operator wouldn't.
  * The embeddings table is the documents' embedding column (vec_id ≡
  * doc_id in this testdata — the modeled doc-embedding store).
  */
object DedupCascade {

  def dedupCascade(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    dedupCascadeOn(
      Tables.documents(spark, dir).select($"doc_id", $"text", $"lang"),
      SemanticDedup.assignedCells(spark, dir))
  }

  /** Core over injectable (docs, cell-assigned embeddings) — the planted
    * fixture drives stage 3 through it (on the gate corpus every
    * cos ≥ 0.4 pair is also a lexical near-dup, so stage 3's marginal
    * catch is empty there — CascadeSpec plants the lexically-disjoint /
    * embedding-identical pair that is stage 3's whole reason to exist).
    */
  private[graft] def dedupCascadeOn(docs: DataFrame, assigned: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._

    // stage 1: exact on the CANONICAL bag-of-words form (the
    // dedup_incremental_bloom definition — raw-text equality matches
    // nothing on this corpus: zero verbatim repeats, the r8 finding)
    val s1 = LlmQueries.dedupExactKeeperOn(
        docs.withColumn("text", BloomDedup.canonText($"text")))
      .select($"doc_id", $"keeper_doc_id", lit(1L).as("stage"))
      .localCheckpoint()
    val surv1 = docs.join(s1.select($"doc_id"), Seq("doc_id"), "left_anti")

    // stage 2: MinHash-LSH keeper over survivors (the standalone entry's
    // round-10 LSH→verify→CC resolution, on the thinned corpus)
    val bands = ScaleDedup.bandRows(surv1).localCheckpoint()
    val s2 = ScaleDedup.minhashVerifiedKeepers(surv1, bands)
      .filter($"doc_id" =!= $"keeper_doc_id")
      .select($"doc_id", $"keeper_doc_id", lit(2L).as("stage"))
      .localCheckpoint()
    val surv2 = surv1.join(s2.select($"doc_id"), Seq("doc_id"), "left_anti")

    // stage 3: semantic (SemDeDup) over remaining survivors — edges from
    // the shared cell-blocked verify, pruned to pairs both alive
    val alive = surv2.select($"doc_id")
    val edges = SemanticDedup.semanticEdges(assigned)
      .join(alive.select($"doc_id".as("a")), Seq("a"), "left_semi")
      .join(alive.select($"doc_id".as("b")), Seq("b"), "left_semi")
      .localCheckpoint() // ccKeepersEdges re-reads its input (sym union)
    val s3 = ScaleDedup.ccKeepersEdges(edges.select($"a", $"b"))
      .filter($"doc_id" =!= $"keeper")
      .select($"doc_id", $"keeper".as("keeper_doc_id"), lit(3L).as("stage"))

    val dropped = s1.unionByName(s2).unionByName(s3)
    docs.select($"doc_id")
      .join(dropped, Seq("doc_id"), "left")
      .select($"doc_id",
        coalesce($"stage", lit(0L)).as("stage"),
        coalesce($"keeper_doc_id", $"doc_id").as("keeper_doc_id"),
        $"stage".isNull.as("kept"))
      .orderBy($"doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_cascade" -> (dedupCascade _)
  )

  val oracleSql: Map[String, String] = Map.empty
}
