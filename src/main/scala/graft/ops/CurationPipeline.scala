package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** END-TO-END CURATION PIPELINE — the FineWeb-shaped acceptance test
  * that the corpus operators COMPOSE, not just run alone: one driver-
  * gated flow over `documents` running
  *
  *   normalize → cascade dedup → quality LR → decontaminate →
  *   domain-mix → shard
  *
  * with per-stage drop accounting (one output row per stage:
  * n_in / n_kept / n_dropped, n_kept(i) == n_in(i+1) by construction —
  * the spec pins the chain and recomputes every stage's drop count
  * independently through the SAME solo cores on the staged inputs).
  *
  * Composition points that only exist end-to-end:
  *  - every stage after normalize sees NORMALIZED bytes (dedup
  *    signatures, classifier features and benchmark n-grams all read
  *    `norm_text` — the production contract textNormalize's docs
  *    promise);
  *  - the quality model trains on the DEDUPED corpus (training a
  *    filter on a corpus still full of near-dups over-weights the
  *    duplicated boilerplate — the FineWeb ordering);
  *  - domain-mix thresholds are computed on the POST-FILTER corpus, so
  *    the mixture targets what actually survives, and the shard
  *    assignment is the shared [[Curation.withShardKeys]] (a doc lands
  *    identically here, in the solo entry, and on the stream).
  *
  * Scale shape: each stage is its solo entry's plan (all bucketed /
  * broadcast / partial-agg — no new join shapes); the composition adds
  * one `left_anti` per stage boundary on `doc_id`, and survivors
  * localCheckpoint between stages so no stage re-runs its
  * predecessors' lineage. Rows-only by design (the LR stage is
  * transcendental); CurationPipelineSpec pins chain consistency,
  * per-stage reconciliation, and end-to-end determinism.
  */
object CurationPipeline {

  /** Stage names in composition order. */
  private[graft] val stageNames: Seq[String] =
    Seq("normalize", "dedup_cascade", "quality_lr", "decontaminate",
      "domain_mix", "shard")

  /** The surviving-docs frame AFTER each stage, keyed by stage name;
    * frames carry (doc_id, text, lang, source, n_chars) with `text`
    * normalized from stage 1 on. Exposed for the reconciliation spec.
    */
  private[graft] def stageSurvivors(spark: SparkSession, dir: String): Seq[(String, DataFrame)] = {
    import spark.implicits._
    val raw = Tables.documents(spark, dir)
      .select($"doc_id", $"text", $"lang", $"source")

    // 1. normalize: no drops; downstream sees normalized bytes and the
    //    recomputed char count
    val norm = CorpusOps.textNormalizeOn(raw)
      .select($"doc_id", $"norm_text")
      .join(raw.select($"doc_id", $"lang", $"source"), Seq("doc_id"))
      .select($"doc_id", $"norm_text".as("text"), $"lang", $"source",
        length($"norm_text").cast("long").as("n_chars"))
      .localCheckpoint()

    // 2. cascade dedup (exact → MinHash-LSH → semantic) on the
    //    normalized text; embeddings' cell assignment is text-free
    val cascade = DedupCascade.dedupCascadeOn(
      norm.select($"doc_id", $"text", $"lang"),
      SemanticDedup.assignedCells(spark, dir))
    val survDedup = norm.join(
        cascade.filter(!$"kept").select($"doc_id"), Seq("doc_id"), "left_anti")
      .localCheckpoint()

    // 3. quality LR trained on the DEDUPED corpus, scored map-side
    val (w, _) = QualityTrain.train(
      QualityTrain.featurized(survDedup), QualityTrain.defaultIters)
    val survQuality = survDedup.join(
        QualityTrain.scoreLrOn(survDedup, w)
          .filter($"label" === "lq").select($"doc_id"),
        Seq("doc_id"), "left_anti")
      .localCheckpoint()

    // 4. decontaminate: drop docs sharing a verbatim 8-gram with the
    //    benchmark slice (bench docs themselves are corpus members and
    //    stay; only contaminated TRAINING docs drop)
    val survDecon = survQuality.join(
        CorpusOps.decontaminateNgramOn(survQuality)
          .filter($"verdict" === "drop_contaminated").select($"doc_id"),
        Seq("doc_id"), "left_anti")
      .localCheckpoint()

    // 5. domain-mix resample: α=0.5 temperature thresholds from the
    //    POST-FILTER source counts, keep decision map-side
    val survMix = survDecon
      .withColumn("bucket", CorpusOps.domainMixBucket($"doc_id"))
      .join(broadcast(CorpusOps.domainMixThresholds(survDecon)), Seq("source"))
      .filter($"bucket" < $"threshold")
      .select($"doc_id", $"text", $"lang", $"source", $"n_chars")
      .localCheckpoint()

    // 6. shard: assignment only, no drops (the write is writeShards)
    val sharded = Curation.withShardKeys(survMix, shards = 16)
      .select($"doc_id", $"text", $"lang", $"source", $"n_chars")

    Seq("normalize" -> norm, "dedup_cascade" -> survDedup,
      "quality_lr" -> survQuality, "decontaminate" -> survDecon,
      "domain_mix" -> survMix, "shard" -> sharded)
  }

  /** §2 entry `curation_pipeline`: the per-stage accounting table. */
  def curationPipeline(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val nIn0 = Tables.documents(spark, dir).count()
    val counts = stageSurvivors(spark, dir).map { case (name, df) => name -> df.count() }
    val rows = counts.zipWithIndex.map { case ((name, kept), i) =>
      val nIn = if (i == 0) nIn0 else counts(i - 1)._2
      (i + 1L, name, nIn, kept, nIn - kept)
    }
    rows.toDF("stage_order", "stage", "n_in", "n_kept", "n_dropped")
      .orderBy($"stage_order")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "curation_pipeline" -> (curationPipeline _)
  )

  val oracleSql: Map[String, String] = Map.empty
}
