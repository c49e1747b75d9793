package graft

import org.apache.spark.sql.functions._

/** The end-to-end curation pipeline: chain consistency, per-stage drop
  * counts reconciled through the solo cores on the staged inputs, and
  * end-to-end determinism.
  */
class CurationPipelineSpec extends SparkSuite {

  private lazy val acct = ops.CurationPipeline.curationPipeline(spark, sf)
    .collect()
    .map(r => r.getString(1) -> ((r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4))))
    .toMap

  test("per-stage accounting chains: n_kept(i) == n_in(i+1), drops add up, order fixed") {
    val names = ops.CurationPipeline.stageNames
    assert(acct.keySet == names.toSet)
    val ordered = names.map(acct)
    assert(ordered.map(_._1) == (1L to names.length).toSeq)
    ordered.sliding(2).foreach { case Seq((_, _, kept, _), (_, nIn, _, _)) =>
      assert(kept == nIn, "stage output must be the next stage's input")
    }
    ordered.foreach { case (_, nIn, kept, dropped) =>
      assert(nIn == kept + dropped && kept >= 0 && dropped >= 0)
    }
    assert(ordered.head._2 == Tables.documents(spark, sf).count())
    // the pipeline must actually filter: dedup and quality both drop on
    // the gate corpus (cascade stage-1/2 dups and lq docs exist at sf)
    assert(acct("dedup_cascade")._4 > 0, "cascade dropped nothing")
    assert(acct("quality_lr")._4 > 0, "quality filter dropped nothing")
    assert(acct("normalize")._4 == 0 && acct("shard")._4 == 0)
  }

  test("each stage's drop count reconciles with its solo core on the staged input") {
    import spark.implicits._
    val stages = ops.CurationPipeline.stageSurvivors(spark, sf).toMap
    val norm = stages("normalize")
    // dedup: the cascade on the normalized text
    val cascadeDrops = ops.DedupCascade.dedupCascadeOn(
        norm.select($"doc_id", $"text", $"lang"),
        ops.SemanticDedup.assignedCells(spark, sf))
      .filter(!$"kept").count()
    assert(cascadeDrops == acct("dedup_cascade")._4)
    // quality: LR trained on the deduped survivors scores them the same
    val survDedup = stages("dedup_cascade")
    val (w, _) = ops.QualityTrain.train(
      ops.QualityTrain.featurized(survDedup), ops.QualityTrain.defaultIters)
    assert(ops.QualityTrain.scoreLrOn(survDedup, w)
      .filter($"label" === "lq").count() == acct("quality_lr")._4)
    // decontaminate: the 8-gram screen on the quality survivors
    assert(ops.CorpusOps.decontaminateNgramOn(stages("quality_lr"))
      .filter($"verdict" === "drop_contaminated").count() == acct("decontaminate")._4)
    // domain mix: thresholds recomputed on the post-filter corpus
    val survDecon = stages("decontaminate")
    val mixKept = survDecon
      .withColumn("bucket", ops.CorpusOps.domainMixBucket($"doc_id"))
      .join(broadcast(ops.CorpusOps.domainMixThresholds(survDecon)), Seq("source"))
      .filter($"bucket" < $"threshold").count()
    assert(mixKept == acct("domain_mix")._3)
    // normalized bytes are what reaches the dedup stage: the staged text
    // column is exactly the solo core's norm_text for every doc (the
    // fixture corpus may normalize to itself — the claim is the
    // plumbing, not that the corpus is dirty)
    val mismatched = norm.as("n")
      .join(ops.CorpusOps.textNormalizeOn(
          Tables.documents(spark, sf).select($"doc_id", $"text"))
        .select($"doc_id", $"norm_text"), Seq("doc_id"))
      .filter($"text" =!= $"norm_text").count()
    assert(mismatched == 0, "staged text must be the solo core's normalized output")
  }

  test("end-to-end determinism: a second run reproduces the accounting exactly") {
    val again = ops.CurationPipeline.curationPipeline(spark, sf)
      .collect().map(_.toSeq).toSeq
    val first = ops.CurationPipeline.stageNames.map { n =>
      val (o, nIn, kept, dropped) = acct(n)
      Seq(o, n, nIn, kept, dropped)
    }
    assert(again == first)
  }
}
