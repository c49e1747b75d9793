package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** DEDUP QUALITY HARNESS — pair recall of every clustering dedup path
  * against the exact Jaccard ≥ 0.9 ground truth, as a first-class
  * operator (the twin of [[AnnEval.annRecallEval]] on the dedup axis:
  * the regression gate a curation pipeline runs before trusting an
  * approximate dedup with corpus deletions).
  *
  * Currency: a truth pair (a, b) counts as CAUGHT when the path's
  * cluster labels agree — label(a) == label(b) under the path's keeper
  * mapping (docs absent from a mapping are their own keeper). That
  * measures what dedup actually does with a pair (co-cluster it, so one
  * side gets dropped), not whether the pair was literally emitted, and
  * it makes keeper-shaped and pair-shaped paths commensurable.
  *
  * Self-check: `jaccard_prefix_keeper` clusters are the connected
  * components OVER the truth pairs themselves, so its recall is 1.0 by
  * construction — DedupEvalSpec pins that, the ≥ 0.85 floor for
  * MinHash-LSH (measured 1.0 after the round-10 LSH→verify→CC rebuild;
  * this harness is what caught the old keeper chase at 0.73), and
  * reports SimHash (a DIFFERENT similarity — hamming on fingerprints —
  * so its recall against the Jaccard truth is the cross-metric honesty
  * number, not a defect).
  *
  * Shape: truth pairs localCheckpoint once (three label joins probe
  * them); each path contributes two broadcast-label joins + one partial
  * agg; the final table is a union of 4 single-row frames (the fourth is
  * the containment axis — see dedupRecallEval's inline note for why its
  * currency is contained-doc coverage, not co-clustering). The heavy
  * work is the paths themselves, which at 100 TB run their own
  * banded/blocked plans.
  */
object DedupEval {

  private def labelsOf(mapping: DataFrame, docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select($"doc_id")
      .join(mapping.select($"doc_id", $"keeper_doc_id"), Seq("doc_id"), "left")
      .select($"doc_id", coalesce($"keeper_doc_id", $"doc_id").as("label"))
  }

  def dedupRecallEval(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    val truth = ScaleDedup.dedupJaccardPrefix(spark, dir)
      .select($"a", $"b").localCheckpoint()
    val totals = truth.agg(count(lit(1)).as("truth_pairs"))
    val paths: Seq[(String, DataFrame)] = Seq(
      "jaccard_prefix_keeper" -> ScaleDedup.dedupJaccardPrefixKeeper(spark, dir),
      "minhash_lsh"           -> ScaleDedup.dedupMinhashLsh(spark, dir)
        .select($"doc_id", $"keeper_doc_id"),
      "simhash_keeper"        -> ScaleDedup.dedupSimhashKeeper(spark, dir)
    )
    val perPath = paths.map { case (name, mapping) =>
      val lab = labelsOf(mapping, docs)
      truth
        .join(lab.select($"doc_id".as("a"), $"label".as("la")), Seq("a"))
        .join(lab.select($"doc_id".as("b"), $"label".as("lb")), Seq("b"))
        .agg(sum(when($"la" === $"lb", 1L).otherwise(0L)).as("hits"))
        .withColumn("path", lit(name))
        .crossJoin(broadcast(totals))
        .select($"path", $"truth_pairs", $"hits",
          ($"hits".cast("double") / $"truth_pairs".cast("double")).as("pair_recall"))
    }
    // CONTAINMENT AXIS (round 12): containment is asymmetric — not an
    // equivalence — so co-cluster labelling is the wrong currency for it.
    // The keeper's contract is "every verified CONTAINED doc is absorbed
    // into exactly one best container", so its row measures contained-doc
    // coverage against the keeper's own oracle-held pair truth: distinct
    // contained docs in dedup_containment vs docs present in the keeper
    // mapping. 1.0 by construction (the jaccard_prefix_keeper self-check
    // device on this axis) — the row's value is completeness of the
    // honesty table, spec-pinned in DedupEvalSpec.
    val cTruth = ScaleDedup.dedupContainment(spark, dir)
      .select($"a".as("doc_id")).distinct().localCheckpoint()
    val cRow = cTruth
      .join(ScaleDedup.dedupContainmentKeeper(spark, dir).select($"doc_id"),
        Seq("doc_id"), "left_semi")
      .agg(count(lit(1)).as("hits"))
      .withColumn("path", lit("containment_keeper"))
      .crossJoin(broadcast(cTruth.agg(count(lit(1)).as("truth_pairs"))))
      .select($"path", $"truth_pairs", $"hits",
        ($"hits".cast("double") / $"truth_pairs".cast("double")).as("pair_recall"))
    (perPath :+ cRow).reduce(_.unionByName(_))
      .orderBy($"path")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_recall_eval" -> (dedupRecallEval _)
  )

  val oracleSql: Map[String, String] = Map.empty
}
