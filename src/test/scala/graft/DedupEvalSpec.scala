package graft

/** Dedup quality harness: the exact path's self-check recall is 1.0 by
  * construction, MinHash-LSH holds its banding floor, and the SimHash
  * cross-metric row is present and bounded.
  */
class DedupEvalSpec extends SparkSuite {

  private lazy val rows =
    ops.DedupEval.dedupRecallEval(spark, sf).collect()
      .map(r => r.getAs[String]("path") ->
        (r.getAs[Long]("truth_pairs"), r.getAs[Long]("hits"), r.getAs[Double]("pair_recall")))
      .toMap

  test("the harness is non-vacuous: the gate corpus has true near-dup pairs") {
    assert(rows("jaccard_prefix_keeper")._1 > 0)
  }

  test("exact-path self-check: CC over the truth pairs catches every pair") {
    val (_, _, r) = rows("jaccard_prefix_keeper")
    assert(r == 1.0, s"self-check recall must be exactly 1.0, got $r")
  }

  test("MinHash-LSH holds the round-10 recall floor") {
    // round-10 rebuild (LSH candidates → exact verify → CC over verified
    // edges) lifted the measured point from 0.73 to 1.0 on this corpus:
    // banding at 16×4 / τ = 0.9 has ~1 candidate recall (miss-all-16
    // probability ≈ 4·10⁻⁸ per truth pair), and verify+CC loses nothing
    // the candidates found. The floor is 0.85 per the round-9 verdict
    // target; probabilistic banding on another corpus may sit between
    // 0.85 and 1.0, so exact 1.0 is not asserted.
    val (_, _, r) = rows("minhash_lsh")
    assert(r >= 0.85, s"minhash recall fell below the round-10 floor: $r")
  }

  test("SimHash cross-metric row is the honesty number, not near-exact") {
    // hamming-on-fingerprints is a DIFFERENT similarity than the Jaccard
    // truth — its sub-1 recall is expected and surfacing it is the
    // harness's job; distinguishability of a cross-metric path from the
    // exact self-check keeps the harness honest
    val (_, _, r) = rows("simhash_keeper")
    assert(r > 0.0 && r < 1.0)
  }

  test("containment-axis self-check: every verified contained doc is absorbed") {
    // the keeper emits exactly one best-container row per contained doc of
    // the oracle-held pair table, so contained-doc coverage is 1.0 by
    // construction — the row completes the "every dedup path has a
    // measured number" claim on the one non-equivalence axis
    val (t, h, r) = rows("containment_keeper")
    assert(t > 0, "gate corpus must hold true containment pairs")
    assert(h == t && r == 1.0, s"containment coverage must be exactly 1.0, got $r ($h/$t)")
  }

  test("recalls are probabilities and hits never exceed truth") {
    rows.values.foreach { case (t, h, r) =>
      assert(h <= t && r >= 0.0 && r <= 1.0)
    }
    assert(rows.keySet == Set(
      "jaccard_prefix_keeper", "minhash_lsh", "simhash_keeper", "containment_keeper"))
  }
}
