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

  test("MinHash-LSH holds a recall floor and the harness separates lossy from exact") {
    // measured point on this corpus: ~0.73 — the banding's collision
    // probability for pairs barely over the τ = 0.9 truth threshold is
    // well under 1, and surfacing that number is the harness's job. The
    // floor is a regression tripwire (a broken signature or banding
    // would crater it), not a quality target.
    val (_, _, r) = rows("minhash_lsh")
    assert(r >= 0.5, s"minhash recall fell below the regression floor: $r")
    assert(r < 1.0, "the lossy path must be distinguishable from the exact self-check")
  }

  test("recalls are probabilities and hits never exceed truth") {
    rows.values.foreach { case (t, h, r) =>
      assert(h <= t && r >= 0.0 && r <= 1.0)
    }
    assert(rows.keySet == Set("jaccard_prefix_keeper", "minhash_lsh", "simhash_keeper"))
  }
}
