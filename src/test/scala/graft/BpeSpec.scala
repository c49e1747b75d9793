package graft

/** BPE merge learning: hand-checked merges on the classic corpus, the
  * non-increasing best-pair-count invariant, and the real-corpus run.
  */
class BpeSpec extends SparkSuite {

  test("BPE learns the hand-checkable merges on the classic corpus") {
    import spark.implicits._
    // Sennrich-style example: {low×5, lower×2, newest×6, widest×3}
    val words = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).toDF("word")
    val merges = ops.BpeTrain.bpeTrainMergesOn(words, k = 4)
      .collect()
      .map(r => (r.getAs[Int]("round"), r.getAs[String]("left"),
        r.getAs[String]("right"), r.getAs[String]("merged"), r.getAs[Long]("pair_count")))
      .sortBy(_._1).toSeq
    // hand-derived: e+s (9 = newest 6 + widest 3; ties with s+t broken by
    // left), then es+t (9), then l+o (7, tie with o+w), then lo+w (7)
    assert(merges == Seq(
      (1, "e", "s", "es", 9L),
      (2, "es", "t", "est", 9L),
      (3, "l", "o", "lo", 7L),
      (4, "lo", "w", "low", 7L)), merges)
  }

  test("greedy apply is non-overlapping: aaa under (a,a) -> [aa, a]") {
    import spark.implicits._
    // one word "aaaa" x3 and "aaa" x2: pair (a,a) counts 3·3 + 2·2 = 13
    // (positions, not non-overlapping occurrences — BPE counts adjacent
    // positions); after merging, "aaa" must become [aa, a], not [aa, aa]
    val words = (Seq.fill(3)("aaaa") ++ Seq.fill(2)("aaa")).toDF("word")
    val m = ops.BpeTrain.bpeTrainMergesOn(words, k = 2).collect()
      .map(r => (r.getAs[Int]("round"), r.getAs[String]("merged"), r.getAs[Long]("pair_count")))
      .sortBy(_._1).toSeq
    // round 1: (a,a) at 13. round 2: forms are [aa,aa]×3 and [aa,a]×2 →
    // (aa,aa)=3 vs (aa,a)=2 → aaaa wins; [aa,a] proves no overlap happened
    assert(m == Seq((1, "aa", 13L), (2, "aaaa", 3L)), m)
  }

  test("BPE on the documents corpus: k rounds, deterministic, counts sane") {
    val merges = ops.BpeTrain.bpeTrainMerges(spark, sf).collect()
    assert(merges.length == 8)
    val counts = merges.sortBy(_.getAs[Int]("round")).map(_.getAs[Long]("pair_count"))
    assert(counts.forall(_ > 0))
    // merging can only create pairs bounded by the merged pair's count, so
    // the best count never increases round-over-round
    counts.sliding(2).foreach { case Array(a, b) => assert(b <= a, counts.toSeq) }
    merges.foreach { r =>
      assert(r.getAs[String]("merged") ==
        r.getAs[String]("left") + r.getAs[String]("right"))
    }
    // determinism: a second run learns the identical table
    val again = ops.BpeTrain.bpeTrainMerges(spark, sf).collect()
    assert(merges.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }
}
