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

  test("BPE tokenize: classic-corpus merges tokenize 'lowest' to [low, est]") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val words = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).toDF("word")
    val mergeRow = ops.BpeTrain.bpeTrainMergesOn(words, k = 4)
      .agg(array_sort(collect_list(struct($"round", $"left", $"right"))).as("ms"))
      .select(transform($"ms", m =>
        struct(m.getField("left").as("left"), m.getField("right").as("right"))).as("ml"))
    val toks = Seq("lowest", "newest", "low").toDF("word")
      .crossJoin(broadcast(mergeRow))
      .select($"word", ops.BpeTrain.applyAllMerges(
        transform(sequence(lit(1), length($"word")), i => substring($"word", i, lit(1))),
        $"ml").as("tokens"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    // merges learned: es, est, lo, low — so an UNSEEN word tokenizes too
    assert(toks("lowest") == List("low", "est"), toks)
    assert(toks("newest") == List("n", "e", "w", "est"), toks)
    assert(toks("low") == List("low"), toks)
  }

  test("BPE tokenize on the documents corpus: tokens never exceed symbols") {
    val rows = ops.BpeTrain.bpeTokenize(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (s, t) = (r.getAs[Long]("n_symbols"), r.getAs[Long]("n_tokens"))
      assert(t >= r.getAs[Long]("n_words"), "a word is at least one token")
      assert(t <= s, s"merges must never grow the token count: $t > $s")
    }
    // the learned merges must actually fire somewhere
    assert(rows.exists(r => r.getAs[Long]("n_tokens") < r.getAs[Long]("n_symbols")))
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
