package graft

/** Flesch–Kincaid readability: hand-computed counts on planted
  * punctuated texts (the corpus texts carry no sentence terminators, so
  * that axis lives here), run-counting edge cases, and corpus-entry
  * invariants.
  */
class ReadabilitySpec extends SparkSuite {

  private def score(texts: Seq[String]) = {
    import spark.implicits._
    ops.LlmQueries.textReadabilityOn(
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text"))
      .collect()
  }

  test("hand-computed FK on a punctuated text") {
    // words 6, vowel-group runs: the/cat/the/dog/a/bird -> 6,
    // terminator runs 3 -> wps 2, spw 1
    val r = score(Seq("the cat. the dog! a bird?")).head
    assert(r.getAs[Long]("n_words") == 6L)
    assert(r.getAs[Long]("n_syllables") == 6L)
    assert(r.getAs[Long]("n_sentences") == 3L)
    assert(r.getAs[Double]("words_per_sentence") == 2.0)
    assert(r.getAs[Double]("syllables_per_word") == 1.0)
    assert(r.getAs[Double]("fk_grade") == 0.39 * 2.0 + 11.8 * 1.0 - 15.59)
    assert(r.getAs[Boolean]("readable"))
  }

  test("terminator RUNS count once; a text without terminators floors at 1") {
    // "wow... ok!?" -> runs "..." and "!?" -> 2 sentences; vowel groups:
    // wow -> o, ok -> o -> 2
    val rows = score(Seq("wow... ok!?", "no stop here at all"))
    assert(rows(0).getAs[Long]("n_sentences") == 2L)
    assert(rows(0).getAs[Long]("n_syllables") == 2L)
    assert(rows(1).getAs[Long]("n_sentences") == 1L)
  }

  test("adjacent vowels are one syllable run, split vowels are two") {
    // "beau" -> 'eau' one run; "idea" -> 'i','ea' two runs... and 'y'
    // counts as a vowel: "rhythm" -> one run
    val rows = score(Seq("beau", "idea", "rhythm"))
    assert(rows(0).getAs[Long]("n_syllables") == 1L)
    assert(rows(1).getAs[Long]("n_syllables") == 2L)
    assert(rows(2).getAs[Long]("n_syllables") == 1L)
  }

  test("corpus entry: every doc scored, syllable counts positive, grade finite") {
    val rows = ops.LlmQueries.textReadability(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_sentences") >= 1L)
      assert(r.getAs[Long]("n_syllables") >= 0L)
      if (!r.isNullAt(r.fieldIndex("fk_grade")))
        assert(!r.getAs[Double]("fk_grade").isNaN)
    }
  }

  private def ttr(texts: Seq[String]) = {
    import spark.implicits._
    ops.LlmQueries.ttrOn(
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text"))
      .collect()
  }

  test("ttr: hand-computed types/tokens/hapax; repetition is caught") {
    // "a b a c a b": tokens 6, types 3 (a,b,c), hapax 1 (c)
    val r = ttr(Seq("a b a c a b")).head
    assert(r.getAs[Long]("n_tokens") == 6L)
    assert(r.getAs[Long]("n_types") == 3L)
    assert(r.getAs[Long]("n_hapax") == 1L)
    assert(r.getAs[Double]("ttr") == 0.5)
    assert(r.getAs[Double]("hapax_ratio") == 1.0 / 3.0)
    // templated cycling vs fresh prose of the same length
    val Seq(cycled, fresh) =
      ttr(Seq(Seq.fill(50)("lorem ipsum").mkString(" "),
        (1 to 100).map(i => s"w$i").mkString(" "))).toSeq
    assert(cycled.getAs[Double]("ttr") == 0.02)
    assert(fresh.getAs[Double]("ttr") == 1.0 &&
      fresh.getAs[Double]("hapax_ratio") == 1.0)
  }

  test("ttr corpus entry: ratios bounded, hapax <= types <= tokens") {
    val rows = ops.LlmQueries.textTtr(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (tok, typ, hap) = (r.getAs[Long]("n_tokens"),
        r.getAs[Long]("n_types"), r.getAs[Long]("n_hapax"))
      assert(hap <= typ && typ <= tok && typ >= 1L)
      assert(r.getAs[Double]("ttr") > 0.0 && r.getAs[Double]("ttr") <= 1.0)
    }
  }
}
