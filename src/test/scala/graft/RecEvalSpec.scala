package graft

import org.apache.spark.sql.functions._

/** Temporal-split P@k/R@k: a planted future listen the CF chain must
  * predict (hit -> precision/recall 1.0 at the covered grain), the
  * no-leakage property (train-period items never count as hits), and
  * corpus-entry monotonicity invariants in k.
  */
class RecEvalSpec extends SparkSuite {

  /** listens = (user, item, day); one synthetic order per listen. */
  private def frames(rows: Seq[(Long, Long, String)]) = {
    import spark.implicits._
    val ord = rows.zipWithIndex.map { case ((u, _, d), i) =>
      (i.toLong, u, java.sql.Date.valueOf(d))
    }.toDF("o_orderkey", "o_custkey", "od")
    val li = rows.zipWithIndex.map { case ((_, it, _), i) => (i.toLong, it) }
      .toDF("l_orderkey", "l_partkey")
    (li, ord)
  }

  test("a planted future listen on a CF-predicted item is a hit") {
    // Train (2024-01-01, cutoff = jan 9 for span 10): users 1,2,3 all play
    // items 1,2; users 2,3 also play item 3. CF for user 1 votes item 3
    // with score co(1,3)+co(2,3) = 4. Test (2024-01-11): user 1 plays 3.
    val (li, ord) = frames(Seq(
      (1L, 1L, "2024-01-01"), (1L, 2L, "2024-01-01"),
      (2L, 1L, "2024-01-01"), (2L, 2L, "2024-01-01"), (2L, 3L, "2024-01-01"),
      (3L, 1L, "2024-01-01"), (3L, 2L, "2024-01-01"), (3L, 3L, "2024-01-01"),
      (1L, 3L, "2024-01-11")))
    val rows = ops.RecEval.recEvalPrkOn(li, ord).collect()
    val at1 = rows.find(_.getAs[Long]("k") == 1L).get
    assert(at1.getAs[Long]("n_test_pairs") == 1L)
    assert(at1.getAs[Long]("n_recs") == 1L, "only user 1 has a novel candidate")
    assert(at1.getAs[Long]("n_hits") == 1L)
    assert(at1.getAs[Double]("precision_at_k") == 1.0)
    assert(at1.getAs[Double]("recall_at_k") == 1.0)
  }

  test("a future REPLAY of a train-period item is not in the holdout") {
    // Same corpus, but the future listen is item 2 — user 1 already played
    // it in train, so the holdout is empty and recall is NULL.
    val (li, ord) = frames(Seq(
      (1L, 1L, "2024-01-01"), (1L, 2L, "2024-01-01"),
      (2L, 1L, "2024-01-01"), (2L, 2L, "2024-01-01"), (2L, 3L, "2024-01-01"),
      (3L, 1L, "2024-01-01"), (3L, 2L, "2024-01-01"), (3L, 3L, "2024-01-01"),
      (1L, 2L, "2024-01-11")))
    val rows = ops.RecEval.recEvalPrkOn(li, ord).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_test_pairs") == 0L)
      assert(r.getAs[Long]("n_hits") == 0L)
      assert(r.isNullAt(r.fieldIndex("recall_at_k")))
    }
  }

  test("test-period listens never leak into training co-listens") {
    // The ONLY co-listen evidence for (1,3)/(2,3) sits in the test window:
    // users 2,3 play item 3 after the cutoff. Train CF then has no path to
    // item 3, so user 1 gets no hit even though the future listen exists.
    val (li, ord) = frames(Seq(
      (1L, 1L, "2024-01-01"), (1L, 2L, "2024-01-01"),
      (2L, 1L, "2024-01-01"), (2L, 2L, "2024-01-01"),
      (3L, 1L, "2024-01-01"), (3L, 2L, "2024-01-01"),
      (2L, 3L, "2024-01-11"), (3L, 3L, "2024-01-11"), (1L, 3L, "2024-01-11")))
    val rows = ops.RecEval.recEvalPrkOn(li, ord).collect()
    rows.foreach(r => assert(r.getAs[Long]("n_hits") == 0L))
    assert(rows.find(_.getAs[Long]("k") == 1L).get.getAs[Long]("n_test_pairs") == 3L)
  }

  test("ndcg discounts re-derive from log2 (the literal-weights discipline)") {
    val want = (1 to 5).map(r => math.round(1e6 / (math.log(r + 1.0) / math.log(2.0))))
    assert(ops.RecEval.NdcgWeights == want)
    assert(ops.RecEval.NdcgPrefix == want.scanLeft(0L)(_ + _).tail)
  }

  test("a single planted hit at rank 1 with a 1-item holdout scores ndcg 1.0") {
    val (li, ord) = frames(Seq(
      (1L, 1L, "2024-01-01"), (1L, 2L, "2024-01-01"),
      (2L, 1L, "2024-01-01"), (2L, 2L, "2024-01-01"), (2L, 3L, "2024-01-01"),
      (3L, 1L, "2024-01-01"), (3L, 2L, "2024-01-01"), (3L, 3L, "2024-01-01"),
      (1L, 3L, "2024-01-11")))
    val r = ops.RecEval.recEvalNdcgOn(li, ord).collect().head
    assert(r.getAs[Long]("n_users_test") == 1L)
    assert(r.getAs[Long]("dcg_scaled") == 1000000L)
    assert(r.getAs[Long]("idcg_scaled") == 1000000L)
    assert(r.getAs[Double]("ndcg") == 1.0)
  }

  test("an empty holdout yields NULL ndcg, not a crash or a zero") {
    val (li, ord) = frames(Seq(
      (1L, 1L, "2024-01-01"), (1L, 2L, "2024-01-01"),
      (2L, 1L, "2024-01-01"), (2L, 2L, "2024-01-01"),
      (1L, 2L, "2024-01-11")))
    val r = ops.RecEval.recEvalNdcgOn(li, ord).collect().head
    assert(r.getAs[Long]("idcg_scaled") == 0L)
    assert(r.isNullAt(r.fieldIndex("ndcg")))
  }

  test("mrr weights re-derive from 1/r; planted rank-1 hit scores 1.0") {
    val want = (1 to 5).map(r => math.round(1e6 / r))
    assert(ops.RecEval.MrrWeights == want)
    val (li, ord) = frames(Seq(
      (1L, 1L, "2024-01-01"), (1L, 2L, "2024-01-01"),
      (2L, 1L, "2024-01-01"), (2L, 2L, "2024-01-01"), (2L, 3L, "2024-01-01"),
      (3L, 1L, "2024-01-01"), (3L, 2L, "2024-01-01"), (3L, 3L, "2024-01-01"),
      (1L, 3L, "2024-01-11")))
    val r = ops.RecEval.recEvalMrrOn(li, ord).collect().head
    assert(r.getAs[Long]("n_users_test") == 1L)
    assert(r.getAs[Long]("n_hit_users") == 1L)
    assert(r.getAs[Long]("rr_scaled_sum") == 1000000L)
    assert(r.getAs[Double]("mrr") == 1.0)
  }

  test("mrr: empty holdout is NULL; corpus mrr within [0,1] and <= hit share") {
    val (li, ord) = frames(Seq(
      (1L, 1L, "2024-01-01"), (1L, 2L, "2024-01-01"),
      (2L, 1L, "2024-01-01"), (2L, 2L, "2024-01-01"),
      (1L, 2L, "2024-01-11")))
    val empty = ops.RecEval.recEvalMrrOn(li, ord).collect().head
    assert(empty.isNullAt(empty.fieldIndex("mrr")))
    val c = ops.RecEval.recEvalMrr(spark, sf).collect().head
    val mrr = c.getAs[Double]("mrr")
    val hitShare = c.getAs[Long]("n_hit_users").toDouble / c.getAs[Long]("n_users_test")
    assert(mrr >= 0.0 && mrr <= hitShare + 1e-12,
      "each hit user contributes at most 1 reciprocal rank")
  }

  test("popularity baseline: the chart-topper is recommended to whoever lacks it") {
    // item 1 is the global chart-topper (3 listeners); user 4 has only
    // item 9 in train and plays item 1 in the future -> baseline hit@1.
    val (li, ord) = frames(Seq(
      (1L, 1L, "2024-01-01"), (2L, 1L, "2024-01-01"), (3L, 1L, "2024-01-01"),
      (1L, 2L, "2024-01-01"), (2L, 2L, "2024-01-01"),
      (4L, 9L, "2024-01-01"),
      (4L, 1L, "2024-01-11")))
    val rows = ops.RecEval.recEvalPrkBaselineOn(li, ord).collect()
    val at1 = rows.find(_.getAs[Long]("k") == 1L).get
    assert(at1.getAs[Long]("n_test_pairs") == 1L)
    assert(at1.getAs[Long]("n_hits") == 1L)
    assert(at1.getAs[Double]("recall_at_k") == 1.0)
  }

  test("baseline shares the holdout denominators with the CF entry") {
    val cf = ops.RecEval.recEvalPrk(spark, sf).collect()
      .map(r => r.getAs[Long]("k") -> r).toMap
    val bl = ops.RecEval.recEvalPrkBaseline(spark, sf).collect()
      .map(r => r.getAs[Long]("k") -> r).toMap
    assert(cf.keySet == bl.keySet)
    cf.keySet.foreach { k =>
      assert(cf(k).getAs[Long]("n_test_pairs") == bl(k).getAs[Long]("n_test_pairs"),
        "same holdout, same denominator")
      assert(cf(k).getAs[Long]("n_users_test") == bl(k).getAs[Long]("n_users_test"))
    }
  }

  test("corpus ndcg: one row, dcg <= idcg, ndcg in [0,1]") {
    val r = ops.RecEval.recEvalNdcg(spark, sf).collect() match {
      case Array(only) => only
      case other => fail(s"expected 1 row, got ${other.length}")
    }
    assert(r.getAs[Long]("dcg_scaled") <= r.getAs[Long]("idcg_scaled"))
    if (!r.isNullAt(r.fieldIndex("ndcg"))) {
      val n = r.getAs[Double]("ndcg")
      assert(n >= 0.0 && n <= 1.0)
    }
  }

  test("exposure gini: hand-computed Lorenz value via the histogram identity") {
    import spark.implicits._
    // catalog {1,2,3,4}; recs expose item1 x3, item2 x1; sorted c =
    // 0,0,1,3 -> G = (2*15 - 5*4) / (4*4) = 0.625
    val train = Seq((10L, 1L, 1L), (10L, 2L, 1L), (10L, 3L, 1L), (10L, 4L, 1L))
      .toDF("user_id", "item_id", "n_listens")
    val recs = Seq((10L, 1L, 1L), (11L, 1L, 2L), (12L, 1L, 3L), (12L, 2L, 1L))
      .toDF("user_id", "rec_item_id", "rank")
    val holdout = Seq.empty[(Long, Long)].toDF("user_id", "rec_item_id")
    val r = ops.RecEval.exposureGiniFrom((recs, holdout, train)).collect().head
    assert(r.getAs[Long]("n_items") == 4L)
    assert(r.getAs[Long]("n_exposed") == 2L)
    assert(r.getAs[Long]("total_exposures") == 4L)
    assert(r.getAs[Double]("gini") == 0.625)
    // no recs at all -> NULL gini, not 0 (undefined concentration)
    val empty = ops.RecEval.exposureGiniFrom(
      (recs.filter($"rank" > 99L), holdout, train)).collect().head
    assert(empty.isNullAt(empty.fieldIndex("gini")))
  }

  test("the 50-item popularity baseline concentrates harder than CF") {
    val (recs, holdout, train) = ops.RecEval.framesFor(spark, sf)
    val cf = ops.RecEval.exposureGiniFrom((recs, holdout, train)).collect().head
    val bl = ops.RecEval.exposureGiniFrom(
      (ops.RecEval.baselineRecsFrom(train), holdout, train)).collect().head
    assert(bl.getAs[Long]("n_exposed") <= 50L, "the baseline pool is 50 items")
    assert(cf.getAs[Long]("n_exposed") > bl.getAs[Long]("n_exposed"))
    assert(bl.getAs[Double]("gini") > cf.getAs[Double]("gini"),
      s"baseline ${bl.getAs[Double]("gini")} vs cf ${cf.getAs[Double]("gini")}")
    assert(cf.getAs[Double]("gini") >= 0.0 && cf.getAs[Double]("gini") < 1.0)
  }

  test("an empty orders frame degrades to NULL-metric rows, not an NPE") {
    // The calendar-cutoff scalar is NULL on an empty frame; the guard
    // pins the epoch and the tails emit their documented NULL metrics.
    val (li, ord) = frames(Seq.empty)
    val rows = ops.RecEval.recEvalPrkOn(li, ord).collect()
    assert(rows.nonEmpty, "the k-rows frame is emitted even on an empty corpus")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_hits") == 0L && r.getAs[Long]("n_recs") == 0L)
      assert(r.isNullAt(r.fieldIndex("precision_at_k")))
    }
  }

  test("corpus entry: 3 k-rows, counts monotone in k, rates in [0,1]") {
    val rows = ops.RecEval.recEvalPrk(spark, sf).collect().sortBy(_.getAs[Long]("k"))
    assert(rows.map(_.getAs[Long]("k")).toSeq == Seq(1L, 3L, 5L))
    val hits = rows.map(_.getAs[Long]("n_hits"))
    val recs = rows.map(_.getAs[Long]("n_recs"))
    assert(hits.sorted.sameElements(hits) && recs.sorted.sameElements(recs))
    rows.foreach { r =>
      assert(r.getAs[Long]("n_hits") <= r.getAs[Long]("n_recs"))
      assert(r.getAs[Long]("n_hits") <= r.getAs[Long]("n_test_pairs"))
      if (!r.isNullAt(r.fieldIndex("precision_at_k"))) {
        val p = r.getAs[Double]("precision_at_k")
        assert(p >= 0.0 && p <= 1.0)
      }
    }
  }
}
