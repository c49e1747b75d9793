package graft

/** Containment dedup: the asymmetric relation Jaccard misses, planted and
  * pinned (the lossless-pruning claim itself is the shared DuckDB oracle's
  * job, as with dedup_jaccard_prefix).
  */
class ContainmentSpec extends SparkSuite {

  test("abstract-inside-article found at containment 1.0; Jaccard twin misses it; direction correct") {
    import spark.implicits._
    val article = (1 to 60).map(i => s"w$i").mkString(" ")
    val abstr = (1 to 10).map(i => s"w$i").mkString(" ") // ⊂ article, Jaccard 1/6
    val nearMiss = ((1 to 8).map(i => s"w$i") ++ Seq("x1", "x2")).mkString(" ") // 8/10 < 0.9
    val docs = Seq(
      (1L, article, "en"), (2L, abstr, "en"), (3L, nearMiss, "en"),
      (4L, "totally different words here entirely now", "en"))
      .toDF("doc_id", "text", "lang")
    val got = ops.ScaleDedup.dedupContainmentOn(docs)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(6))).toSeq
    assert(got == Seq((2L, 1L, 1.0)), s"got $got")
    // the symmetric twin cannot see it: jaccard = 10/60 < 0.9
    val jac = ops.ScaleDedup.dedupJaccardPrefixOn(docs).collect()
    assert(jac.isEmpty)
  }

  test("near-identical pair appears in BOTH directions; real corpus non-vacuous") {
    import spark.implicits._
    val a = (1 to 20).map(i => s"t$i").mkString(" ")
    val b = ((1 to 19).map(i => s"t$i") :+ "extra").mkString(" ")
    val docs = Seq((1L, a, "en"), (2L, b, "en")).toDF("doc_id", "text", "lang")
    val got = ops.ScaleDedup.dedupContainmentOn(docs)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 2L), (2L, 1L)), s"got $got") // 19/20 ≥ 0.9 both ways
    assert(ops.ScaleDedup.dedupContainment(spark, sf).count() > 0,
      "gate corpus exercises no containment pair")
  }

  test("keeper == per-doc argmax over the oracle-held pair table (round-10 bounded form)") {
    import spark.implicits._
    val pairs = ops.ScaleDedup.dedupContainment(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getDouble(6), r.getLong(5), r.getLong(2), r.getLong(3), r.getLong(4))))
    assert(pairs.nonEmpty)
    // best container per contained doc: containment desc, szb desc, b asc
    val want = pairs.groupBy(_._1).map { case ((lang, a), rs) =>
      val (c, szb, b, inter, sza) =
        rs.map(_._2).minBy { case (c, szb, b, _, _) => (-c, -szb, b) }
      (lang, a, b, inter, sza, szb, c)
    }.toSet
    val got = ops.ScaleDedup.dedupContainmentKeeper(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6))).toSet
    assert(got == want, "keeper must be the deterministic argmax of the pair entry")
    // bounded: exactly one row per contained doc
    assert(got.size == pairs.groupBy(_._1).size)
  }
}
