package graft

import org.apache.spark.sql.functions._

/** The dedup cascade: stage agreement with the standalone operators,
  * monotone survivor sets, a planted three-stage fixture, and verdict
  * consistency on the real corpus.
  */
class CascadeSpec extends SparkSuite {

  test("cascade verdicts: one row per doc; stage 1 == canonical reference; stages 1-2 drop") {
    import spark.implicits._
    val out = ops.DedupCascade.dedupCascade(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    val nDocs = Tables.documents(spark, sf).count()
    assert(out.length == nDocs, "exactly one verdict per document")
    // verdict consistency: kept ⇔ stage 0 ⇔ keeper is self
    out.foreach { case (id, stage, keeper, kept) =>
      assert(kept == (stage == 0L))
      if (kept) assert(keeper == id) else assert(keeper != id, s"doc $id dropped by itself")
    }
    // stage 1 drops are EXACTLY the canonical-form exact groups, checked
    // against a driver-side reference (sorted distinct word set → min id)
    val s1 = out.filter(_._2 == 1L).map(r => (r._1, r._3)).toSet
    val ref = Tables.documents(spark, sf)
      .select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0),
        r.getString(1).toLowerCase.trim.split("\\s+").filter(_.nonEmpty)
          .distinct.sorted.mkString(" ")))
      .groupBy(_._2).values
      .filter(_.size > 1)
      .flatMap { g => val k = g.map(_._1).min; g.map(_._1).filter(_ != k).map(_ -> k) }
      .toSet
    assert(s1 == ref, s"cascade stage 1 diverges from the canonical reference")
    // lexical stages are non-vacuous on the gate corpus; stage 3's
    // marginal catch is empty there by construction (every cos ≥ 0.4 pair
    // is also a lexical near-dup) — the planted test below exercises it
    Seq(1L, 2L).foreach { s =>
      assert(out.exists(_._2 == s), s"stage $s dropped nothing — vacuous fixture")
    }
    assert(out.exists(_._4), "no survivors")
  }

  test("planted fixture: each stage catches exactly its own kind") {
    import spark.implicits._
    // 1,2: canonical-identical (word order) → stage 1 drops 2
    // 3,4: 19-of-20 shared tokens → MinHash stage 2 drops 4
    // 5,6: lexically DISJOINT but embedding-identical → stage 3 drops 6
    // 7: unrelated survivor
    val t20 = (1 to 20).map(i => s"tok$i").mkString(" ")
    val t19 = ((1 to 19).map(i => s"tok$i") :+ "novel").mkString(" ")
    val docs = Seq(
      (1L, "alpha beta gamma", "en"), (2L, "gamma beta alpha", "en"),
      (3L, t20, "en"), (4L, t19, "en"),
      (5L, "solar panels power the future grid", "en"),
      (6L, "photovoltaic cells energize tomorrow networks", "en"),
      (7L, "an entirely unrelated survivor document", "en"))
      .toDF("doc_id", "text", "lang")
    // one axis per doc (pairwise cosine 0), except 5 and 6 share an axis
    def axis(i: Int, mag: Long) = Array.tabulate(8)(d => if (d == i) mag else 0L)
    val other = Seq(
      1L -> axis(0, 5), 2L -> axis(1, 5), 3L -> axis(2, 5),
      4L -> axis(3, 5), 5L -> axis(5, 9), 6L -> axis(5, 7), 7L -> axis(4, 5))
    val assigned = other.map { case (id, v) =>
      (0L, id, v, v.map(x => x * x).sum) // one cell: candidate generation not under test
    }.toDF("cell", "vec_id", "v", "nrm")
    val out = ops.DedupCascade.dedupCascadeOn(docs, assigned)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    assert(out == List(
      (1L, 0L, 1L), (2L, 1L, 1L), (3L, 0L, 3L), (4L, 2L, 3L),
      (5L, 0L, 5L), (6L, 3L, 5L), (7L, 0L, 7L)), s"got $out")
  }

  test("stage drop sets are disjoint; near-dup keepers survived earlier stages") {
    import spark.implicits._
    val out = ops.DedupCascade.dedupCascade(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byStage = out.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert((byStage.getOrElse(1L, Set()) & byStage.getOrElse(2L, Set())).isEmpty)
    assert((byStage.getOrElse(2L, Set()) & byStage.getOrElse(3L, Set())).isEmpty)
    assert((byStage.getOrElse(1L, Set()) & byStage.getOrElse(3L, Set())).isEmpty)
    val s2keepers = ops.DedupCascade.dedupCascade(spark, sf)
      .filter($"stage" === 2L).select($"keeper_doc_id")
      .collect().map(_.getLong(0)).toSet
    assert((s2keepers & byStage.getOrElse(1L, Set())).isEmpty,
      "a near-dup keeper was itself exact-dropped")
  }
}
