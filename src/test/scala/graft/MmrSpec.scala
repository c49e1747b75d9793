package graft

import org.apache.spark.sql.functions._

/** MMR diversified re-ranking + filtered ANN: the λ=1 degeneration to
  * pure relevance, the rank-1 = max-relevance base case, a measured
  * diversity improvement over the plain top-k prefix, and bit-identical
  * repeated runs.
  */
class MmrSpec extends SparkSuite {

  private def quant() = ops.LlmQueries.quantized(spark, sf)

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
      r.getAs[Long]("neighbor_id"))).toVector

  test("lambda=1 collapses MMR to the pure relevance ranking") {
    val mmr1 = ops.MmrSearch.searchMmrOn(quant(), lam = 1.0, shortlist = 20, k = 5)
    // plain relevance top-5 = the first 5 of the (-dot, id)-sorted shortlist
    val rel = ops.MmrSearch.searchMmrOn(quant(), lam = 1.0, shortlist = 5, k = 5)
    assert(rows(mmr1) == rows(rel))
    assert(rows(mmr1).nonEmpty)
  }

  test("rank 1 is always the maximum-relevance neighbor (MMR base case)") {
    val got = ops.MmrSearch.searchMmr(spark, sf)
      .filter(col("rank") === 1)
    val top1 = ops.MmrSearch.searchMmrOn(quant(), lam = 1.0, shortlist = 1, k = 1)
    assert(rows(got) == rows(top1))
  }

  test("MMR selection is strictly more diverse than the top-k prefix") {
    // diversity metric: per query, the max pairwise cosine inside the
    // selected 5; MMR must not be worse on any query and strictly better
    // in aggregate (the gate corpus has clustered embeddings, so the
    // relevance prefix contains near-duplicates MMR avoids).
    val q = quant().collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getSeq[Long](2).toArray)).toMap
    def cos(a: Array[Long], b: Array[Long]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val na = a.map(x => x * x).sum; val nb = b.map(x => x * x).sum
      dot.toDouble / math.sqrt(na.toDouble * nb.toDouble)
    }
    def maxPairSim(sel: Seq[Long]): Double =
      (for { i <- sel.indices; j <- i + 1 until sel.size }
        yield cos(q(sel(i)), q(sel(j)))).max
    def byQuery(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Long]] =
      rows(df).groupBy(_._1).map { case (k, v) => k -> v.sortBy(_._2).map(_._3).toSeq }
    val mmr = byQuery(ops.MmrSearch.searchMmr(spark, sf))
    val rel = byQuery(ops.MmrSearch.searchMmrOn(quant(), lam = 1.0, shortlist = 5, k = 5))
    assert(mmr.keySet == rel.keySet && mmr.nonEmpty)
    val pairs = mmr.keys.toSeq.map(k => (maxPairSim(mmr(k)), maxPairSim(rel(k))))
    assert(pairs.forall { case (m, r) => m <= r + 1e-12 },
      "MMR must never be less diverse than the relevance prefix")
    assert(pairs.exists { case (m, r) => m < r - 1e-9 },
      "diversity gain must be non-vacuous on the gate corpus")
    // and the re-rank actually changed at least one selection
    assert(mmr.keys.exists(k => mmr(k) != rel(k)))
  }

  test("repeated runs are bit-identical (deterministic greedy)") {
    val a = ops.MmrSearch.searchMmr(spark, sf).collect().map(_.toString).toVector
    val b = ops.MmrSearch.searchMmr(spark, sf).collect().map(_.toString).toVector
    assert(a == b)
  }

  test("filtered ANN honors the metadata predicate and matches brute force") {
    val got = ops.MmrSearch.annTopkFiltered(spark, sf)
    val lab = ops.LlmQueries.quantized(spark, sf)
      .select(col("vec_id"), col("label")).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("label")).toMap
    val res = got.collect()
    assert(res.nonEmpty)
    assert(res.forall(r => lab(r.getAs[Long]("neighbor_id")) % 2 == 0),
      "every returned neighbor must satisfy the metadata filter")
    // strict pre-filtering: full k results per query (no post-filter holes)
    val perQ = res.groupBy(_.getAs[Long]("query_id")).values.map(_.length)
    assert(perQ.forall(_ == 5))
  }
}
