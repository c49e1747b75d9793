package graft

import org.apache.spark.sql.functions._

/** Label-propagation communities: planted-clique convergence with a
  * bridge the mode vote must reject, isolated nodes keep their own
  * label, communities refine the CC clusters, and re-runs are
  * bit-identical (the synchronous total-order variant's whole point).
  */
class CommunitySpec extends SparkSuite {

  private def lp(edgePairs: Seq[(Long, Long)], nodeIds: Seq[Long], rounds: Int) = {
    import spark.implicits._
    val und = edgePairs.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val edges = und.toDF("src", "dst")
    val nodes = nodeIds.toDF("vec_id")
    ops.KnnCommunity.lpCommunities(edges, nodes, rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("two planted cliques joined by one bridge stay separate communities") {
    // cliques {1,2,3,4} and {10,11,12,13}, bridge 4–10: CC would merge
    // them; each side's internal mode out-votes the single bridge edge
    val c1 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val c2 = for (a <- 10L to 13L; b <- (a + 1) to 13L) yield (a, b)
    val got = lp(c1 ++ c2 :+ ((4L, 10L)), (1L to 4L) ++ (10L to 13L), rounds = 5)
    assert(got.filter(_._1 <= 4L).values.toSet.size == 1, "clique 1 must converge to one label")
    assert(got.filter(_._1 >= 10L).values.toSet.size == 1, "clique 2 must converge to one label")
    assert(got(1L) != got(10L), "the bridge must not merge the cliques")
  }

  test("isolated nodes keep their own label") {
    val got = lp(Seq((1L, 2L)), Seq(1L, 2L, 99L), rounds = 3)
    assert(got(99L) == 99L)
    assert(got(1L) == got(2L), "a connected pair converges to the min label")
    assert(got(1L) == 1L)
  }

  test("gate-corpus communities refine the CC clusters and re-run identically") {
    import spark.implicits._
    val comm = ops.KnnCommunity.knnGraphCommunities(spark, sf)
    val rows = comm.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    // sizes consistent with membership
    val byComm = rows.groupBy(_._2)
    byComm.foreach { case (_, ms) => assert(ms.forall(_._3 == ms.length.toLong)) }
    // refinement: every LP community lives inside exactly one CC cluster
    val cc = ops.KnnGraph.knnGraphClusters(spark, sf)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cluster")).toMap
    byComm.foreach { case (c, ms) =>
      assert(ms.map(m => cc(m._1)).toSet.size == 1,
        s"community $c spans multiple CC clusters — LP crossed a component boundary")
    }
    // determinism
    val again = ops.KnnCommunity.knnGraphCommunities(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq == again.toSeq)
  }
}
