package graft

import java.sql.Timestamp

/** Pareto-frontier skyline: the two-phase (salted-local / global) prune
  * must equal the brute-force quadratic dominance filter, both-axes ties
  * must mutually survive, months must be independent, and the corpus
  * entry's output must satisfy the frontier property exactly.
  */
class SkylineSpec extends SparkSuite {

  private val M = Timestamp.valueOf("2024-01-01 00:00:00")
  private val M2 = Timestamp.valueOf("2024-02-01 00:00:00")

  private def bruteSkyline(pts: Seq[(Long, Long)]): Set[(Long, Long)] =
    pts.filter { case (s, l) =>
      !pts.exists { case (s2, l2) =>
        s2 >= s && l2 >= l && (s2 > s || l2 > l)
      }
    }.toSet

  private def run(pts: Seq[(Timestamp, Long, Long)]): Set[(Timestamp, Long, Long)] = {
    import spark.implicits._
    mart.SkylineQueries.skylinePoints(pts.distinct.toDF("m", "s", "l"))
      .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2))).toSet
  }

  test("two-phase prune == brute force on a hand-built frame") {
    val pts = Seq[(Long, Long)](
      (10L, 1L), (9L, 5L), (8L, 5L), (5L, 7L), (5L, 5L), (1L, 9L), (3L, 8L))
    assert(run(pts.map(p => (M, p._1, p._2))).map(t => (t._2, t._3))
      == bruteSkyline(pts.distinct))
    assert(run(pts.map(p => (M, p._1, p._2))).map(t => (t._2, t._3))
      == Set((10L, 1L), (9L, 5L), (5L, 7L), (3L, 8L), (1L, 9L)))
  }

  test("a single maximal point dominates everything below it") {
    val pts = Seq[(Long, Long)]((5L, 5L), (4L, 4L), (5L, 4L), (4L, 5L), (1L, 1L))
    assert(run(pts.map(p => (M, p._1, p._2))) == Set((M, 5L, 5L)))
  }

  test("equal-s points: only the highest l survives that column") {
    val pts = Seq[(Long, Long)]((7L, 2L), (7L, 9L), (7L, 5L), (2L, 10L))
    assert(run(pts.map(p => (M, p._1, p._2)))
      == Set((M, 7L, 9L), (M, 2L, 10L)))
  }

  test("months are independent frontiers") {
    // the January maximum must not dominate February's points
    val pts = Seq((M, 100L, 100L), (M, 1L, 1L), (M2, 1L, 2L), (M2, 2L, 1L))
    assert(run(pts) == Set((M, 100L, 100L), (M2, 1L, 2L), (M2, 2L, 1L)))
  }

  test("two-phase prune == brute force on a pseudo-random cloud") {
    // deterministic LCG so the case is reproducible
    var x = 12345L
    def nxt(): Long = { x = (x * 1103515245L + 12345L) % 2147483648L; x % 1000L }
    val pts = Seq.fill(500)((nxt(), nxt()))
    assert(run(pts.map(p => (M, p._1, p._2))).map(t => (t._2, t._3))
      == bruteSkyline(pts.distinct))
  }

  test("corpus entry: output is exactly the non-dominated track set per month") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val li  = Tables.lineitem(spark, sf).select($"l_orderkey", $"l_partkey")
    val ord = Tables.orders(spark, sf)
      .select($"o_orderkey", $"o_custkey",
        date_trunc("month", $"o_orderdate").as("m"))
    val byTrack = li.join(ord, $"l_orderkey" === $"o_orderkey")
      .groupBy($"m", $"l_partkey")
      .agg(count(lit(1)).as("s"), countDistinct($"o_custkey").as("l"))
      .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val want: Set[(Timestamp, Long, Long)] = byTrack.groupBy(_._1).flatMap {
      case (m, rows) =>
        bruteSkyline(rows.map(t => (t._3, t._4)).toSeq).map(p => (m, p._1, p._2))
    }.toSet
    val got = mart.SkylineQueries.dmSkylineTracks(spark, sf).collect()
    assert(got.nonEmpty)
    val gotPts = got.map(r => (r.getAs[Timestamp]("month"),
      r.getAs[Long]("n_streams"), r.getAs[Long]("n_listeners"))).toSet
    assert(gotPts == want)
    // every track sharing a frontier point is present
    val wantTracks = byTrack
      .filter(t => want((t._1, t._3, t._4))).map(t => (t._1, t._2)).toSet
    assert(got.map(r => (r.getAs[Timestamp]("month"), r.getAs[Long]("track_id"))).toSet
      == wantTracks)
  }
}
