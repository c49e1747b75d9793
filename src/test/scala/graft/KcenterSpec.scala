package graft

import org.apache.spark.sql.functions._

/** k-center diverse sampling: exact parity with a driver-side greedy
  * reference, the non-increasing radius invariant, and better coverage
  * than a naive prefix pick.
  */
class KcenterSpec extends SparkSuite {

  private def corpus(): Array[(Long, Array[Long])] = {
    import spark.implicits._
    ops.VectorAgg.quantized(spark, sf)
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
  }

  private def d2(a: Array[Long], b: Array[Long]): Long =
    a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum

  test("distributed greedy == single-threaded reference greedy, pick for pick") {
    val vecs = corpus()
    val k = 12
    // reference: same seed rule, same (max d2, min id) argmax
    var picks = Vector(vecs.minBy(_._1))
    var trace = Vector((picks.head._1, 0L))
    (2 to k).foreach { _ =>
      val pickedIds = picks.map(_._1).toSet
      val next = vecs.filter(v => !pickedIds.contains(v._1))
        .map(v => (v, picks.map(p => d2(v._2, p._2)).min))
        .minBy { case ((id, _), d) => (-d, id) }
      picks = picks :+ next._1
      trace = trace :+ ((next._1._1, next._2))
    }
    val got = ops.Curation.sampleKcenter(spark, sf, k).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("d2_at_pick"))).toVector
    assert(got == trace, s"\ngot   $got\nwant $trace")
  }

  test("radius sequence non-increasing; greedy covers better than a prefix pick") {
    val vecs = corpus()
    val rows = ops.Curation.sampleKcenter(spark, sf, 12).collect()
    assert(rows.map(_.getAs[Int]("rank")).toSeq == (1 to 12))
    val ds = rows.sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("d2_at_pick")).drop(1)
    ds.sliding(2).foreach { case Array(a, b) => assert(b <= a, s"radius rose: $a -> $b") }
    // coverage: max over corpus of min-dist-to-picks, greedy vs first-12-ids
    def radius(ids: Set[Long]): Long = {
      val ps = vecs.filter(v => ids.contains(v._1)).map(_._2)
      vecs.filter(v => !ids.contains(v._1)).map(v => ps.map(p => d2(v._2, p)).min).max
    }
    val greedy = radius(rows.map(_.getAs[Long]("vec_id")).toSet)
    val prefix = radius(vecs.map(_._1).sorted.take(12).toSet)
    assert(greedy <= prefix, s"greedy radius $greedy vs prefix $prefix")
  }
}
