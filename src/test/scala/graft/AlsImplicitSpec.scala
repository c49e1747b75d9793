package graft

import org.apache.spark.sql.functions._

/** Implicit-feedback ALS (Hu/Koren/Volinsky): the confidence-weighted
  * objective must descend monotonically under the Gram-trick half-solves,
  * training must be bit-deterministic, the dense-term identity must hold
  * against a brute-force dense evaluation, and the serve tail must honor
  * the cohort/novelty/rank contract.
  */
class AlsImplicitSpec extends SparkSuite {

  test("HKV objective descends monotonically over alternating solves") {
    val ratings = ops.Als.ratingsOf(spark, sf).localCheckpoint()
    val objs = (1 to 3).map { iters =>
      val (u, v) = ops.Als.trainImplicit(ratings, iters)
      ops.Als.objectiveImplicit(ratings, u, v)
    }
    assert(objs.zip(objs.tail).forall { case (a, b) => b <= a + 1e-6 },
      s"implicit ALS objective must not increase across iterations: $objs")
    assert(objs.head.isFinite && objs.last > 0.0)
  }

  test("deterministic: two trainings produce identical factors") {
    val ratings = ops.Als.ratingsOf(spark, sf).localCheckpoint()
    def snap() = {
      val (u, v) = ops.Als.trainImplicit(ratings, 2)
      (u.collect().map(_.toSeq).toSet, v.collect().map(_.toSeq).toSet)
    }
    assert(snap() == snap(), "implicit ALS must be bit-deterministic (no RNG)")
  }

  test("Gram-trick objective == brute-force dense objective") {
    import spark.implicits._
    // tiny frame where the users x items grid is materializable
    val ratings = Seq((1L, 10L, 2.0), (1L, 11L, 1.0), (2L, 10L, 3.0),
      (3L, 12L, 1.0)).toDF("user_id", "item_id", "r").localCheckpoint()
    val (users, items) = ops.Als.trainImplicit(ratings, 2)
    val u = users.collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val v = items.collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val robs = ratings.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val dense = (for { (uid, (u1, u2)) <- u; (iid, (v1, v2)) <- v } yield {
      val xy = u1 * v1 + u2 * v2
      robs.get((uid, iid)) match {
        case Some(r) => (1.0 + ops.Als.alpha * r) * math.pow(1.0 - xy, 2)
        case None    => math.pow(0.0 - xy, 2)
      }
    }).sum
    val reg = ops.Als.lambda *
      (u.values.map(p => p._1 * p._1 + p._2 * p._2).sum +
        v.values.map(p => p._1 * p._1 + p._2 * p._2).sum)
    val got = ops.Als.objectiveImplicit(ratings, users, items)
    assert(math.abs(got - (dense + reg)) < 1e-9 * (1.0 + math.abs(got)),
      s"gram-trick $got vs dense ${dense + reg}")
  }

  test("serve tail: dense ranks, novelty, bounded cohort") {
    import spark.implicits._
    val rows = ops.Als.recAlsImplicit(spark, sf).collect()
    assert(rows.nonEmpty)
    val byUser = rows.groupBy(_.getAs[Long]("user_id"))
    byUser.foreach { case (uid, rs) =>
      assert(rs.map(_.getAs[Int]("rank")).sorted.toSeq == (1 to rs.length),
        s"user $uid ranks must be dense 1..k")
      assert(uid % 100 == 0, "only the evaluation cohort is served")
    }
    val listened = ops.Als.ratingsOf(spark, sf)
      .select($"user_id", $"item_id").as[(Long, Long)].collect().toSet
    rows.foreach { r =>
      assert(!listened((r.getAs[Long]("user_id"), r.getAs[Long]("rec_item_id"))),
        "recommended item must be novel")
    }
  }

  test("confidence matters: implicit and explicit models rank differently") {
    val imp = ops.Als.recAlsImplicit(spark, sf).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("rec_item_id"))).toSet
    val exp = ops.Als.recAlsTopn(spark, sf).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("rec_item_id"))).toSet
    assert(imp != exp, "the two model classes must not be the same function")
  }
}
