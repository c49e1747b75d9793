package graft

import org.apache.spark.sql.functions._

/** ALS factorization: the alternating ridge solves must descend the
  * regularized objective monotonically, the whole pipeline is
  * deterministic (no RNG anywhere), and the serve tail honors the
  * novelty contract.
  */
class AlsSpec extends SparkSuite {

  test("objective descends monotonically over alternating solves") {
    val ratings = ops.Als.ratingsOf(spark, sf).localCheckpoint()
    val objs = (1 to 3).map { iters =>
      val (u, v) = ops.Als.train(ratings, iters)
      ops.Als.objective(ratings, u, v)
    }
    assert(objs.zip(objs.tail).forall { case (a, b) => b <= a + 1e-9 },
      s"ALS objective must not increase across iterations: $objs")
    assert(objs.head.isFinite && objs.last > 0.0)
    // the model must actually have learned something: one full
    // alternation already fits far better than the magnitude of the
    // raw ratings mass (a degenerate all-zero factor model scores
    // J0 = sum r^2)
    import spark.implicits._
    val j0 = ratings.select(($"r" * $"r").as("r2")).agg(sum($"r2")).head().getDouble(0)
    assert(objs.head < j0, s"one ALS sweep must beat the zero model: ${objs.head} !< $j0")
  }

  test("deterministic: two trainings produce identical factors") {
    val ratings = ops.Als.ratingsOf(spark, sf).localCheckpoint()
    def snap() = {
      val (u, v) = ops.Als.train(ratings, 2)
      (u.collect().map(_.toSeq).toSet, v.collect().map(_.toSeq).toSet)
    }
    assert(snap() == snap(), "ALS must be bit-deterministic (no RNG)")
  }

  test("serve tail: dense ranks, novelty, bounded cohort") {
    import spark.implicits._
    val rows = ops.Als.recAlsTopn(spark, sf).collect()
    assert(rows.nonEmpty)
    val byUser = rows.groupBy(_.getAs[Long]("user_id"))
    byUser.foreach { case (u, rs) =>
      assert(rs.map(_.getAs[Int]("rank")).sorted.toSeq == (1 to rs.length),
        s"user $u ranks must be dense 1..k")
      assert(u % 100 == 0, "only the evaluation cohort is served")
    }
    // novelty: no recommended item is in the user's listen history
    val listened = ops.Recommend.listenCounts(spark, sf)
      .select($"user_id", $"item_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    rows.foreach { r =>
      assert(!listened((r.getAs[Long]("user_id"), r.getAs[Long]("rec_item_id"))),
        "recommended an already-listened item")
    }
    // scores ordered within user
    byUser.foreach { case (_, rs) =>
      val scores = rs.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("score"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
  }
}
