package graft

import org.apache.spark.sql.functions._

/** Kaplan–Meier curve pinned against a driver-side reference of the same
  * subject table, plus shape invariants.
  */
class SurvivalSpec extends SparkSuite {

  test("km curve equals driver reference to 1e-9; steps monotone; risk set shrinks") {
    import spark.implicits._
    val ev = Tables.events(spark, sf)
      .select($"user_id", unix_timestamp($"ts").as("ts_sec"), $"event_type")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val maxTs = ev.map(_._2).max
    // driver subjects: first signup, first later purchase, censor at frontier
    val byUser = ev.groupBy(_._1)
    val subjects = byUser.flatMap { case (_, rows) =>
      val signups = rows.filter(_._3 == "signup").map(_._2)
      if (signups.isEmpty) None
      else {
        val s = signups.min
        val p = rows.filter(r => r._3 == "purchase" && r._2 > s).map(_._2)
        if (p.nonEmpty) Some((p.min - s, true)) else Some((maxTs - s, false))
      }
    }.toSeq
    val nTotal = subjects.length
    val deathTimes = subjects.filter(_._2).groupBy(_._1).view
      .mapValues(_.size.toLong).toSeq.sortBy(_._1)
    var surv = 1.0
    val want = deathTimes.map { case (t, d) =>
      val atRisk = subjects.count(_._1 >= t).toLong
      surv *= 1.0 - d.toDouble / atRisk
      (t, atRisk, d, surv)
    }
    val got = core.BehaviorQueries.eventsSurvivalKm(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.length == want.length && got.nonEmpty)
    got.zip(want).foreach { case ((gt, gn, gd, gs), (wt, wn, wd, ws)) =>
      assert(gt == wt && gn == wn && gd == wd)
      assert(math.abs(gs - ws) < 1e-9, s"survival at t=$gt")
    }
    val survs = got.map(_._4)
    assert(survs.zip(survs.tail).forall { case (a, b) => b <= a + 1e-12 }, "monotone")
    assert(got.head._2 <= nTotal && survs.head < 1.0 + 1e-12)
    // with complete follow-up (no censoring) the curve must terminate at 0;
    // with censoring the tail stays positive — either way the terminal value
    // is pinned by the censoring census
    if (subjects.forall(_._2)) assert(survs.last == 0.0)
    else assert(survs.last > 0.0)
  }
}
