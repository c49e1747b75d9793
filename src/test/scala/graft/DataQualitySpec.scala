package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** The data-quality gate: planted violations are counted exactly, a clean
  * corpus passes everything, and each entry scans the fact table once.
  */
class DataQualitySpec extends SparkSuite {

  private def planted() = {
    import spark.implicits._
    // (orderkey, partkey, suppkey, linenumber, quantity, flag, status)
    Seq(
      (Some(1L), 10L, 100L, 1, 5.0, "A", "O"),   // clean
      (Some(1L), 11L, 101L, 1, 5.0, "N", "F"),   // duplicate (orderkey, linenumber)
      (None: Option[Long], 12L, 102L, 2, 5.0, "R", "O"), // null orderkey
      (Some(2L), 13L, 103L, 0, 99.0, "X", "Z"),  // bad linenumber + quantity + both domains
      (Some(3L), 14L, 104L, 3, 50.0, "A", "F")   // boundary quantity: clean
    ).toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_returnflag", "l_linestatus")
  }

  test("constraints: planted violations counted exactly; gate corpus verdicts independently recounted") {
    val got = etl.DataQuality.dqConstraintsOn(planted()).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map(
      "l_orderkey_not_null" -> 1L,
      "l_linenumber_positive" -> 1L,
      "l_quantity_in_1_50" -> 1L,
      "l_returnflag_in_domain" -> 1L,
      "l_linestatus_in_domain" -> 1L,
      "pk_unique_orderkey_linenumber" -> 1L), got.toString)
    // the gate corpus: clean on every row-local check; the PK check
    // honestly REPORTS the generator's duplicate (orderkey, linenumber)
    // pairs — verified against an independent recount
    val real = etl.DataQuality.dqConstraints(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(real.size == 6)
    rowLocal.foreach { n => assert(real(n) == ((0L, true)), s"$n not clean on gate corpus") }
    val li = Tables.lineitem(spark, sf)
    val expectedDups = li.count() -
      li.select(struct(col("l_orderkey"), col("l_linenumber"))).distinct().count()
    assert(real("pk_unique_orderkey_linenumber") == ((expectedDups, expectedDups == 0L)))
  }

  private val rowLocal = Seq("l_orderkey_not_null", "l_linenumber_positive",
    "l_quantity_in_1_50", "l_returnflag_in_domain", "l_linestatus_in_domain")

  test("profile: null/distinct/min/max on the planted frame; one corpus scan per entry") {
    val p = etl.DataQuality.dqProfileOn(planted()).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))).toMap
    assert(p("l_orderkey") == ((1L, 3L, "1", "3")))       // one null, distinct {1,2,3}
    assert(p("l_returnflag") == ((0L, 4L, "A", "X")))
    assert(p("l_linenumber") == ((0L, 4L, "0", "3")))     // numeric min, not lexicographic
    // each entry's executed plan scans the lineitem parquet exactly once
    Seq(etl.DataQuality.dqProfile(spark, sf), etl.DataQuality.dqConstraints(spark, sf))
      .foreach { df =>
        df.collect()
        val scans = tools.PlanWalk.flatten(df.queryExecution.executedPlan)
          .collect { case f: FileSourceScanExec if f.toString.contains("lineitem") => f }
        assert(scans.length <= 1, s"lineitem scanned ${scans.length} times")
      }
  }

  test("freshness: a single-active-day type is reported (NULL median), not dropped") {
    import spark.implicits._
    import org.apache.spark.sql.functions.to_date
    // type "a": active days 1/3/5/7 (median gap 2, frontier day);
    // type "b": appeared ONCE on day 1 then went dark — the exact case
    // an inner median join silently dropped before round 10
    val daily = Seq(
      ("a", "2024-01-01"), ("a", "2024-01-03"), ("a", "2024-01-05"), ("a", "2024-01-07"),
      ("b", "2024-01-01"))
      .toDF("event_type", "d").select($"event_type", to_date($"d").as("day"))
    val got = etl.DataQuality.freshnessOn(daily).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got.contains("b"), "the one-day feed must appear in the report")
    val b = got("b")
    assert(b.isNullAt(b.fieldIndex("median_gap_days")), "no gap rows -> NULL median")
    assert(b.getLong(b.fieldIndex("days_behind")) == 6L)
    assert(b.getBoolean(b.fieldIndex("stale")), "6 days dark > default 3-day threshold")
    val a = got("a")
    assert(a.getLong(a.fieldIndex("median_gap_days")) == 2L)
    assert(!a.getBoolean(a.fieldIndex("stale")), "frontier type is fresh")
  }

  test("bot regularity: cv matches a driver recompute; both flag branches live") {
    import spark.implicits._
    val rows = etl.DataQuality.dqBotRegularity(spark, sf).collect()
    assert(rows.nonEmpty)
    // driver recompute from raw gaps for every user
    val ev = Tables.events(spark, sf)
      .select($"user_id", $"event_id", unix_timestamp($"ts").as("t")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = ev.groupBy(_._1).collect { case (u, rs) if rs.length >= 2 =>
      val sorted = rs.sortBy(r => (r._3, r._2))
      val gaps = sorted.sliding(2).map(p => (p(1)._3 - p(0)._3).toDouble).toSeq
      val n = gaps.length
      val m = gaps.sum / n
      val cv =
        if (n < 2) Double.NaN
        else math.sqrt(gaps.map(g => (g - m) * (g - m)).sum / (n - 1)) / m
      u -> (n.toLong, m, cv)
    }.toMap
    rows.foreach { r =>
      val u = r.getLong(0)
      val (wn, wm, wcv) = want(u)
      assert(r.getLong(1) == wn)
      assert(math.abs(r.getDouble(2) - wm) < 1e-6)
      if (!wcv.isNaN) assert(math.abs(r.getDouble(3) - wcv) < 1e-6, s"user $u cv")
      assert(r.getBoolean(4) == (wn >= 5 && r.getDouble(3) < 0.85))
    }
    val flags = rows.map(_.getBoolean(4)).toSet
    assert(flags == Set(true, false), "both branches populated on the corpus")
  }

  test("velocity screen: peaks match a driver sweep; flags at the threshold") {
    import spark.implicits._
    val purchases = Tables.events(spark, sf)
      .filter($"event_type" === "purchase")
      .select($"user_id", unix_timestamp($"ts").as("t")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val want = purchases.groupBy(_._1).map { case (u, rs) =>
      val ts = rs.map(_._2).sorted
      val peaks = ts.map(t => (ts.count(x => x > t - 86400 && x <= t).toLong, t))
      val best = peaks.maxBy { case (c, t) => (c, -t) }
      u -> best
    }
    val got = etl.DataQuality.dqVelocityScreen(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (u, (peak, at, flag)) =>
      val (wp, wt) = want(u)
      assert(peak == wp && at == wt, s"user $u peak window")
      assert(flag == (peak >= 3L))
    }
    assert(got.values.exists(_._3), "flagged users non-vacuous on the corpus")
    assert(got.values.exists(!_._3), "unflagged users non-vacuous")
  }

  test("duplicate payments: planted double-charges found exactly; clean ledger empty") {
    import spark.implicits._
    // c1: exact double-submit 2 days apart (HIT, gap 2); same amount 9 days
    // apart (no — outside window); c2: same day different amounts (no);
    // c3: triple-charge same day → all 3 pairs
    val o = Seq(
      (1L, 1L, 9999L, 10L), (2L, 1L, 9999L, 12L), (3L, 1L, 9999L, 21L),
      (4L, 2L, 5000L, 30L), (5L, 2L, 5001L, 30L),
      (6L, 3L, 777L, 50L), (7L, 3L, 777L, 50L), (8L, 3L, 777L, 50L)
    ).toDF("o_orderkey", "o_custkey", "cents", "day_num")
    val got = etl.DataQuality.duplicatePaymentsOn(o).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(got == Set(
      (1L, 1L, 2L, 9999L, 2L),
      (3L, 6L, 7L, 777L, 0L), (3L, 6L, 8L, 777L, 0L), (3L, 7L, 8L, 777L, 0L)))
    // the synthetic ledger is clean — the corpus report must be honestly empty
    assert(etl.DataQuality.dqDuplicatePayments(spark, sf).isEmpty)
  }

  test("benford: full digit dim, counts conserve, literals are a distribution") {
    import org.apache.spark.sql.functions._
    val rows = etl.DataQuality.dqBenford(spark, sf).collect()
    assert(rows.map(_.getAs[Int]("digit")).toSeq == (1 to 9), "all 9 digits, ordered")
    val nPos = Tables.orders(spark, sf)
      .filter(col("o_totalprice") > 0).count()
    assert(rows.map(_.getAs[Long]("n_obs")).sum == nPos, "every order counted once")
    assert(math.abs(rows.map(_.getAs[Double]("benford_p")).sum - 1.0) < 1e-12,
      "the hardcoded Benford literals must still be a probability distribution")
    rows.foreach { r =>
      assert(r.getAs[Double]("expected_n") > 0.0)
      assert(r.getAs[Double]("contribution") >= 0.0)
    }
    // digit extraction sanity on one hand-built frame is covered by the
    // integer-string device itself: leading digit of cents == leading
    // significant digit of the price (x100 shifts, never edits, digits)
  }
}
