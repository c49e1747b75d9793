package graft

/** Invariant specs for the behavioral-analytics surface (funnel, cohort
  * retention) and the declarative retry-quarantine lattice. Value-level
  * correctness is the driver's DuckDB gate; these pin the Spark-side
  * shape invariants and that every output branch is non-vacuous on the
  * test corpus.
  */
class BehaviorSpec extends SparkSuite {

  test("gap-fill: planted holes land on the grid with zero counts and carried values") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(day: Int) = Timestamp.valueOf(f"2024-03-$day%02d 10:00:00")
    // user 1: days 1, 2, 5 — days 3 and 4 are gaps carrying day-2's value;
    // user 2: a single day — a 1-row grid, no gaps
    val ev = Seq(
      (1L, ts(1), 10.0), (1L, ts(2), 7.5), (1L, ts(2), 2.5), (1L, ts(5), 3.0),
      (2L, ts(9), 42.0)
    ).toDF("user_id", "ts", "value")
    val rows = core.BehaviorQueries.eventsGapfillFfillOn(ev).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("day")) ->
        (r.getAs[Long]("n_events"), r.getAs[Int]("is_gap"), r.getAs[Double]("ffill_value")))
      .toMap
    assert(rows.size == 6, s"grid must be Σ spans = 5 + 1 rows, got ${rows.size}")
    assert(rows((1L, "2024-03-01")) == ((1L, 0, 10.0)))
    assert(rows((1L, "2024-03-02")) == ((2L, 0, 10.0))) // two events, exact decimal sum
    assert(rows((1L, "2024-03-03")) == ((0L, 1, 10.0))) // gap: count 0, value carried
    assert(rows((1L, "2024-03-04")) == ((0L, 1, 10.0)))
    assert(rows((1L, "2024-03-05")) == ((1L, 0, 3.0)))  // observation resets the carry
    assert(rows((2L, "2024-03-09")) == ((1L, 0, 42.0)))
    // corpus non-vacuity: the gate corpus has real quiet days to fill
    val corpus = core.BehaviorQueries.eventsGapfillFfill(spark, sf).collect()
    assert(corpus.exists(_.getAs[Int]("is_gap") == 1), "corpus produced no gaps")
    assert(corpus.forall(r => r.getAs[Long]("n_events") > 0 || r.getAs[Int]("is_gap") == 1))
  }

  test("funnel: windowed ordered steps shrink monotonically, all populated") {
    val rows = core.BehaviorQueries.eventsFunnel(spark, sf).collect()
    assert(rows.length == 3)
    val byStep = rows.map(r => r.getAs[Int]("step") -> r.getAs[Long]("n_users")).toMap
    assert(byStep(1) >= byStep(2) && byStep(2) >= byStep(3))
    assert(byStep(3) >= 1, "purchase step must be non-vacuous")
    assert(byStep(2) < byStep(1), "the 24h window must create real drop-off")
    rows.foreach { r =>
      val pct = r.getAs[Double]("pct_of_first")
      assert(pct > 0.0 && pct <= 1.0)
    }
  }

  test("funnel generalizes: 4-step synthetic chain with hand-checked counts and names") {
    import spark.implicits._
    val w = 86400L
    // u1 completes a→b→c→d in order; u2 stops after c; u3's b precedes its
    // a (strict order: doesn't count, and no later b exists); u4's b falls
    // outside the 24h window of its a
    val ev = Seq(
      (1L, "a", 0L), (1L, "b", 100L), (1L, "c", 200L), (1L, "d", 300L),
      (2L, "a", 0L), (2L, "b", 100L), (2L, "c", 200L),
      (3L, "b", 0L), (3L, "a", 100L),
      (4L, "a", 0L), (4L, "b", w + 1L)
    ).toDF("user_id", "event_type", "ts_sec")
    val rows = core.BehaviorQueries.eventsFunnelOn(ev, Seq("a", "b", "c", "d")).collect()
    assert(rows.length == 4)
    assert(rows.map(_.getAs[String]("step_name")).toSeq ==
      Seq("a", "b_after_a", "c_after_b", "d_after_c"))
    assert(rows.map(_.getAs[Long]("n_users")).toSeq == Seq(4L, 2L, 2L, 1L))
    assert(rows.map(_.getAs[Double]("pct_of_first")).toSeq ==
      Seq(1.0, 0.5, 0.5, 0.25))
    // the 3-step §2 instantiation is literally the same fold
    val fixed = core.BehaviorQueries.eventsFunnel(spark, sf).collect()
    assert(fixed.map(_.getAs[String]("step_name")).toSeq ==
      Seq("view", "click_after_view", "purchase_after_click"))
    // step names are DATA, not SQL text: a quoted/injected name flows
    // through the typed-Column unpivot verbatim (the old selectExpr stack
    // interpolation threw a parse error here)
    val quoted = core.BehaviorQueries.eventsFunnelOn(
      ev.withColumn("event_type",
        org.apache.spark.sql.functions.concat(
          org.apache.spark.sql.functions.lit("it's "), $"event_type")),
      Seq("it's a", "it's b")).collect()
    assert(quoted.map(_.getAs[String]("step_name")).toSeq ==
      Seq("it's a", "it's b_after_it's a"))
    assert(quoted.head.getAs[Long]("n_users") == 4L)
  }

  test("peak concurrency: equals a driver sweep of the same session bounds") {
    import spark.implicits._
    val sessions = core.CoreQueries.sessionizeEvents(spark, sf)
      .select($"session_start_sec", $"session_end_sec").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // driver reference: per epoch-day sweep over clamped boundaries
    val perDay = sessions.flatMap { case (s0, s1) =>
      (s0 / 86400 to s1 / 86400).map(d =>
        (d, math.max(s0, d * 86400), math.min(s1, d * 86400 + 86399)))
    }
    val want = perDay.groupBy(_._1).map { case (d, ss) =>
      val pts = ss.flatMap { case (_, lo, hi) => Seq((lo, 1L), (hi + 1, -1L)) }
        .sortBy { case (t, delta) => (t, delta) }
      var cur = 0L; var peak = 0L
      pts.foreach { case (_, delta) => cur += delta; peak = math.max(peak, cur) }
      d -> (ss.length.toLong, peak)
    }
    val got = core.BehaviorQueries.eventsPeakConcurrency(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == want, "distributed sweep must equal the driver reference")
    assert(got.values.exists(_._2 > 1L), "overlapping sessions non-vacuous")
    got.values.foreach { case (n, p) => assert(p >= 1L && p <= n) }
  }

  test("cohort retention: offset 0 retains the full cohort, counts bounded") {
    val rows = core.BehaviorQueries.userRetentionCohort(spark, sf).collect()
    assert(rows.nonEmpty)
    val day0 = rows.filter(_.getAs[Int]("day_offset") == 0)
    assert(day0.nonEmpty)
    // by construction every user is active on their own first day
    day0.foreach { r =>
      assert(r.getAs[Long]("n_users") == r.getAs[Long]("cohort_size"),
        s"cohort ${r.getAs[String]("cohort_day")} incomplete at offset 0")
    }
    rows.foreach { r =>
      assert(r.getAs[Long]("n_users") <= r.getAs[Long]("cohort_size"))
      assert(r.getAs[Int]("day_offset") >= 0)
      assert(r.getAs[Double]("retention_pct") <= 1.0)
    }
    // retention must decay somewhere (a flat 100% matrix would be vacuous)
    assert(rows.exists(_.getAs[Double]("retention_pct") < 1.0))
  }

  test("listening streaks: one row per user, length consistent with bounds") {
    val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd")
    val rows = core.BehaviorQueries.listeningStreaks(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("user_id")).distinct.length == rows.length)
    rows.foreach { r =>
      val s = java.time.LocalDate.parse(r.getAs[String]("streak_start"), fmt)
      val e = java.time.LocalDate.parse(r.getAs[String]("streak_end"), fmt)
      assert(!e.isBefore(s))
      // a streak of consecutive days spans exactly its length
      assert(java.time.temporal.ChronoUnit.DAYS.between(s, e) + 1 ==
        r.getAs[Long]("streak_days"))
    }
  }

  test("anomaly detection: z-scores centered per type, verdict consistent") {
    val rows = core.BehaviorQueries.eventsAnomaly(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (t, rs) =>
      val zs = rs.map(_.getAs[Double]("z_score"))
      assert(math.abs(zs.sum / zs.length) < 1e-9, s"$t z-scores not centered")
    }
    rows.foreach { r =>
      val expected = if (math.abs(r.getAs[Double]("z_score")) > 2.0) "anomaly" else "normal"
      assert(r.getAs[String]("verdict") == expected)
    }
  }

  test("dau/wau: weekly actives dominate daily, stickiness in (0, 1]") {
    val rows = core.BehaviorQueries.eventsDauWau(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (dau, wau) = (r.getAs[Long]("dau"), r.getAs[Long]("wau"))
      assert(dau >= 1 && wau >= dau,
        s"${r.getAs[String]("day")}: wau $wau must include every daily active ($dau)")
      val s = r.getAs[Double]("stickiness")
      assert(s > 0.0 && s <= 1.0)
    }
    // the trailing window must actually widen somewhere (wau > dau), or
    // the ×7 expansion is vacuous
    assert(rows.exists(r => r.getAs[Long]("wau") > r.getAs[Long]("dau")))
  }

  test("retry quarantine: both outcomes occur, attempts within the budget") {
    val rows = etl.EtlQueries.retryQuarantine(spark, sf).collect()
    assert(rows.nonEmpty)
    val byStatus = rows.groupBy(_.getAs[String]("status")).view.mapValues(_.length).toMap
    assert(byStatus.getOrElse("loaded", 0) > 0, "no item ever loads")
    assert(byStatus.getOrElse("quarantined", 0) > 0,
      "retry exhaustion never happens — quarantine branch vacuous")
    rows.foreach { r =>
      val a = r.getAs[Long]("attempts_used")
      assert(a >= 1 && a <= 3)
      // a first-attempt quarantine is impossible: quarantined == 3 attempts
      if (r.getAs[String]("status") == "quarantined") assert(a == 3)
    }
  }

  test("bitmap retention: equals the naive distinct-day pair count per lag") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // synthetic: u1 active days 100,101,103; u2 active 100 only (twice —
    // distinctness inside the mask); u3 active 30 (73 days before the
    // frontier 103 — outside the 63-day window) and 103
    val ev = Seq(
      (1L, 100L), (1L, 101L), (1L, 103L),
      (2L, 100L), (2L, 100L),
      (3L, 30L), (3L, 103L)
    ).toDF("user_id", "day_num")
    val got = core.BehaviorQueries.retentionBitmapOn(ev)
      .collect().map(r => r.getAs[Int]("lag") ->
        (r.getAs[Long]("n_copresent_user_days"), r.getAs[Long]("n_users_retained"))).toMap
    assert(got.size == 62)
    // lag 1: u1 (100,101); lag 2: u1 (101,103); lag 3: u1 (100,103)
    assert(got(1) == (1L, 1L) && got(2) == (1L, 1L) && got(3) == (1L, 1L))
    assert((4 to 62).forall(k => got(k) == (0L, 0L)),
      "u3's day 30 is outside the 63-day window and must not pair with 103")

    // corpus: the bitmap answer must equal a naive distinct-day self-join
    val corpus = Tables.events(spark, sf)
      .select(col("user_id"), expr("unix_timestamp(ts) div 86400").as("day_num"))
    val frontier = corpus.agg(max("day_num")).head.getLong(0)
    val days = corpus.filter(col("day_num") >= frontier - 62)
      .select("user_id", "day_num").distinct()
    val naive = days.as("a").join(days.as("b"), Seq("user_id"))
      .withColumn("lag", (col("b.day_num") - col("a.day_num")).cast("int"))
      .filter(col("lag") >= 1)
      .groupBy("lag")
      .agg(count(lit(1)).as("pairs"), countDistinct("user_id").as("users"))
      .collect().map(r => r.getAs[Int]("lag") ->
        (r.getAs[Long]("pairs"), r.getAs[Long]("users"))).toMap
    val bm = core.BehaviorQueries.eventsRetentionBitmap(spark, sf)
      .collect().map(r => r.getAs[Int]("lag") ->
        (r.getAs[Long]("n_copresent_user_days"), r.getAs[Long]("n_users_retained"))).toMap
    (1 to 62).foreach { k =>
      assert(bm(k) == naive.getOrElse(k, (0L, 0L)),
        s"lag $k: bitmap ${bm(k)} != naive ${naive.getOrElse(k, (0L, 0L))}")
    }
    assert(bm.values.exists(_._1 > 0L), "corpus co-presence non-vacuous")
  }
}
