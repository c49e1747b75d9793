package graft

import org.apache.spark.sql.Row

/** Mann–Whitney U: hand-computed rank sums on tiny pooled frames (with
  * and without ties), the U_a + U_b = n_a·n_b identity, degenerate-edge
  * NULLs, and the location-shift detection property the test exists for.
  */
class RankTestsSpec extends SparkSuite {

  private def ev(rows: Seq[(String, Int, Long)]) = {
    import spark.implicits._
    rows.toDF("event_type", "arm", "y_c")
  }

  private def mw(rows: Seq[(String, Int, Long)]): Row =
    core.RankTests.mannWhitneyOn(ev(rows)).collect().head

  test("no ties: hand-computed U, variance, z") {
    // A = {1,2}, B = {3,4}: R_a = 3, U_a = 0, U_b = 4
    val row = mw(Seq(("a", 0, 1L), ("a", 0, 2L), ("a", 1, 3L), ("a", 1, 4L)))
    assert(row.getAs[Long]("n_a") == 2L && row.getAs[Long]("n_b") == 2L)
    assert(row.getAs[Double]("u_a") == 0.0)
    assert(row.getAs[Double]("u_b") == 4.0)
    val varU = 4.0 / 12.0 * ((4.0 + 1.0) - 0.0 / (4.0 * 3.0))
    assert(row.getAs[Double]("var_u") == varU)
    assert(row.getAs[Double]("z") == (0.0 - 4.0) / (2.0 * math.sqrt(varU)))
    assert(!row.getAs[Boolean]("significant"))
  }

  test("ties: midranks and the tie-corrected variance") {
    // A = {1,1}, B = {1,2}: the three 1s share midrank 2 -> R_a = 4,
    // U_a = 1; tie term 3^3-3 = 24 -> var = (4/12)*(5 - 24/12)
    val row = mw(Seq(("a", 0, 1L), ("a", 0, 1L), ("a", 1, 1L), ("a", 1, 2L)))
    assert(row.getAs[Double]("u_a") == 1.0)
    assert(row.getAs[Double]("u_b") == 3.0)
    val varU = 4.0 / 12.0 * ((4.0 + 1.0) - 24.0 / (4.0 * 3.0))
    assert(row.getAs[Double]("var_u") == varU)
    assert(row.getAs[Double]("z") == (2.0 - 4.0) / (2.0 * math.sqrt(varU)))
  }

  test("an empty arm and an all-tied pool both void the z") {
    val oneArm = mw(Seq(("a", 0, 1L), ("a", 0, 5L), ("a", 0, 9L)))
    assert(oneArm.isNullAt(oneArm.fieldIndex("z")))
    assert(oneArm.isNullAt(oneArm.fieldIndex("significant")))
    val allTied = mw(Seq(("a", 0, 7L), ("a", 0, 7L), ("a", 1, 7L), ("a", 1, 7L)))
    assert(allTied.getAs[Double]("var_u") == 0.0)
    assert(allTied.isNullAt(allTied.fieldIndex("z")))
  }

  test("a planted location shift is detected; a whale row cannot fake one") {
    // B = A + 1000 elementwise over 30 values each -> U_a = 0, |z| large
    val base = (1 to 30).map(i => ("a", 0, i.toLong)) ++
      (1 to 30).map(i => ("a", 1, i + 1000L))
    val shifted = mw(base)
    assert(shifted.getAs[Double]("u_a") == 0.0)
    assert(shifted.getAs[Double]("z") < -1.96)
    assert(shifted.getAs[Boolean]("significant"))
    // identical distributions + ONE whale in arm B: the t-test's mean gap
    // is huge, but U moves by at most n_a ranks -> not significant
    val whale = (1 to 30).map(i => ("a", 0, i.toLong)) ++
      (1 to 29).map(i => ("a", 1, i.toLong)) :+ ("a", 1, 1000000L)
    val r = mw(whale)
    assert(!r.getAs[Boolean]("significant"))
  }

  private def prop(rows: Seq[(String, Long, Int)]) = {
    import spark.implicits._
    core.RankTests.abProportionsOn(rows.toDF("event_type", "user_id", "arm"))
      .collect()
  }

  test("proportions: hand-computed pooled z; universal conversion voids it") {
    // arm A: users 1,3 (user 1 converts on 'buy'); arm B: users 2,4 (both
    // convert). x_a=1 n_a=2, x_b=2 n_b=2 -> pool=3/4
    val rows = prop(Seq(
      ("buy", 1L, 0), ("buy", 2L, 1), ("buy", 4L, 1),
      ("view", 1L, 0), ("view", 3L, 0), ("view", 2L, 1), ("view", 4L, 1)))
    val buy = rows.find(_.getString(0) == "buy").get
    assert(buy.getAs[Long]("n_a") == 2L && buy.getAs[Long]("n_b") == 2L)
    assert(buy.getAs[Long]("x_a") == 1L && buy.getAs[Long]("x_b") == 2L)
    assert(buy.getAs[Double]("p_a") == 0.5 && buy.getAs[Double]("p_b") == 1.0)
    val pool = 3.0 / 4.0
    val varZ = pool * (1.0 - pool) * (1.0 / 2.0 + 1.0 / 2.0)
    assert(buy.getAs[Double]("z") == (0.5 - 1.0) / math.sqrt(varZ))
    // 'view': every user converts -> pool = 1 -> zero variance -> NULL z
    val view = rows.find(_.getString(0) == "view").get
    assert(view.isNullAt(view.fieldIndex("z")))
    assert(view.isNullAt(view.fieldIndex("significant")))
  }

  test("proportions: duplicate events never double-count a converting user") {
    val rows = prop(Seq(
      ("buy", 1L, 0), ("buy", 1L, 0), ("buy", 1L, 0), ("buy", 2L, 1),
      ("view", 1L, 0), ("view", 2L, 1), ("view", 3L, 0)))
    val buy = rows.find(_.getString(0) == "buy").get
    assert(buy.getAs[Long]("x_a") == 1L, "user 1 converts once, not thrice")
    assert(buy.getAs[Long]("n_a") == 2L, "user 3 counts in the denominator")
  }

  test("corpus proportions entry: x <= n per arm, rates in [0,1]") {
    val rows = core.RankTests.eventsAbProportions(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("x_a") <= r.getAs[Long]("n_a"))
      assert(r.getAs[Long]("x_b") <= r.getAs[Long]("n_b"))
      val pa = r.getAs[Double]("p_a")
      assert(pa >= 0.0 && pa <= 1.0)
    }
  }

  private def trim(rows: Seq[(String, Long)]) = {
    import spark.implicits._
    core.StatsQueries.trimmedMeanOn(rows.toDF("event_type", "y_c")).collect()
  }

  test("trimmed mean drops exactly n div 10 per side (whale excised)") {
    // 10 values 0, 1..8, 10000 -> k=1: drop the 0 and the whale ->
    // trimmed mean = (1+..+8)/(8*100); raw mean carries the whale
    val r = trim((Seq(0L) ++ (1L to 8L) ++ Seq(10000L)).map(("a", _))).head
    assert(r.getAs[Long]("n_events") == 10L)
    assert(r.getAs[Long]("n_trimmed_each_side") == 1L)
    assert(r.getAs[Double]("mean_trimmed") == 36.0 / 800.0)
    assert(r.getAs[Double]("mean_raw") == 10036.0 / 1000.0)
  }

  test("trimmed mean: a tie group straddling the cut takes only its partial") {
    // 20 copies of 5 and one 0: n=21, k=2 -> drop the 0 and ONE 5 from
    // the bottom, two 5s from the top -> mean over the 17 remaining 5s = 5
    val r = trim((Seq(0L) ++ Seq.fill(20)(5L)).map(("a", _))).head
    assert(r.getAs[Long]("n_trimmed_each_side") == 2L)
    assert(r.getAs[Double]("mean_trimmed") == (17 * 5).toDouble / (17 * 100).toDouble)
  }

  test("under 10 rows nothing is trimmed; trimmed == raw") {
    val r = trim(Seq(("a", 1L), ("a", 2L), ("a", 9L))).head
    assert(r.getAs[Long]("n_trimmed_each_side") == 0L)
    assert(r.getAs[Double]("mean_trimmed") == r.getAs[Double]("mean_raw"))
  }

  test("corpus trimmed mean: defined everywhere, within the raw range") {
    val rows = core.StatsQueries.aggTrimmedMean(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_trimmed_each_side") == r.getAs[Long]("n_events") / 10)
      assert(!r.getAs[Double]("mean_trimmed").isNaN)
    }
  }

  test("markov stationary: planted 2-state chain converges to the known law") {
    import spark.implicits._
    // P = [[1/2,1/2],[1/4,3/4]] -> stationary (1/3, 2/3)
    val counts = Seq(("a", "a", 1L), ("a", "b", 1L), ("b", "a", 1L), ("b", "b", 3L))
      .toDF("prev_type", "next_type", "n_transitions")
    val rows = core.EngagementQueries.markovStationaryOn(counts).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(math.abs(rows("a").getAs[Double]("pi_longrun") - 1.0 / 3.0) < 1e-3)
    assert(math.abs(rows("b").getAs[Double]("pi_longrun") - 2.0 / 3.0) < 1e-3)
    // floor quantization only LEAKS mass: the grid total stays <= 2^20
    assert(rows.values.map(_.getAs[Long]("pi_scaled")).sum <= (1L << 20))
    assert(rows("a").getAs[Double]("p_empirical") == 2.0 / 6.0)
  }

  test("markov stationary corpus entry: one row per state, shares near 1") {
    val rows = core.EngagementQueries.eventsMarkovStationary(spark, sf).collect()
    assert(rows.nonEmpty)
    val piSum = rows.map(_.getAs[Double]("pi_longrun")).sum
    assert(piSum > 0.99 && piSum <= 1.0 + 1e-9, s"pi mass $piSum")
    val empSum = rows.map(_.getAs[Double]("p_empirical")).sum
    assert(math.abs(empSum - 1.0) < 1e-9)
  }

  private def ks(rows: Seq[(String, Int, Long)]): Row = {
    import spark.implicits._
    val hist = ev(rows).groupBy($"event_type", $"y_c").agg(
      org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.when($"arm" === 0, 1L).otherwise(0L)).as("c_a"),
      org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.when($"arm" === 1, 1L).otherwise(0L)).as("c_b"))
    core.RankTests.ksFromHist(hist).collect().head
  }

  test("ks: hand-computed sup gap on a 3v3 pool; literal re-derives") {
    assert(core.RankTests.KsCoeff05 == math.sqrt(-math.log(0.025) / 2.0))
    // A = {1,2,3}, B = {2,3,4}: ECDF gap is 1/3 at every step.
    val row = ks(Seq(("a", 0, 1L), ("a", 0, 2L), ("a", 0, 3L),
      ("a", 1, 2L), ("a", 1, 3L), ("a", 1, 4L)))
    assert(row.getAs[Long]("n_a") == 3L && row.getAs[Long]("n_b") == 3L)
    assert(row.getAs[Double]("d") == 3.0 / 9.0)
    assert(row.getAs[Double]("d_crit") ==
      core.RankTests.KsCoeff05 * math.sqrt(6.0 / 9.0))
    assert(!row.getAs[Boolean]("significant"))
  }

  test("ks detects a mean-preserving spread the rank tests cannot see") {
    // A: 100 values at 10. B: 50 at 0 and 50 at 20 — same mean, and U is
    // dead-center by symmetry; the ECDF gap at 0 is 0.5 and decisive.
    val rows = (1 to 100).map(_ => ("a", 0, 10L)) ++
      (1 to 50).map(_ => ("a", 1, 0L)) ++ (1 to 50).map(_ => ("a", 1, 20L))
    val k = ks(rows)
    assert(k.getAs[Double]("d") == 0.5)
    assert(k.getAs[Boolean]("significant"))
    val u = mw(rows)
    assert(u.getAs[Double]("u_a") == u.getAs[Double]("u_b"),
      "symmetric spread: U is dead-center")
    assert(!u.getAs[Boolean]("significant"))
  }

  test("ks: an empty arm voids D and the verdict") {
    val row = ks(Seq(("a", 0, 1L), ("a", 0, 2L)))
    assert(row.isNullAt(row.fieldIndex("d")))
    assert(row.isNullAt(row.fieldIndex("significant")))
  }

  private def kw(rows: Seq[(String, Int, Long)]): Row =
    core.RankTests.kruskalOn(ev(rows)).collect().head

  test("kruskal: hand-computed H on untied ranks; chi2 literal re-derives") {
    assert(core.RankTests.KwChi2Df2Crit == -2.0 * math.log(0.05))
    // arms {1,2} {3,4} {5,6}: R = 3, 7, 11 over ranks 1..6.
    val row = kw(Seq(("a", 0, 1L), ("a", 0, 2L), ("a", 1, 3L), ("a", 1, 4L),
      ("a", 2, 5L), ("a", 2, 6L)))
    val nD = 6.0
    val terms = 36.0 / (4.0 * 2.0) + 196.0 / (4.0 * 2.0) + 484.0 / (4.0 * 2.0)
    val expH = (12.0 / (nD * (nD + 1.0)) * terms - 3.0 * (nD + 1.0)) / 1.0
    assert(row.getAs[Double]("h") == expH)
    assert(!row.getAs[Boolean]("significant"), "H = 4.57 < 5.99")
  }

  test("kruskal: midranks and the tie correction on a tied pool") {
    // arms {1,1} {1,2} {2,2}: value 1 x3 (midrank 2), value 2 x3
    // (midrank 5); R = 4, 7, 10; tie term 2*(27-3) = 48.
    val row = kw(Seq(("a", 0, 1L), ("a", 0, 1L), ("a", 1, 1L), ("a", 1, 2L),
      ("a", 2, 2L), ("a", 2, 2L)))
    val nD = 6.0
    val terms = 64.0 / (4.0 * 2.0) + 196.0 / (4.0 * 2.0) + 400.0 / (4.0 * 2.0)
    val hRaw = 12.0 / (nD * (nD + 1.0)) * terms - 3.0 * (nD + 1.0)
    val expH = hRaw / (1.0 - 48.0 / (nD * nD * nD - nD))
    assert(row.getAs[Double]("h") == expH)
  }

  test("kruskal: a planted arm shift is significant; degenerate pools are NULL") {
    val base = (1 to 30).flatMap(i => Seq(("a", 0, i.toLong), ("a", 1, i.toLong),
      ("a", 2, i + 1000L)))
    val shifted = kw(base)
    assert(shifted.getAs[Double]("h") > core.RankTests.KwChi2Df2Crit)
    assert(shifted.getAs[Boolean]("significant"))
    val allTied = kw(Seq(("a", 0, 7L), ("a", 1, 7L), ("a", 2, 7L)))
    assert(allTied.isNullAt(allTied.fieldIndex("h")))
    // an empty arm shifts df: h stays defined, the 3-arm verdict is NULL
    val twoArms = kw(Seq(("a", 0, 1L), ("a", 0, 2L), ("a", 1, 3L), ("a", 1, 4L)))
    assert(!twoArms.isNullAt(twoArms.fieldIndex("h")))
    assert(twoArms.isNullAt(twoArms.fieldIndex("significant")))
  }

  test("corpus ks + kruskal entries: defined, bounded, deterministic") {
    val ksRows = core.RankTests.eventsAbKs(spark, sf).collect()
    assert(ksRows.nonEmpty)
    ksRows.foreach { r =>
      val d = r.getAs[Double]("d")
      assert(d >= 0.0 && d <= 1.0)
      assert(r.getAs[Double]("d_crit") > 0.0)
    }
    val kwRows = core.RankTests.eventsAbKruskal(spark, sf).collect()
    assert(kwRows.nonEmpty)
    kwRows.foreach { r =>
      assert(r.getAs[Long]("n_0") > 0L)
      if (!r.isNullAt(r.fieldIndex("h"))) assert(r.getAs[Double]("h") >= -1e-9)
    }
  }

  test("a 2.4M-row tie group does not overflow the cubic tie term") {
    // t³ = 1.38e19 > 2⁶³ — BIGINT would raise under ANSI; the
    // DECIMAL(38,0) tie sum stays exact. Two symmetric value groups keep
    // var_u > 0 so the full variance path (not just the NULL edge) runs.
    import spark.implicits._
    val hist = Seq(
      ("a", 1L, 1200000L, 1200000L),
      ("a", 2L, 1200000L, 1200000L)).toDF("event_type", "y_c", "c_a", "c_b")
    val row = core.RankTests.mannWhitneyFromHist(hist).collect().head
    val t = 2400000L
    val tie = new java.math.BigDecimal(
      java.math.BigInteger.valueOf(t).pow(3)
        .subtract(java.math.BigInteger.valueOf(t))
        .multiply(java.math.BigInteger.valueOf(2L))).doubleValue()
    val nD = 4800000.0
    val expVar = (2400000.0 * 2400000.0) / 12.0 *
      ((nD + 1.0) - tie / (nD * (nD - 1.0)))
    assert(row.getAs[Double]("var_u") == expVar)
    assert(expVar > 0.0)
    // Symmetric arms: U_a == U_b == n_a·n_b/2 -> z == 0.
    assert(row.getAs[Double]("z") == 0.0)
  }

  private def cuped(rows: Seq[(Long, Int, String, Long)]) = {
    import spark.implicits._
    import org.apache.spark.sql.functions.{lit, to_date}
    val ev = rows.toDF("user_id", "arm", "day", "y_c")
      .select(lit("t").as("event_type"), $"user_id", $"arm",
        to_date($"day").as("day"), $"y_c")
    core.RankTests.cupedOn(ev, lit(java.sql.Date.valueOf("2024-01-05")))
      .collect().head
  }

  test("cuped: a pre-correlated metric reads sharper adjusted than plain") {
    // x = u div 2 is arm-balanced (cov(x, arm) = 0); y = x + 10*arm +
    // u%3 wiggle: the covariate explains ~97% of var(y) (the modest
    // lift and the wiggle are the rest) -> theta ~ 1, and the same
    // lift z-reads an order of magnitude stronger CUPED-adjusted.
    val rows = (0L until 200L).flatMap { u =>
      val x = u / 2; val arm = (u % 2).toInt
      val y = x + 10L * arm + u % 3
      Seq((u, arm, "2024-01-01", x), (u, arm, "2024-01-10", y))
    }
    val r = cuped(rows)
    assert(r.getAs[Long]("n_a") == 100L && r.getAs[Long]("n_b") == 100L)
    assert(math.abs(r.getAs[Double]("theta") - 1.0) < 0.01)
    assert(r.getAs[Double]("var_reduction") > 0.9)
    assert(math.abs(r.getAs[Double]("z_cuped")) >
      math.abs(r.getAs[Double]("z_plain")) * 10)
    assert(r.getAs[Boolean]("significant"))
  }

  test("cuped: zero covariate variance degrades to the plain Welch z") {
    // every user has the same pre-spend -> var(x) = 0 -> theta = 0 and
    // the adjusted z IS the plain z
    val rows = (0L until 60L).flatMap { u =>
      val arm = (u % 2).toInt
      Seq((u, arm, "2024-01-01", 7L),
        (u, arm, "2024-01-10", u * 3L + 20L * arm))
    }
    val r = cuped(rows)
    assert(r.getAs[Double]("theta") == 0.0)
    assert(r.getAs[Double]("z_cuped") == r.getAs[Double]("z_plain"))
  }

  test("cuped: an n<=1 arm voids the z and the verdict") {
    val r = cuped(Seq((0L, 0, "2024-01-01", 5L), (0L, 0, "2024-01-10", 9L),
      (2L, 0, "2024-01-10", 4L), (1L, 1, "2024-01-10", 8L)))
    assert(r.isNullAt(r.fieldIndex("z_cuped")))
    assert(r.isNullAt(r.fieldIndex("significant")))
  }

  test("cuped corpus entry: rho^2 bounded, both z's defined per type") {
    val rows = core.RankTests.eventsAbCuped(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      if (!r.isNullAt(r.fieldIndex("var_reduction"))) {
        val vr = r.getAs[Double]("var_reduction")
        assert(vr >= 0.0 && vr <= 1.0)
      }
      assert(!r.isNullAt(r.fieldIndex("z_plain")))
      assert(!r.isNullAt(r.fieldIndex("z_cuped")))
    }
  }

  test("power: the z_beta literal re-derives from a Taylor-series normal CDF") {
    // Phi(x) = (1 + erf(x/sqrt 2))/2 with erf by its Taylor series —
    // machine-precision for |x| < 3, so the 0.8416... literal is pinned
    // to Phi(z) == 0.8 within 1e-12 (the literal-weights discipline)
    def erf(x: Double): Double = {
      var (term, sum) = (x, x)
      for (n <- 1 to 40) {
        term = -term * x * x / n
        sum += term / (2 * n + 1)
      }
      sum * 2.0 / math.sqrt(math.Pi)
    }
    val phi = 0.5 * (1.0 + erf(core.RankTests.PowerZBeta80 / math.sqrt(2.0)))
    assert(math.abs(phi - 0.8) < 1e-12)
  }

  test("power corpus entry: verdict consistent with its own numbers") {
    val rows = core.RankTests.eventsAbPower(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      if (!r.isNullAt(r.fieldIndex("n_required"))) {
        val req = r.getAs[Long]("n_required")
        assert(req >= 0L)
        assert(r.getAs[Boolean]("powered") ==
          (math.min(r.getAs[Long]("n_a"), r.getAs[Long]("n_b")) >= req))
      } else assert(r.isNullAt(r.fieldIndex("powered")))
    }
  }

  test("srm: z re-derives from the arm counts; both corpus arms populated") {
    // the corpus entry's own split on real data: both arms exposed and
    // the z column is exactly the (u_a-u_b)/sqrt(u_a+u_b) form
    val rows = core.RankTests.eventsAbSrm(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("u_a") > 0L && r.getAs[Long]("u_b") > 0L)
      val z = r.getAs[Double]("z")
      val exp = (r.getAs[Long]("u_a") - r.getAs[Long]("u_b")).toDouble /
        math.sqrt((r.getAs[Long]("u_a") + r.getAs[Long]("u_b")).toDouble)
      assert(z == exp)
    }
  }

  test("readout: Bonferroni literal re-derives; decision follows the rule") {
    def erf(x: Double): Double = {
      var (term, sum) = (x, x)
      for (n <- 1 to 60) {
        term = -term * x * x / n
        sum += term / (2 * n + 1)
      }
      sum * 2.0 / math.sqrt(math.Pi)
    }
    val phi = 0.5 * (1.0 + erf(core.RankTests.BonferroniZ4 / math.sqrt(2.0)))
    assert(math.abs(phi - (1.0 - 0.05 / 8.0)) < 1e-12)
    val c = core.RankTests.BonferroniZ4
    val rows = core.RankTests.eventsAbReadout(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      def zAbs(f: String) =
        if (r.isNullAt(r.fieldIndex(f))) None else Some(math.abs(r.getAs[Double](f)))
      val anyEff = Seq("z_welch", "z_cuped", "z_mw", "z_conv")
        .flatMap(zAbs).exists(_ > c)
      def boolOf(f: String): Option[Boolean] =
        if (r.isNullAt(r.fieldIndex(f))) None else Some(r.getAs[Boolean](f))
      // mirror SQL three-valued logic: a NULL condition skips its branch
      val expected =
        if (boolOf("srm_detected").contains(true)) "invalid_srm"
        else if (boolOf("powered").contains(false)) "underpowered"
        else if (anyEff) "effect"
        else "no_effect"
      assert(r.getAs[String]("decision") == expected, r.toString)
    }
  }

  test("corpus entry: non-vacuous and U_a + U_b == n_a*n_b per type") {
    val rows = core.RankTests.eventsAbMannWhitney(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val na = r.getAs[Long]("n_a"); val nb = r.getAs[Long]("n_b")
      assert(r.getAs[Double]("u_a") + r.getAs[Double]("u_b") == na.toDouble * nb)
      assert(r.getAs[Double]("u_a") >= 0.0 && r.getAs[Double]("u_b") >= 0.0)
    }
  }

  // --- group-sequential (events_ab_sequential) ------------------------

  /** 4-day span (mn = Jan 1, spanP = 4): day d lands in look d+1, so a
    * planted trajectory controls exactly which look sees which rows.
    */
  private def seqAb(rows: Seq[(String, Int, String, Long)]) = {
    import spark.implicits._
    import org.apache.spark.sql.functions.{lit, to_date}
    val ev = rows.toDF("event_type", "arm", "day", "y_c")
      .select($"event_type", $"arm", to_date($"day").as("day"), $"y_c",
        ($"y_c" * $"y_c").as("yy_4"))
    core.RankTests.sequentialOn(ev,
      lit(java.sql.Date.valueOf("2024-01-01")), lit(4L))
      .collect().sortBy(_.getAs[Long]("look"))
  }

  private val days = Seq("2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04")

  test("sequential: OBF boundaries are c*sqrt(4/k), strictly decreasing") {
    val c = core.RankTests.ObfCritZ4
    val rows = seqAb(for (d <- days; arm <- Seq(0, 1); i <- 0 until 4)
      yield ("t", arm, d, 1000L + i % 2))
    assert(rows.map(_.getAs[Long]("look")).toSeq == Seq(1L, 2L, 3L, 4L))
    rows.foreach { r =>
      val k = r.getAs[Long]("look").toDouble
      assert(r.getAs[Double]("boundary") == c * math.sqrt(4.0 / k))
    }
    val bs = rows.map(_.getAs[Double]("boundary"))
    assert(bs.head == c * 2.0 && bs.last == c)
    assert(bs.zip(bs.tail).forall { case (a, b) => a > b })
  }

  test("sequential: an overwhelming lift stops at look 1 (reject_early)") {
    // arm 0 ~ 100.00, arm 1 ~ 0.00 with a 1-cent wiggle: z >> 4.05 from
    // the first look; the crossing pins stop_look = 1 on ALL FOUR rows
    // (the post-stop looks are the counterfactual a platform never runs)
    val rows = seqAb(for (d <- days; arm <- Seq(0, 1); i <- 0 until 40)
      yield ("t", arm, d, (if (arm == 0) 10000L else 0L) + i % 2))
    assert(rows.head.getAs[Boolean]("crossed"))
    rows.foreach { r =>
      assert(r.getAs[Long]("stop_look") == 1L)
      assert(r.getAs[String]("decision") == "reject_early")
    }
  }

  test("sequential: a modest real lift survives early looks, rejects at 4") {
    // delta = 3 cents on sd ~ 20 cents with 100/arm/look: the cumulative
    // z grows ~ sqrt(k) (~1.05, 1.49, 1.83, 2.11) -- under every interim
    // boundary (4.05 / 2.86 / 2.34) but over the final 2.024. The exact
    // fixed-horizon reading (|z|>1.96 from look 2 on) would have stopped
    // THREE looks early -- the inflation the boundary exists to prevent.
    val rows = seqAb(for (d <- days; arm <- Seq(0, 1); i <- 0 until 100)
      yield ("t", arm, d,
        (if (arm == 0) 100000L else 99997L) + (if (i % 2 == 0) -20L else 20L)))
    val zs = rows.map(_.getAs[Double]("z"))
    rows.init.foreach { r =>
      assert(!r.getAs[Boolean]("crossed"), r.toString)
    }
    assert(rows.last.getAs[Boolean]("crossed"))
    assert(math.abs(zs.last) > 2.024 && math.abs(zs.last) < 2.337)
    rows.foreach { r =>
      assert(r.getAs[Long]("stop_look") == 4L)
      assert(r.getAs[String]("decision") == "reject_final")
    }
  }

  test("sequential: identical arms never cross (accept), z == 0 throughout") {
    val rows = seqAb(for (d <- days; arm <- Seq(0, 1); i <- 0 until 10)
      yield ("t", arm, d, 500L + i % 3))
    rows.foreach { r =>
      assert(r.getAs[Double]("z") == 0.0)
      assert(!r.getAs[Boolean]("crossed"))
      assert(r.isNullAt(r.fieldIndex("stop_look")))
      assert(r.getAs[String]("decision") == "accept")
    }
  }

  test("sequential: an n<=1 arm at an early look voids that look's z only") {
    // arm 1 has a single row in look 1 (no sample variance -> NULL z,
    // NULL crossed); from look 2 on both arms are populated and the z
    // is defined -- min() skips the NULL look in the stop_look scan
    val filler = for (d <- days.drop(1); arm <- Seq(0, 1); i <- 0 until 6)
      yield ("t", arm, d, 700L + i % 2)
    val rows = seqAb(
      Seq(("t", 0, days.head, 700L), ("t", 0, days.head, 701L),
        ("t", 1, days.head, 700L)) ++ filler)
    assert(rows.head.isNullAt(rows.head.fieldIndex("z")))
    assert(rows.head.isNullAt(rows.head.fieldIndex("crossed")))
    rows.tail.foreach(r => assert(!r.isNullAt(r.fieldIndex("z"))))
  }

  test("sequential: the 2.024 OBF literal re-derives empirically (type-I ~ 5%)") {
    // The K=4 O'Brien–Fleming constant has no closed form (it solves a
    // 4-dimensional correlated-normal crossing equation), so unlike the
    // Bonferroni/power literals it cannot be Taylor-re-derived. Pin it
    // EMPIRICALLY instead, deterministically: simulate standard-normal
    // 4-look experiments under H0 (seeded 64-bit LCG + Box–Muller — no
    // Math.random, bit-stable forever) and check (a) the OBF boundary
    // c*sqrt(4/k) spends ~alpha = 0.05, and (b) naked 1.96 at every
    // look — the peeking this entry exists to prevent — spends ~3x
    // that. A wrong constant (e.g. 1.96, or the K=2 value 1.977 vs the
    // K=4 2.024 at these tolerances' edge) moves (a) off its band.
    var seed = 0x9E3779B97F4A7C15L
    def nextU(): Double = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      ((seed >>> 11).toDouble / (1L << 53).toDouble)
    }
    def gauss(): Double = {
      val (u1, u2) = (math.max(nextU(), 1e-300), nextU())
      math.sqrt(-2.0 * math.log(u1)) * math.cos(2.0 * math.Pi * u2)
    }
    val c = core.RankTests.ObfCritZ4
    val n = 200000
    var obfCross = 0; var nakedCross = 0
    var i = 0
    while (i < n) {
      var s = 0.0; var obf = false; var naked = false
      var k = 1
      while (k <= 4) {
        s += gauss() // z_k = S_k / sqrt(k): the canonical H0 random walk
        val z = s / math.sqrt(k.toDouble)
        if (math.abs(z) > c * math.sqrt(4.0 / k)) obf = true
        if (math.abs(z) > 1.96) naked = true
        k += 1
      }
      if (obf) obfCross += 1
      if (naked) nakedCross += 1
      i += 1
    }
    val obfRate = obfCross.toDouble / n
    val nakedRate = nakedCross.toDouble / n
    assert(obfRate > 0.035 && obfRate < 0.065, s"OBF type-I $obfRate")
    assert(nakedRate > 0.11, s"naked-1.96 peeking type-I $nakedRate")
    assert(nakedRate > 2.0 * obfRate,
      s"peeking inflation $nakedRate vs boundary $obfRate")
  }

  test("sequential cuped: variance reduction moves the crossing time") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{lit, to_date}
    // pre = Jan 1 (x = (u div 2)*100, arm-balanced); experiment = Jan
    // 6..9 = looks 1..4 (cut Jan 5, span2 = 4). Daily metric = x/4 +
    // 10*arm + (u%3)*25: the covariate explains almost all raw
    // variance, the lift is 10 cents on a 25-cent-wiggle metric. The
    // CUPED-adjusted z (~3.4, constant across looks: cumulative noise
    // is per-user-correlated) clears the look-2 boundary (2.863) but
    // not look 1 (4.048) -> an EARLY stop; the plain z never clears
    // ANY boundary (the x/4 spread swamps the lift) -- the monitored
    // experiment only reads out early BECAUSE of the covariate.
    val rows = (0L until 200L).flatMap { u =>
      val x = (u / 2) * 100; val arm = (u % 2).toInt
      ("t", u, arm, "2024-01-01", x) +: Seq("2024-01-06", "2024-01-07",
        "2024-01-08", "2024-01-09").map { d =>
        ("t", u, arm, d, (u / 2) * 25 + 10L * arm + (u % 3) * 25)
      }
    }
    val ev = rows.toDF("event_type", "user_id", "arm", "day", "y_c")
      .select($"event_type", $"user_id", $"arm",
        to_date($"day").as("day"), $"y_c")
    val out = core.RankTests.sequentialCupedOn(ev,
        lit(java.sql.Date.valueOf("2024-01-05")), lit(4L))
      .collect().sortBy(_.getAs[Long]("look"))
    assert(out.map(_.getAs[Long]("look")).toSeq == Seq(1L, 2L, 3L, 4L))
    out.foreach { r =>
      assert(r.getAs[Double]("var_reduction") > 0.9, r.toString)
      // the plain monitor would never have stopped at any look
      assert(math.abs(r.getAs[Double]("z_plain")) <
        r.getAs[Double]("boundary"), r.toString)
    }
    val stop = out.head.getAs[Long]("stop_look")
    assert(stop >= 2L && stop < 4L, s"expected an early CUPED stop, got $stop")
    assert(out.forall(_.getAs[String]("decision") == "reject_early"))
  }

  test("sequential cuped: zero covariate variance degrades to plain looks") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{lit, to_date}
    // constant pre-spend -> var(x) = 0 -> theta = 0 at every look and
    // z_cuped == z_plain row for row (the fixed-horizon degrade, per look)
    val rows = (0L until 80L).flatMap { u =>
      val arm = (u % 2).toInt
      ("t", u, arm, "2024-01-01", 500L) +: Seq("2024-01-06", "2024-01-07",
        "2024-01-08", "2024-01-09").map(d => ("t", u, arm, d, u * 7L + 30L * arm))
    }
    val ev = rows.toDF("event_type", "user_id", "arm", "day", "y_c")
      .select($"event_type", $"user_id", $"arm",
        to_date($"day").as("day"), $"y_c")
    val out = core.RankTests.sequentialCupedOn(ev,
        lit(java.sql.Date.valueOf("2024-01-05")), lit(4L)).collect()
    out.foreach { r =>
      assert(r.getAs[Double]("theta") == 0.0)
      assert(r.getAs[Double]("z_cuped") == r.getAs[Double]("z_plain"))
    }
  }

  test("sequential corpus entry: 4 looks per type, cumulative n monotone") {
    val rows = core.RankTests.eventsAbSequential(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("look"))
      assert(sorted.map(_.getAs[Long]("look")).toSeq == (1L to 4L))
      val nas = sorted.map(_.getAs[Long]("n_a"))
      val nbs = sorted.map(_.getAs[Long]("n_b"))
      assert(nas.zip(nas.tail).forall { case (a, b) => a <= b })
      assert(nbs.zip(nbs.tail).forall { case (a, b) => a <= b })
      // one decision per type, consistent across its four rows
      assert(sorted.map(_.getAs[String]("decision")).distinct.length == 1)
    }
  }
}
