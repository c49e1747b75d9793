package graft

import org.apache.spark.sql.functions._

/** Robust trend pair: Theil–Sen median slope and the Mann–Kendall test.
  * Values are hand-computed on synthetic daily frames (even and odd pair
  * counts, tie correction); the served twins must match the batch
  * entries bit-for-bit (shared core over the streamed state).
  */
class TrendSpec extends SparkSuite {

  private def daily(rows: Seq[(String, String, Long)]) = {
    import spark.implicits._
    rows.toDF("event_type", "day", "n")
      .select($"event_type", to_date($"day").as("day"), $"n")
  }

  test("theil-sen: even pair count averages the two middle slopes") {
    // counts 1,3,2,5 on consecutive days -> 6 slopes:
    // 2, 0.5, 4/3, -1, 1, 3; sorted -1, 0.5, 1, 4/3, 2, 3
    // median = (1 + 4/3) / 2
    val d = daily(Seq(
      ("a", "2024-01-01", 1L), ("a", "2024-01-02", 3L),
      ("a", "2024-01-03", 2L), ("a", "2024-01-04", 5L)))
    val row = core.TrendQueries.theilSenOn(d).collect().head
    assert(row.getAs[Long]("n_days") == 4L)
    assert(row.getAs[Long]("n_pairs") == 6L)
    assert(row.getAs[Double]("slope_per_day") == (1.0 + 4.0 / 3.0) / 2)
    assert(row.getAs[Double]("slope_per_week") == ((1.0 + 4.0 / 3.0) / 2) * 7.0)
  }

  test("theil-sen: odd pair count picks the single middle slope") {
    // counts 1,2,4 on consecutive days -> slopes 1, 1.5, 2 -> median 1.5
    val d = daily(Seq(
      ("a", "2024-01-01", 1L), ("a", "2024-01-02", 2L),
      ("a", "2024-01-03", 4L)))
    val row = core.TrendQueries.theilSenOn(d).collect().head
    assert(row.getAs[Long]("n_pairs") == 3L)
    assert(row.getAs[Double]("slope_per_day") == 1.5)
  }

  test("theil-sen: one outlier day cannot move the median (robustness)") {
    // a clean +1/day trend with one wild spike: OLS would bend, the
    // median slope stays exactly 1
    val d = daily(Seq(
      ("a", "2024-01-01", 10L), ("a", "2024-01-02", 11L),
      ("a", "2024-01-03", 12L), ("a", "2024-01-04", 13L),
      ("a", "2024-01-05", 14L), ("a", "2024-01-06", 1000L),
      ("a", "2024-01-07", 16L), ("a", "2024-01-08", 17L),
      ("a", "2024-01-09", 18L)))
    val row = core.TrendQueries.theilSenOn(d).collect().head
    assert(row.getAs[Double]("slope_per_day") == 1.0)
  }

  test("dispersion: hand-computed index, Poisson-like vs bursty, NULL edges") {
    // counts 2,2,2,2 -> var 0 -> D = 0 (perfectly regular)
    val flat = core.TrendQueries.dispersionOn(daily(Seq(
      ("a", "2024-01-01", 2L), ("a", "2024-01-02", 2L),
      ("a", "2024-01-03", 2L), ("a", "2024-01-04", 2L)))).collect().head
    assert(flat.getAs[Double]("dispersion") == 0.0)
    assert(!flat.getAs[Boolean]("overdispersed"))
    // counts 0,0,0,8: N=4 S=8 Q=64 -> var = (256-64)/12 = 16, mean 2 -> D 8
    val burst = core.TrendQueries.dispersionOn(daily(Seq(
      ("a", "2024-01-01", 0L), ("a", "2024-01-02", 0L),
      ("a", "2024-01-03", 0L), ("a", "2024-01-04", 8L)))).collect().head
    assert(burst.getAs[Double]("dispersion") == 8.0)
    assert(burst.getAs[Boolean]("overdispersed"))
    // a single day (N=1) and an all-zero series both void D
    val one = core.TrendQueries.dispersionOn(daily(Seq(
      ("a", "2024-01-01", 5L)))).collect().head
    assert(one.isNullAt(one.fieldIndex("dispersion")))
    val zero = core.TrendQueries.dispersionOn(daily(Seq(
      ("a", "2024-01-01", 0L), ("a", "2024-01-02", 0L)))).collect().head
    assert(zero.isNullAt(zero.fieldIndex("dispersion")))
  }

  test("dispersion served from streamed state == batch bit-for-bit") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_disp_stream").toString
    val ev = Tables.events(spark, sf)
    streaming.ForecastStream.dailyFold(ev.filter($"event_id" % 2 === 0), dir, 0L)
    streaming.ForecastStream.dailyFold(ev.filter($"event_id" % 2 === 1), dir, 1L)
    val served = streaming.ForecastStream.serveDispersion(spark, dir)
      .collect().map(_.toSeq).toSeq
    val batch = core.TrendQueries.eventsDispersion(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(served == batch && served.nonEmpty)
  }

  test("hodges-lehmann: hand-computed Walsh medians, outlier resistance") {
    // counts 1,2,9: Walsh sums (i<=j): 2,3,10,4,11,18 sorted -> even 6
    // pairs, middles 4 and 10 -> HL = (4+10)/4 = 3.5
    val r = core.TrendQueries.hlLevelOn(daily(Seq(
      ("a", "2024-01-01", 1L), ("a", "2024-01-02", 2L),
      ("a", "2024-01-03", 9L)))).collect().head
    assert(r.getAs[Long]("n_days") == 3L)
    assert(r.getAs[Long]("n_pairs") == 6L)
    assert(r.getAs[Double]("hl_level") == 3.5)
    // a clean level of 10 with one wild day: the mean jumps to ~174,
    // HL stays at the level
    val burst = core.TrendQueries.hlLevelOn(daily(Seq(
      ("a", "2024-01-01", 10L), ("a", "2024-01-02", 10L),
      ("a", "2024-01-03", 10L), ("a", "2024-01-04", 10L),
      ("a", "2024-01-05", 10L), ("a", "2024-01-06", 1000L)))).collect().head
    assert(burst.getAs[Double]("hl_level") == 10.0)
  }

  test("hodges-lehmann served from streamed state == batch bit-for-bit") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_hl_stream").toString
    val ev = Tables.events(spark, sf)
    streaming.ForecastStream.dailyFold(ev.filter($"event_id" % 2 === 0), dir, 0L)
    streaming.ForecastStream.dailyFold(ev.filter($"event_id" % 2 === 1), dir, 1L)
    assert(streaming.ForecastStream.serveHlLevel(spark, dir)
      .collect().map(_.toSeq).toSeq ==
      core.TrendQueries.eventsLevelHl(spark, sf).collect().map(_.toSeq).toSeq)
  }

  test("mann-kendall: S, ties-corrected variance, z") {
    // series 1,3,2,5: signs +,+,+,-,+,+ -> S=4; n=4 distinct counts ->
    // var = 4*3*13/18; z = 3/sqrt(var)
    val d = daily(Seq(
      ("a", "2024-01-01", 1L), ("a", "2024-01-02", 3L),
      ("a", "2024-01-03", 2L), ("a", "2024-01-04", 5L)))
    val row = core.TrendQueries.mannKendallOn(d).collect().head
    assert(row.getAs[Long]("s_stat") == 4L)
    assert(row.getAs[Double]("var_s") == 156.0 / 18.0)
    assert(row.getAs[Double]("z") == 3.0 / math.sqrt(156.0 / 18.0))
    assert(row.getAs[String]("trend") == "no_trend")
  }

  test("mann-kendall: tie group shrinks the variance") {
    // counts 2,2,3: one tie group t=2 -> tie_term = 2*1*9 = 18
    // var = (3*2*11 - 18)/18 = 48/18; S = 0+1+1 = 2
    val d = daily(Seq(
      ("a", "2024-01-01", 2L), ("a", "2024-01-02", 2L),
      ("a", "2024-01-03", 3L)))
    val row = core.TrendQueries.mannKendallOn(d).collect().head
    assert(row.getAs[Long]("s_stat") == 2L)
    assert(row.getAs[Double]("var_s") == 48.0 / 18.0)
    assert(row.getAs[Double]("z") == 1.0 / math.sqrt(48.0 / 18.0))
  }

  test("mann-kendall: all-tied series emits NULL z and no_trend") {
    val d = daily(Seq(
      ("a", "2024-01-01", 5L), ("a", "2024-01-02", 5L),
      ("a", "2024-01-03", 5L)))
    val row = core.TrendQueries.mannKendallOn(d).collect().head
    assert(row.getAs[Long]("s_stat") == 0L)
    assert(row.getAs[Double]("var_s") == 0.0)
    assert(row.isNullAt(row.fieldIndex("z")))
    assert(row.getAs[String]("trend") == "no_trend")
  }

  test("monotone decrease flags decreasing at sufficient length") {
    val d = daily((1 to 10).map(i => ("a", f"2024-01-$i%02d", (100 - i).toLong)))
    val row = core.TrendQueries.mannKendallOn(d).collect().head
    assert(row.getAs[Long]("s_stat") == -45L)
    assert(row.getAs[String]("trend") == "decreasing")
    val ts = core.TrendQueries.theilSenOn(d).collect().head
    assert(ts.getAs[Double]("slope_per_day") == -1.0)
  }

  test("served twins are bit-identical to the batch entries") {
    val batchTs = core.TrendQueries.eventsTrendTheilsen(spark, sf).collect().toSeq
    val servedTs = streaming.ForecastServe.theilSenServed(spark, sf).collect().toSeq
    assert(batchTs == servedTs)
    val batchMk = core.TrendQueries.eventsTrendMannKendall(spark, sf).collect().toSeq
    val servedMk = streaming.ForecastServe.mannKendallServed(spark, sf).collect().toSeq
    assert(batchMk == servedMk)
    assert(batchTs.nonEmpty && batchMk.nonEmpty)
  }

  private def pettitt(rows: Seq[(String, String, Long)]) =
    core.TrendQueries.pettittOn(daily(rows)).collect()

  test("pettitt: a planted level break is located and significant") {
    assert(core.TrendQueries.PettittLn40 == math.log(40.0))
    assert(core.TrendQueries.PettittLn40 == -math.log(0.025))
    // 10 days at 5, then 10 days at 50: U peaks at the cut with
    // K = 10*10 = 100; 6K^2 = 60000 > ln40*(8000+400) ~ 30987.
    val rows = (1 to 10).map(i => ("a", f"2024-01-$i%02d", 5L)) ++
      (11 to 20).map(i => ("a", f"2024-01-$i%02d", 50L))
    val r = pettitt(rows).head
    assert(r.getAs[Long]("n_days") == 20L)
    assert(r.getAs[Long]("k_stat") == 100L)
    assert(r.getAs[java.sql.Timestamp]("change_day").toString.startsWith("2024-01-10"))
    assert(r.getAs[Boolean]("significant"))
  }

  test("pettitt: hand-computed U on a 3-day series; earliest-day tie-break") {
    // values 1,2,3: V = 2, 0, -2 -> U = 2, 2 (U_3 == 0 is not a cut);
    // |U| ties at days 1 and 2 -> earliest day wins.
    val r = pettitt(Seq(("a", "2024-01-01", 1L), ("a", "2024-01-02", 2L),
      ("a", "2024-01-03", 3L))).head
    assert(r.getAs[Long]("k_stat") == 2L)
    assert(r.getAs[java.sql.Timestamp]("change_day").toString.startsWith("2024-01-01"))
    assert(!r.getAs[Boolean]("significant"))
  }

  test("pettitt: one whale day cannot fake a break; 1-day series drops") {
    val flat = (1 to 10).map(i => ("a", f"2024-01-$i%02d", 7L)) ++
      Seq(("a", "2024-01-11", 1000000L)) ++
      (12 to 21).map(i => ("a", f"2024-01-$i%02d", 7L))
    val r = pettitt(flat).head
    assert(r.getAs[Long]("k_stat") == 10L, "the whale moves U by one rank step per day")
    assert(!r.getAs[Boolean]("significant"))
    assert(pettitt(Seq(("a", "2024-01-01", 3L))).isEmpty,
      "no interior cut on a 1-day series")
  }

  private def spearman(rows: Seq[(String, String, Long, Long)]) = {
    import spark.implicits._
    core.TrendQueries.spearmanOn(
      rows.toDF("event_type", "day", "n", "v")
        .select($"event_type", to_date($"day").as("day"), $"n", $"v"))
      .collect()
  }

  test("spearman: perfect monotone is +-1; invariant under monotone maps") {
    val up = (1 to 8).map(i => ("a", f"2024-01-$i%02d", i.toLong, (i * 100).toLong))
    val r = spearman(up).head
    assert(r.getAs[Double]("rho") == 1.0)
    assert(r.getAs[Boolean]("significant"))
    val down = (1 to 8).map(i => ("a", f"2024-01-$i%02d", i.toLong, (900 - i * 100).toLong))
    assert(spearman(down).head.getAs[Double]("rho") == -1.0)
    // rank correlation only sees order: cubing the value margin (or one
    // whale at the top) changes nothing
    val cubed = up.map { case (t, d, n, v) => (t, d, n, v * v * v) }
    assert(spearman(cubed).head.getAs[Double]("rho") == 1.0)
    val whale = up.dropRight(1) :+ (("a", "2024-01-08", 8L, 999999999L))
    assert(spearman(whale).head.getAs[Double]("rho") == 1.0)
  }

  test("spearman: hand-computed rho with a tie; constant margins are NULL") {
    // n = 1,2,3 ranks 1,2,3 (double 2,4,6); v = 10,10,20 midranks
    // 1.5,1.5,3 (double 3,3,6): rho = cov/sd product on the double ranks
    val r = spearman(Seq(("a", "2024-01-01", 1L, 10L),
      ("a", "2024-01-02", 2L, 10L), ("a", "2024-01-03", 3L, 20L))).head
    val (sx, sy, sxx, syy, sxy) = (12.0, 12.0, 56.0, 54.0, 54.0)
    val m = 3.0
    val exp = (m * sxy - sx * sy) /
      math.sqrt((m * sxx - sx * sx) * (m * syy - sy * sy))
    assert(r.getAs[Double]("rho") == exp)
    val flatV = spearman((1 to 5).map(i => ("a", f"2024-01-$i%02d", i.toLong, 7L)))
    assert(flatV.head.isNullAt(flatV.head.fieldIndex("rho")))
  }

  private def runsTest(rows: Seq[(String, String, Long)]) =
    core.TrendQueries.runsTestOn(daily(rows)).collect()

  test("runs test: hand-computed z on alternating and clustered series") {
    // 1,9,1,9: median2 = 10, 4 runs of n1=n2=2 -> mu=3, var=2/3
    val alt = runsTest(Seq(("a", "2024-01-01", 1L), ("a", "2024-01-02", 9L),
      ("a", "2024-01-03", 1L), ("a", "2024-01-04", 9L))).head
    assert(alt.getAs[Long]("n_above") == 2L && alt.getAs[Long]("n_below") == 2L)
    assert(alt.getAs[Long]("n_runs") == 4L)
    assert(alt.getAs[Double]("z") == (4.0 - 3.0) / math.sqrt(2.0 / 3.0))
    // 1,1,1,9,9,9: 2 runs of n1=n2=3 -> mu=4, var=1.2, z<0 (clustered
    // but short of 1.96 at this length)
    val clu = runsTest(Seq(("a", "2024-01-01", 1L), ("a", "2024-01-02", 1L),
      ("a", "2024-01-03", 1L), ("a", "2024-01-04", 9L),
      ("a", "2024-01-05", 9L), ("a", "2024-01-06", 9L))).head
    assert(clu.getAs[Long]("n_runs") == 2L)
    assert(clu.getAs[Double]("z") == (2.0 - 4.0) / math.sqrt(1.2))
    assert(clu.getAs[String]("pattern") == "random")
  }

  test("runs test: long regimes flag clustered; median-tied days drop") {
    val regimes = runsTest((1 to 15).map(i => ("a", f"2024-01-$i%02d", 1L)) ++
      (16 to 30).map(i => ("a", f"2024-01-$i%02d", 9L))).head
    assert(regimes.getAs[String]("pattern") == "clustered")
    // odd-length series 1,5,9: the 5 IS the median -> dropped; one run
    // each side
    val tied = runsTest(Seq(("a", "2024-01-01", 1L), ("a", "2024-01-02", 5L),
      ("a", "2024-01-03", 9L))).head
    assert(tied.getAs[Long]("n_above") == 1L && tied.getAs[Long]("n_below") == 1L)
    assert(tied.getAs[Long]("n_runs") == 2L)
    // all-equal series: everything ties the median -> undefined
    val flat = runsTest((1 to 5).map(i => ("a", f"2024-01-$i%02d", 7L)))
    assert(flat.isEmpty || flat.head.getAs[String]("pattern") == "undefined")
  }

  test("runs test served from streamed state == batch bit-for-bit") {
    val batch = core.TrendQueries.eventsRunsTest(spark, sf).collect().toSeq
    val served = streaming.ForecastServe.runsTestServed(spark, sf).collect().toSeq
    assert(batch == served && batch.nonEmpty)
  }

  test("spearman served from the count+value fold == batch bit-for-bit") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_sp_stream").toString
    val ev = Tables.events(spark, sf)
    // cut across days (event_id mod) so per-day count AND cents sums
    // must merge additively
    streaming.ForecastStream.dailyValuesFold(ev.filter($"event_id" % 2 === 0), dir, 0L)
    streaming.ForecastStream.dailyValuesFold(ev.filter($"event_id" % 2 === 1), dir, 1L)
    val served = streaming.ForecastStream.serveSpearman(spark, dir)
      .collect().map(_.toSeq).toSeq
    val batch = core.TrendQueries.eventsValueSpearman(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(served == batch && served.nonEmpty)
  }

  test("pettitt served from streamed state == batch bit-for-bit") {
    val batch = core.TrendQueries.eventsChangepointPettitt(spark, sf).collect().toSeq
    val served = streaming.ForecastServe.pettittServed(spark, sf).collect().toSeq
    assert(batch == served && batch.nonEmpty)
  }
}
