package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** §2 entry `events_ab_mannwhitney` — the NONPARAMETRIC A/B test beside
  * the Welch t (`events_ab_welch`): Mann–Whitney U from pooled ranks with
  * midrank tie handling and the ties-corrected normal approximation.
  * Welch compares MEANS and leans on a normality/finite-variance story a
  * revenue-style `value` column rarely honors; U compares the whole
  * distributions (P(X > Y) ≠ 1/2) and a single whale user cannot move it
  * — the screen you quote when the t-test's assumptions are in doubt.
  * Same experiment framing as Welch: arms by `user_id % 2`, one test per
  * event type. Reference semantics: the A/B readout over the reference's
  * per-event value rollups (gold_ddl.sql engagement marts).
  *
  * Scale shape: ONE partial-agg corpus pass collapses events to the
  * (event_type, value) grain with per-arm counts — values are cents on a
  * DECIMAL(10,2) grid, so this frame is DOMAIN-bounded (≤ types×distinct
  * cents rows) regardless of corpus size, and every rank statistic is
  * computed on it, never on raw rows. The running-rank window partitions
  * by event_type over that bounded frame (the bounded-aggregate window
  * discipline — never a global sort of the corpus).
  *
  * Exactness (hash-gate): ranks enter only through the TIE-GROUP identity
  * — every row in a group of t equal values spanning ranks
  * [before+1, before+t] gets midrank (2·before + t + 1)/2, so DOUBLE-RANKS
  * (2×midrank) are pure BIGINTs and the rank-sum R2a = Σ c_a·(2·before+t+1)
  * is exact integer arithmetic; U enters as 2U_a = R2a − n_a(n_a+1).
  * The tie-corrected variance and z add three divides, one sqrt and one
  * product chain of correctly-rounded doubles mirrored token for token in
  * the DuckDB oracle. Degenerate edges (an empty arm, every value tied,
  * n ≤ 1) drive var_u ≤ 0 → NULL z in BOTH engines. Bounds: the rank sum
  * R2a ≤ 2·n² stays BIGINT — exact to n ≈ 2·10⁹ rows per event type; the
  * CUBIC tie term Σ(t³−t) would overflow BIGINT at a single tie group of
  * ~2.1M rows (t³ > 2⁶³ — realistic for a dominant cents price point), so
  * it is summed in DECIMAL(38,0) / HUGEINT (the §5 device) from the
  * start — exact to t ≈ 4.6·10¹², the same plan shape.
  */
object RankTests {

  /** Shared core over a (event_type, arm, y_c) event frame — arm ∈ {0,1},
    * y_c the exact integer value grid. Used by the entry and the specs.
    */
  private[graft] def mannWhitneyOn(ev: DataFrame): DataFrame = {
    import ev.sparkSession.implicits._
    // Value-grain collapse: one corpus pass, domain-bounded output.
    mannWhitneyFromHist(ev.groupBy($"event_type", $"y_c").agg(
      sum(when($"arm" === 0, 1L).otherwise(0L)).as("c_a"),
      sum(when($"arm" === 1, 1L).otherwise(0L)).as("c_b")))
  }

  /** The U statistic from an already-collapsed (event_type, y_c, c_a,
    * c_b) value histogram — the shape the streaming A/B state serves
    * (histogram counts are mergeable by addition, so streamed == batch
    * is bit-exact through this shared core).
    */
  private[graft] def mannWhitneyFromHist(hist: DataFrame): DataFrame = {
    import hist.sparkSession.implicits._
    val grouped = hist.withColumn("t", $"c_a" + $"c_b")
    // Pooled rows strictly below this value group (running sum over the
    // bounded per-type frame); the first group's empty frame is 0.
    val w = Window.partitionBy($"event_type").orderBy($"y_c")
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = grouped.withColumn("below", coalesce(sum($"t").over(w), lit(0L)))
    val agg = ranked.groupBy($"event_type").agg(
      sum($"c_a").as("n_a"),
      sum($"c_b").as("n_b"),
      // Σ over arm-A rows of 2×midrank — exact BIGINT rank-sum.
      sum($"c_a" * (lit(2L) * $"below" + $"t" + 1L)).as("r2_a"),
      // Σ (t³ − t) over tie groups — the variance correction numerator.
      // DECIMAL(38,0): t³ outruns BIGINT once one tie group tops ~2.1M
      // rows; the decimal sum is exact to t ≈ 4.6·10¹².
      sum($"t".cast("decimal(38,0)") * $"t" * $"t" - $"t").as("tie_term"))
    val nanb = $"n_a" * $"n_b"
    val nD = ($"n_a" + $"n_b").cast("double")
    // var_U = (n_a·n_b / 12) · ((N+1) − Σ(t³−t)/(N(N−1))) — the exact
    // double expression tree the oracle mirrors; ≤ 0 (empty arm or all
    // values tied) voids the normal approximation → NULL z.
    val varU = nanb.cast("double") / 12.0 *
      ((nD + 1.0) - $"tie_term".cast("double") / (nD * (nD - 1.0)))
    agg
      .withColumn("u2_a", $"r2_a" - $"n_a" * ($"n_a" + 1L))
      .withColumn("u2_b", lit(2L) * nanb - $"u2_a")
      .withColumn("u_a", $"u2_a".cast("double") / 2.0)
      .withColumn("u_b", $"u2_b".cast("double") / 2.0)
      .withColumn("var_u", varU)
      .withColumn("z",
        when($"var_u" > 0.0,
          ($"u2_a" - nanb).cast("double") / (lit(2.0) * sqrt($"var_u"))))
      .withColumn("significant",
        when($"z".isNull, lit(null).cast("boolean")).otherwise(abs($"z") > 1.96))
      .select($"event_type", $"n_a", $"n_b", $"u_a", $"u_b",
        $"var_u", $"z", $"significant")
      .orderBy($"event_type")
  }

  def eventsAbMannWhitney(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select($"event_type", pmod($"user_id", lit(2)).as("arm"),
        ($"value".cast("decimal(10,2)") * 100).cast("long").as("y_c"))
    mannWhitneyOn(ev)
  }

  val eventsAbMannWhitneySql: String =
    """WITH ev AS (
      |  SELECT event_type, user_id % 2 AS arm,
      |    CAST(CAST(value AS DECIMAL(10,2)) * 100 AS BIGINT) AS y_c
      |  FROM events
      |), grouped AS (
      |  SELECT event_type, y_c,
      |    CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c_a,
      |    CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c_b
      |  FROM ev GROUP BY 1, 2
      |), ranked AS (
      |  SELECT event_type, c_a, c_b, c_a + c_b AS t,
      |    COALESCE(SUM(c_a + c_b) OVER (PARTITION BY event_type ORDER BY y_c
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
      |  FROM grouped
      |), agg AS (
      |  SELECT event_type,
      |    CAST(SUM(c_a) AS BIGINT) AS n_a,
      |    CAST(SUM(c_b) AS BIGINT) AS n_b,
      |    CAST(SUM(c_a * (2 * below + t + 1)) AS BIGINT) AS r2_a,
      |    SUM(CAST(t AS HUGEINT) * t * t - t) AS tie_term
      |  FROM ranked GROUP BY 1
      |), d AS (
      |  SELECT event_type, n_a, n_b,
      |    r2_a - n_a * (n_a + 1) AS u2_a,
      |    2 * n_a * n_b - (r2_a - n_a * (n_a + 1)) AS u2_b,
      |    CAST(n_a * n_b AS DOUBLE) / 12.0 *
      |      ((CAST(n_a + n_b AS DOUBLE) + 1.0)
      |        - CAST(tie_term AS DOUBLE)
      |          / (CAST(n_a + n_b AS DOUBLE) * (CAST(n_a + n_b AS DOUBLE) - 1.0)))
      |      AS var_u
      |  FROM agg
      |), z AS (
      |  SELECT event_type, n_a, n_b,
      |    CAST(u2_a AS DOUBLE) / 2.0 AS u_a,
      |    CAST(u2_b AS DOUBLE) / 2.0 AS u_b,
      |    var_u,
      |    CASE WHEN var_u > 0.0
      |      THEN CAST(u2_a - n_a * n_b AS DOUBLE) / (2.0 * sqrt(var_u))
      |      ELSE NULL END AS z
      |  FROM d
      |)
      |SELECT event_type, n_a, n_b, u_a, u_b, var_u, z,
      |  CASE WHEN z IS NULL THEN NULL ELSE abs(z) > 1.96 END AS significant
      |FROM z
      |ORDER BY event_type""".stripMargin

  /** §2 entry `events_ab_proportions` — the TWO-PROPORTION z-test
    * completing the A/B trio (Welch compares means, Mann–Whitney whole
    * distributions, this compares CONVERSION RATES — the binary metric
    * most experiments actually ship on): per event type, the share of
    * users who emitted that event at all, arms by the same user-parity
    * hash, pooled-variance normal approximation.
    *
    * Scale shape: two partial-agg DISTINCT collapses of the corpus (the
    * user grain for denominators — ONE 1-row conditional aggregate
    * crossed in as a broadcast scalar row — and the (type, user) grain
    * for numerators), both map-side-combined; everything after runs on
    * ≤ |types| rows. Exactness: counts are exact BIGINTs; p̂, the pooled
    * rate, the variance product chain and z are one fixed
    * correctly-rounded double tree mirrored token for token; a pooled
    * rate of exactly 0 or 1 (or an empty arm) zeroes the variance →
    * NULL z in BOTH engines.
    */
  def eventsAbProportions(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    abProportionsOn(Tables.events(spark, dir)
      .select($"event_type", $"user_id", pmod($"user_id", lit(2)).as("arm")))
  }

  /** The test over a caller-supplied (event_type, user_id, arm) frame —
    * split out for the planted specs.
    */
  private[graft] def abProportionsOn(ev: DataFrame): DataFrame = {
    import ev.sparkSession.implicits._
    // Denominators: distinct users per arm over the whole corpus.
    val totals = ev.select($"user_id", $"arm").distinct().agg(
      sum(when($"arm" === 0, 1L).otherwise(0L)).as("n_a"),
      sum(when($"arm" === 1, 1L).otherwise(0L)).as("n_b"))
    // Numerators: distinct converting users per (type, arm).
    val conv = ev.select($"event_type", $"user_id", $"arm").distinct()
      .groupBy($"event_type").agg(
        sum(when($"arm" === 0, 1L).otherwise(0L)).as("x_a"),
        sum(when($"arm" === 1, 1L).otherwise(0L)).as("x_b"))
    val naD = $"n_a".cast("double")
    val nbD = $"n_b".cast("double")
    val pool = ($"x_a" + $"x_b").cast("double") / ($"n_a" + $"n_b").cast("double")
    val varZ = pool * (lit(1.0) - pool) * (lit(1.0) / naD + lit(1.0) / nbD)
    conv.crossJoin(broadcast(totals))
      .withColumn("p_a", when($"n_a" > 0L, $"x_a".cast("double") / naD))
      .withColumn("p_b", when($"n_b" > 0L, $"x_b".cast("double") / nbD))
      .withColumn("var_z", when($"n_a" > 0L && $"n_b" > 0L, varZ))
      .withColumn("z", when($"var_z" > 0.0, ($"p_a" - $"p_b") / sqrt($"var_z")))
      .withColumn("significant",
        when($"z".isNull, lit(null).cast("boolean")).otherwise(abs($"z") > 1.96))
      .select($"event_type", $"n_a", $"n_b", $"x_a", $"x_b",
        $"p_a", $"p_b", $"z", $"significant")
      .orderBy($"event_type")
  }

  val eventsAbProportionsSql: String =
    """WITH ev AS (
      |  SELECT event_type, user_id, user_id % 2 AS arm FROM events
      |), totals AS (
      |  SELECT
      |    CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
      |    CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
      |  FROM (SELECT DISTINCT user_id, arm FROM ev)
      |), conv AS (
      |  SELECT event_type,
      |    CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS x_a,
      |    CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS x_b
      |  FROM (SELECT DISTINCT event_type, user_id, arm FROM ev)
      |  GROUP BY 1
      |), d AS (
      |  SELECT c.event_type, t.n_a, t.n_b, c.x_a, c.x_b,
      |    CASE WHEN t.n_a > 0
      |      THEN CAST(c.x_a AS DOUBLE) / CAST(t.n_a AS DOUBLE) END AS p_a,
      |    CASE WHEN t.n_b > 0
      |      THEN CAST(c.x_b AS DOUBLE) / CAST(t.n_b AS DOUBLE) END AS p_b,
      |    CASE WHEN t.n_a > 0 AND t.n_b > 0 THEN
      |      (CAST(c.x_a + c.x_b AS DOUBLE) / CAST(t.n_a + t.n_b AS DOUBLE))
      |      * (1.0 - CAST(c.x_a + c.x_b AS DOUBLE) / CAST(t.n_a + t.n_b AS DOUBLE))
      |      * (1.0 / CAST(t.n_a AS DOUBLE) + 1.0 / CAST(t.n_b AS DOUBLE))
      |    END AS var_z
      |  FROM conv c CROSS JOIN totals t
      |), z AS (
      |  SELECT event_type, n_a, n_b, x_a, x_b, p_a, p_b,
      |    CASE WHEN var_z > 0.0 THEN (p_a - p_b) / sqrt(var_z) END AS z
      |  FROM d
      |)
      |SELECT event_type, n_a, n_b, x_a, x_b, p_a, p_b, z,
      |  CASE WHEN z IS NULL THEN NULL ELSE abs(z) > 1.96 END AS significant
      |FROM z
      |ORDER BY event_type""".stripMargin

  /** §2 entry `events_ab_ks` — the two-sample KOLMOGOROV–SMIRNOV test
    * completing the distribution-shape axis of the A/B family: Welch
    * compares means, Mann–Whitney stochastic order, the proportions z
    * conversion, and KS the ENTIRE distribution — D = sup |F̂_a − F̂_b|
    * catches a variance or tail change the other three are blind to
    * (same mean, same median, different spread). Same experiment
    * framing: arms by user parity, one test per event type, values on
    * the cents grid. Reference semantics: the distribution-shift screen
    * over the reference's per-event value rollups (gold_ddl.sql).
    *
    * Scale shape: the SAME domain-bounded (event_type, y_c, c_a, c_b)
    * value histogram the Mann–Whitney entry collapses to (one corpus
    * pass; ≤ types×cents rows) — both ECDFs are running sums over that
    * bounded frame, windows partitioned per type. The streaming A/B
    * state serves this too ([[graft.streaming.AbStream]]): histogram
    * counts are the sufficient statistic for all four tests.
    *
    * Exactness (hash-gate): the sup gap enters as the INTEGER
    * cross-multiplied form max |cum_a·n_b − cum_b·n_a| (ECDF steps only
    * move at histogram rows, so the max over distinct values IS the
    * sup) — exact BIGINT to n_a·n_b < 2⁶³ (~3·10⁹ rows per arm per
    * type; past that the products move to DECIMAL(38,0), plan
    * unchanged); D and the α=0.05 rejection bound c·√((n_a+n_b)/
    * (n_a·n_b)) add two divides and one sqrt of correctly-rounded
    * doubles mirrored token for token. c = √(−ln(0.025)/2) enters as a
    * literal on BOTH engines (the literal-weights discipline —
    * RankTestsSpec re-derives it from math.log). An empty arm voids D
    * and the verdict → NULL in both engines.
    */
  private[graft] val KsCoeff05 = 1.3581015157406195 // sqrt(-ln(0.025)/2)

  private[graft] def ksFromHist(hist: DataFrame): DataFrame = {
    import hist.sparkSession.implicits._
    val wCum = Window.partitionBy($"event_type").orderBy($"y_c")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy($"event_type")
    val cum = hist
      .withColumn("cum_a", sum($"c_a").over(wCum))
      .withColumn("cum_b", sum($"c_b").over(wCum))
      .withColumn("n_a", sum($"c_a").over(wAll))
      .withColumn("n_b", sum($"c_b").over(wAll))
    val agg = cum.groupBy($"event_type").agg(
      max($"n_a").as("n_a"), max($"n_b").as("n_b"),
      max(abs($"cum_a" * $"n_b" - $"cum_b" * $"n_a")).as("gap"))
    val nanb = $"n_a" * $"n_b"
    agg
      .withColumn("d",
        when(nanb > 0L, $"gap".cast("double") / nanb.cast("double")))
      .withColumn("d_crit",
        when(nanb > 0L, lit(KsCoeff05) *
          sqrt(($"n_a" + $"n_b").cast("double") / nanb.cast("double"))))
      .withColumn("significant",
        when($"d".isNull, lit(null).cast("boolean")).otherwise($"d" > $"d_crit"))
      .select($"event_type", $"n_a", $"n_b", $"d", $"d_crit", $"significant")
      .orderBy($"event_type")
  }

  def eventsAbKs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select($"event_type", pmod($"user_id", lit(2)).as("arm"),
        ($"value".cast("decimal(10,2)") * 100).cast("long").as("y_c"))
    ksFromHist(ev.groupBy($"event_type", $"y_c").agg(
      sum(when($"arm" === 0, 1L).otherwise(0L)).as("c_a"),
      sum(when($"arm" === 1, 1L).otherwise(0L)).as("c_b")))
  }

  val eventsAbKsSql: String =
    s"""WITH ev AS (
      |  SELECT event_type, user_id % 2 AS arm,
      |    CAST(CAST(value AS DECIMAL(10,2)) * 100 AS BIGINT) AS y_c
      |  FROM events
      |), grouped AS (
      |  SELECT event_type, y_c,
      |    CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c_a,
      |    CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c_b
      |  FROM ev GROUP BY 1, 2
      |), cum AS (
      |  SELECT event_type,
      |    SUM(c_a) OVER (PARTITION BY event_type ORDER BY y_c
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_a,
      |    SUM(c_b) OVER (PARTITION BY event_type ORDER BY y_c
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_b,
      |    SUM(c_a) OVER (PARTITION BY event_type) AS n_a,
      |    SUM(c_b) OVER (PARTITION BY event_type) AS n_b
      |  FROM grouped
      |), agg AS (
      |  SELECT event_type,
      |    CAST(MAX(n_a) AS BIGINT) AS n_a,
      |    CAST(MAX(n_b) AS BIGINT) AS n_b,
      |    CAST(MAX(ABS(cum_a * n_b - cum_b * n_a)) AS BIGINT) AS gap
      |  FROM cum GROUP BY 1
      |), d AS (
      |  SELECT event_type, n_a, n_b,
      |    CASE WHEN n_a * n_b > 0
      |      THEN CAST(gap AS DOUBLE) / CAST(n_a * n_b AS DOUBLE) END AS d,
      |    CASE WHEN n_a * n_b > 0
      |      THEN $KsCoeff05 *
      |        sqrt(CAST(n_a + n_b AS DOUBLE) / CAST(n_a * n_b AS DOUBLE))
      |      END AS d_crit
      |  FROM agg
      |)
      |SELECT event_type, n_a, n_b, d, d_crit,
      |  CASE WHEN d IS NULL THEN NULL ELSE d > d_crit END AS significant
      |FROM d
      |ORDER BY event_type""".stripMargin

  /** §2 entry `events_ab_kruskal` — KRUSKAL–WALLIS H, the rank test for
    * MORE than two arms (the one-way ANOVA's nonparametric twin): three
    * variant arms by `user_id % 3`, one test per event type, H from
    * pooled midranks with the ties correction. Mann–Whitney answers
    * "did B move vs A"; this answers "do ANY of the k variants differ"
    * without k² pairwise tests inflating the false-positive rate — the
    * gate you run BEFORE drilling into pairs. Reference semantics: the
    * multi-variant readout over the same per-event value rollups.
    *
    * Scale shape: the Mann–Whitney discipline with a third counter —
    * ONE corpus pass to the domain-bounded (type, y_c, c_0, c_1, c_2)
    * histogram, ranks from the same per-type running-sum window.
    *
    * Exactness (hash-gate): per-arm DOUBLE-rank sums r2_i = Σ c_i·
    * (2·below + t + 1) are exact BIGINTs (≤ 2n², the MW bound); the
    * squared sums enter H via DECIMAL(38,0)/HUGEINT products (r2²
    * outruns BIGINT past n ≈ 55k rows per type — sf0.01 already
    * crosses it); the cubic tie term is the MW DECIMAL device. H's
    * double tree — 12/(N(N+1))·Σ r2_i²/(4n_i) − 3(N+1), all over the
    * tie correction 1 − Σ(t³−t)/(N³−N) — is mirrored token for token.
    * χ²(df=2, α=0.05) enters as the literal −2·ln(0.05) (the df=2 CDF
    * is 1 − e^(−x/2)), re-derived in RankTestsSpec. Edges: N < 2 or an all-tied pool →
    * NULL h; an EMPTY arm shifts df, so the 3-arm verdict is only
    * emitted when all three arms are populated (NULL otherwise) — both
    * engines agree.
    */
  private[graft] val KwChi2Df2Crit = 5.991464547107982 // -2*ln(0.05)

  private[graft] def kruskalOn(ev: DataFrame): DataFrame = {
    import ev.sparkSession.implicits._
    val hist = ev.groupBy($"event_type", $"y_c").agg(
      sum(when($"arm" === 0, 1L).otherwise(0L)).as("c_0"),
      sum(when($"arm" === 1, 1L).otherwise(0L)).as("c_1"),
      sum(when($"arm" === 2, 1L).otherwise(0L)).as("c_2"))
    val grouped = hist.withColumn("t", $"c_0" + $"c_1" + $"c_2")
    val w = Window.partitionBy($"event_type").orderBy($"y_c")
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = grouped.withColumn("below", coalesce(sum($"t").over(w), lit(0L)))
    val agg = ranked.groupBy($"event_type").agg(
      sum($"c_0").as("n_0"), sum($"c_1").as("n_1"), sum($"c_2").as("n_2"),
      sum($"c_0" * (lit(2L) * $"below" + $"t" + 1L)).as("r2_0"),
      sum($"c_1" * (lit(2L) * $"below" + $"t" + 1L)).as("r2_1"),
      sum($"c_2" * (lit(2L) * $"below" + $"t" + 1L)).as("r2_2"),
      sum($"t".cast("decimal(38,0)") * $"t" * $"t" - $"t").as("tie_term"))
    val nTot = $"n_0" + $"n_1" + $"n_2"
    val nD = nTot.cast("double")
    def term(i: Int): Column = when(col(s"n_$i") > 0L,
      (col(s"r2_$i").cast("decimal(38,0)") * col(s"r2_$i")).cast("double")
        / (lit(4.0) * col(s"n_$i").cast("double"))).otherwise(lit(0.0))
    val hRaw = lit(12.0) / (nD * (nD + 1.0)) * (term(0) + term(1) + term(2)) -
      lit(3.0) * (nD + 1.0)
    val corr = lit(1.0) - $"tie_term".cast("double") / (nD * nD * nD - nD)
    agg
      .withColumn("h", when(nTot >= lit(2L) && corr > 0.0, hRaw / corr))
      .withColumn("significant",
        when($"h".isNull || $"n_0" === 0L || $"n_1" === 0L || $"n_2" === 0L,
          lit(null).cast("boolean"))
          .otherwise($"h" > KwChi2Df2Crit))
      .select($"event_type", $"n_0", $"n_1", $"n_2", $"h", $"significant")
      .orderBy($"event_type")
  }

  def eventsAbKruskal(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    kruskalOn(Tables.events(spark, dir)
      .select($"event_type", pmod($"user_id", lit(3)).as("arm"),
        ($"value".cast("decimal(10,2)") * 100).cast("long").as("y_c")))
  }

  val eventsAbKruskalSql: String =
    s"""WITH ev AS (
      |  SELECT event_type, user_id % 3 AS arm,
      |    CAST(CAST(value AS DECIMAL(10,2)) * 100 AS BIGINT) AS y_c
      |  FROM events
      |), grouped AS (
      |  SELECT event_type, y_c,
      |    CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c_0,
      |    CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c_1,
      |    CAST(SUM(CASE WHEN arm = 2 THEN 1 ELSE 0 END) AS BIGINT) AS c_2
      |  FROM ev GROUP BY 1, 2
      |), ranked AS (
      |  SELECT event_type, c_0, c_1, c_2, c_0 + c_1 + c_2 AS t,
      |    COALESCE(SUM(c_0 + c_1 + c_2) OVER (PARTITION BY event_type
      |      ORDER BY y_c
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
      |  FROM grouped
      |), agg AS (
      |  SELECT event_type,
      |    CAST(SUM(c_0) AS BIGINT) AS n_0,
      |    CAST(SUM(c_1) AS BIGINT) AS n_1,
      |    CAST(SUM(c_2) AS BIGINT) AS n_2,
      |    CAST(SUM(c_0 * (2 * below + t + 1)) AS BIGINT) AS r2_0,
      |    CAST(SUM(c_1 * (2 * below + t + 1)) AS BIGINT) AS r2_1,
      |    CAST(SUM(c_2 * (2 * below + t + 1)) AS BIGINT) AS r2_2,
      |    SUM(CAST(t AS HUGEINT) * t * t - t) AS tie_term
      |  FROM ranked GROUP BY 1
      |), d AS (
      |  SELECT event_type, n_0, n_1, n_2,
      |    CAST(n_0 + n_1 + n_2 AS DOUBLE) AS n_d,
      |    n_0 + n_1 + n_2 AS n_tot,
      |    (CASE WHEN n_0 > 0 THEN CAST(CAST(r2_0 AS HUGEINT) * r2_0 AS DOUBLE)
      |        / (4.0 * CAST(n_0 AS DOUBLE)) ELSE 0.0 END
      |     + CASE WHEN n_1 > 0 THEN CAST(CAST(r2_1 AS HUGEINT) * r2_1 AS DOUBLE)
      |        / (4.0 * CAST(n_1 AS DOUBLE)) ELSE 0.0 END
      |     + CASE WHEN n_2 > 0 THEN CAST(CAST(r2_2 AS HUGEINT) * r2_2 AS DOUBLE)
      |        / (4.0 * CAST(n_2 AS DOUBLE)) ELSE 0.0 END) AS terms,
      |    CAST(tie_term AS DOUBLE) AS tie_d
      |  FROM agg
      |), h AS (
      |  SELECT event_type, n_0, n_1, n_2,
      |    CASE WHEN n_tot >= 2
      |        AND 1.0 - tie_d / (n_d * n_d * n_d - n_d) > 0.0
      |      THEN (12.0 / (n_d * (n_d + 1.0)) * terms - 3.0 * (n_d + 1.0))
      |        / (1.0 - tie_d / (n_d * n_d * n_d - n_d))
      |      END AS h
      |  FROM d
      |)
      |SELECT event_type, n_0, n_1, n_2, h,
      |  CASE WHEN h IS NULL OR n_0 = 0 OR n_1 = 0 OR n_2 = 0 THEN NULL
      |    ELSE h > $KwChi2Df2Crit END AS significant
      |FROM h
      |ORDER BY event_type""".stripMargin

  /** §2 entry `events_ab_cuped` — CUPED variance reduction, the device
    * every production experimentation platform runs before reading a
    * t-test: each user's PRE-period spend is a covariate that explains
    * away between-user variance, so the adjusted metric y' = y − θ·x
    * (θ the pooled cov(x,y)/var(x)) keeps the treatment effect but
    * shrinks the noise by the pre/post correlation ρ² — the same
    * experiment reads significant days earlier, or a too-small lift
    * honestly stays null. The entry reports BOTH the plain Welch z and
    * the CUPED z plus the realized variance-reduction ρ², so the win
    * is visible in the row. Calendar split: first half of the corpus's
    * day span is "pre", second half the experiment window; arms by the
    * house user parity.
    *
    * Scale shape: ONE corpus pass to the (type, user, arm, pre, post)
    * grain (two conditional sums — no second scan for the covariate),
    * then one partial-agg moment collapse per type: 12 sufficient
    * statistics, ≤ types rows after. The day-span cutoff is the one
    * driver-side scalar (the RecEval device). θ, ρ², adjusted means /
    * variances and both z's are fixed double trees over the exact
    * sums, mirrored token for token.
    *
    * Exactness (hash-gate): per-user cents sums are BIGINT; the FIVE
    * second-moment sums (x², y², xy per arm pooled) are DECIMAL(38,0)
    * / HUGEINT — a user's cents² already tops 2⁶³ at ~$3M lifetime
    * spend, so BIGINT was never an option. Degenerate edges: var(x) ≤
    * 0 → θ = 0 (CUPED degrades to plain Welch, both engines); an arm
    * with n ≤ 1 → NULL variance → NULL z → NULL verdict; var(y) ≤ 0 →
    * NULL ρ².
    */
  /** The 12 CUPED sufficient-statistic aggregates over a per-user
    * (arm, x, y) frame — shared by the fixed-horizon entry and the
    * group-sequential CUPED monitor (whose grouping adds `look`).
    */
  private def cupedMomentAggs: Seq[Column] = {
    val dec0 = lit(0L).cast("decimal(38,0)")
    val (arm, x, y) = (col("arm"), col("x"), col("y"))
    Seq(
      sum(when(arm === 0, 1L).otherwise(0L)).as("n_a"),
      sum(when(arm === 1, 1L).otherwise(0L)).as("n_b"),
      sum(when(arm === 0, x).otherwise(0L)).as("sx_a"),
      sum(when(arm === 1, x).otherwise(0L)).as("sx_b"),
      sum(when(arm === 0, y).otherwise(0L)).as("sy_a"),
      sum(when(arm === 1, y).otherwise(0L)).as("sy_b"),
      sum(when(arm === 0, x.cast("decimal(38,0)") * x).otherwise(dec0)).as("sxx_a"),
      sum(when(arm === 1, x.cast("decimal(38,0)") * x).otherwise(dec0)).as("sxx_b"),
      sum(when(arm === 0, y.cast("decimal(38,0)") * y).otherwise(dec0)).as("syy_a"),
      sum(when(arm === 1, y.cast("decimal(38,0)") * y).otherwise(dec0)).as("syy_b"),
      sum(when(arm === 0, x.cast("decimal(38,0)") * y).otherwise(dec0)).as("sxy_a"),
      sum(when(arm === 1, x.cast("decimal(38,0)") * y).otherwise(dec0)).as("sxy_b"))
  }

  /** Appends theta / var_reduction / z_plain / z_cuped to a frame
    * carrying the 12 CUPED sufficient statistics; grouping keys (the
    * fixed-horizon entry's event_type, the sequential monitor's
    * (event_type, look)) ride through untouched.
    */
  private def withCupedZ(m: DataFrame): DataFrame = {
    import m.sparkSession.implicits._
    val nD  = ($"n_a" + $"n_b").cast("double")
    val sxD = ($"sx_a" + $"sx_b").cast("double")
    val syD = ($"sy_a" + $"sy_b").cast("double")
    val sxxD = ($"sxx_a" + $"sxx_b").cast("double")
    val syyD = ($"syy_a" + $"syy_b").cast("double")
    val sxyD = ($"sxy_a" + $"sxy_b").cast("double")
    val dxx = nD * sxxD - sxD * sxD
    val dyy = nD * syyD - syD * syD
    val naD = $"n_a".cast("double")
    val nbD = $"n_b".cast("double")
    def armZ(theta: Column): Column = {
      def meanOf(n: Column, nd: Column, sx: Column, sy: Column) =
        when(n > 0L, (sy.cast("double") - theta * sx.cast("double")) / nd)
      def varOf(n: Column, nd: Column, sx: Column, sy: Column,
          sxx: Column, syy: Column, sxy: Column) = {
        val sAdj = sy.cast("double") - theta * sx.cast("double")
        val qAdj = syy.cast("double") - lit(2.0) * theta * sxy.cast("double") +
          theta * theta * sxx.cast("double")
        when(n > 1L, (nd * qAdj - sAdj * sAdj) / (nd * (nd - 1.0)))
      }
      val ma = meanOf($"n_a", naD, $"sx_a", $"sy_a")
      val mb = meanOf($"n_b", nbD, $"sx_b", $"sy_b")
      val va = varOf($"n_a", naD, $"sx_a", $"sy_a", $"sxx_a", $"syy_a", $"sxy_a")
      val vb = varOf($"n_b", nbD, $"sx_b", $"sy_b", $"sxx_b", $"syy_b", $"sxy_b")
      (ma - mb) / sqrt(va / naD + vb / nbD)
    }
    m
      .withColumn("theta",
        when(dxx > 0.0, (nD * sxyD - sxD * syD) / dxx).otherwise(lit(0.0)))
      .withColumn("var_reduction",
        when(dxx > 0.0 && dyy > 0.0,
          (nD * sxyD - sxD * syD) * (nD * sxyD - sxD * syD) / (dxx * dyy)))
      .withColumn("z_plain", armZ(lit(0.0)))
      .withColumn("z_cuped", armZ($"theta"))
  }

  private[graft] def cupedOn(ev: DataFrame, cut: Column): DataFrame = {
    import ev.sparkSession.implicits._
    val pu = ev.groupBy($"event_type", $"user_id", $"arm").agg(
      sum(when($"day" <= cut, $"y_c").otherwise(0L)).as("x"),
      sum(when($"day" > cut, $"y_c").otherwise(0L)).as("y"))
    val m = pu.groupBy($"event_type")
      .agg(cupedMomentAggs.head, cupedMomentAggs.tail: _*)
    withCupedZ(m)
      .withColumn("significant",
        when($"z_cuped".isNull, lit(null).cast("boolean"))
          .otherwise(abs($"z_cuped") > 1.96))
      .select($"event_type", $"n_a", $"n_b", $"theta", $"var_reduction",
        $"z_plain", $"z_cuped", $"significant")
      .orderBy($"event_type")
  }

  def eventsAbCuped(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select($"event_type", $"user_id", pmod($"user_id", lit(2)).as("arm"),
        to_date($"ts").as("day"),
        ($"value".cast("decimal(10,2)") * 100).cast("long").as("y_c"))
    // the one driver-side scalar (the RecEval cutoff device): pre =
    // first half of the corpus's day span
    val b = ev.agg(min($"day").as("mn"), max($"day").as("mx")).head()
    val cut = if (b.isNullAt(0)) java.sql.Date.valueOf("1970-01-01") else {
      val mn = b.getDate(0).toLocalDate
      val span = java.time.temporal.ChronoUnit.DAYS
        .between(mn, b.getDate(1).toLocalDate)
      java.sql.Date.valueOf(mn.plusDays(span / 2))
    }
    cupedOn(ev, lit(cut))
  }

  val eventsAbCupedSql: String =
    """WITH ev AS (
      |  SELECT event_type, user_id, user_id % 2 AS arm,
      |    CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
      |    CAST(CAST(value AS DECIMAL(10,2)) * 100 AS BIGINT) AS y_c
      |  FROM events
      |), bounds AS (
      |  SELECT MIN(day) AS mn, MAX(day) AS mx FROM ev
      |), cut AS (
      |  SELECT mn + CAST(date_diff('day', mn, mx) // 2 AS INTEGER) AS cutoff
      |  FROM bounds
      |), pu AS (
      |  SELECT event_type, user_id, arm,
      |    CAST(SUM(CASE WHEN day <= (SELECT cutoff FROM cut) THEN y_c ELSE 0 END)
      |      AS BIGINT) AS x,
      |    CAST(SUM(CASE WHEN day > (SELECT cutoff FROM cut) THEN y_c ELSE 0 END)
      |      AS BIGINT) AS y
      |  FROM ev GROUP BY 1, 2, 3
      |), m AS (
      |  SELECT event_type,
      |    CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
      |    CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
      |    CAST(SUM(CASE WHEN arm = 0 THEN x ELSE 0 END) AS BIGINT) AS sx_a,
      |    CAST(SUM(CASE WHEN arm = 1 THEN x ELSE 0 END) AS BIGINT) AS sx_b,
      |    CAST(SUM(CASE WHEN arm = 0 THEN y ELSE 0 END) AS BIGINT) AS sy_a,
      |    CAST(SUM(CASE WHEN arm = 1 THEN y ELSE 0 END) AS BIGINT) AS sy_b,
      |    SUM(CASE WHEN arm = 0 THEN CAST(x AS HUGEINT) * x ELSE 0 END) AS sxx_a,
      |    SUM(CASE WHEN arm = 1 THEN CAST(x AS HUGEINT) * x ELSE 0 END) AS sxx_b,
      |    SUM(CASE WHEN arm = 0 THEN CAST(y AS HUGEINT) * y ELSE 0 END) AS syy_a,
      |    SUM(CASE WHEN arm = 1 THEN CAST(y AS HUGEINT) * y ELSE 0 END) AS syy_b,
      |    SUM(CASE WHEN arm = 0 THEN CAST(x AS HUGEINT) * y ELSE 0 END) AS sxy_a,
      |    SUM(CASE WHEN arm = 1 THEN CAST(x AS HUGEINT) * y ELSE 0 END) AS sxy_b
      |  FROM pu GROUP BY 1
      |), d AS (
      |  SELECT event_type, n_a, n_b,
      |    CAST(n_a + n_b AS DOUBLE) AS n_d,
      |    CAST(n_a AS DOUBLE) AS na_d, CAST(n_b AS DOUBLE) AS nb_d,
      |    CAST(sx_a + sx_b AS DOUBLE) AS sx_d,
      |    CAST(sy_a + sy_b AS DOUBLE) AS sy_d,
      |    CAST(sxx_a + sxx_b AS DOUBLE) AS sxx_d,
      |    CAST(syy_a + syy_b AS DOUBLE) AS syy_d,
      |    CAST(sxy_a + sxy_b AS DOUBLE) AS sxy_d,
      |    CAST(sx_a AS DOUBLE) AS sxa, CAST(sx_b AS DOUBLE) AS sxb,
      |    CAST(sy_a AS DOUBLE) AS sya, CAST(sy_b AS DOUBLE) AS syb,
      |    CAST(sxx_a AS DOUBLE) AS sxxa, CAST(sxx_b AS DOUBLE) AS sxxb,
      |    CAST(syy_a AS DOUBLE) AS syya, CAST(syy_b AS DOUBLE) AS syyb,
      |    CAST(sxy_a AS DOUBLE) AS sxya, CAST(sxy_b AS DOUBLE) AS sxyb
      |  FROM m
      |), th AS (
      |  SELECT *,
      |    CASE WHEN n_d * sxx_d - sx_d * sx_d > 0.0
      |      THEN (n_d * sxy_d - sx_d * sy_d) / (n_d * sxx_d - sx_d * sx_d)
      |      ELSE 0.0 END AS theta,
      |    CASE WHEN n_d * sxx_d - sx_d * sx_d > 0.0
      |        AND n_d * syy_d - sy_d * sy_d > 0.0
      |      THEN (n_d * sxy_d - sx_d * sy_d) * (n_d * sxy_d - sx_d * sy_d)
      |        / ((n_d * sxx_d - sx_d * sx_d) * (n_d * syy_d - sy_d * sy_d))
      |      END AS var_reduction
      |  FROM d
      |), zz AS (
      |  SELECT event_type, n_a, n_b, theta, var_reduction,
      |    (CASE WHEN n_a > 0 THEN (sya - 0.0 * sxa) / na_d END
      |     - CASE WHEN n_b > 0 THEN (syb - 0.0 * sxb) / nb_d END)
      |    / sqrt(
      |      CASE WHEN n_a > 1 THEN (na_d * (syya - 2.0 * 0.0 * sxya
      |          + 0.0 * 0.0 * sxxa)
      |          - (sya - 0.0 * sxa) * (sya - 0.0 * sxa))
      |        / (na_d * (na_d - 1.0)) END / na_d
      |      + CASE WHEN n_b > 1 THEN (nb_d * (syyb - 2.0 * 0.0 * sxyb
      |          + 0.0 * 0.0 * sxxb)
      |          - (syb - 0.0 * sxb) * (syb - 0.0 * sxb))
      |        / (nb_d * (nb_d - 1.0)) END / nb_d) AS z_plain,
      |    (CASE WHEN n_a > 0 THEN (sya - theta * sxa) / na_d END
      |     - CASE WHEN n_b > 0 THEN (syb - theta * sxb) / nb_d END)
      |    / sqrt(
      |      CASE WHEN n_a > 1 THEN (na_d * (syya - 2.0 * theta * sxya
      |          + theta * theta * sxxa)
      |          - (sya - theta * sxa) * (sya - theta * sxa))
      |        / (na_d * (na_d - 1.0)) END / na_d
      |      + CASE WHEN n_b > 1 THEN (nb_d * (syyb - 2.0 * theta * sxyb
      |          + theta * theta * sxxb)
      |          - (syb - theta * sxb) * (syb - theta * sxb))
      |        / (nb_d * (nb_d - 1.0)) END / nb_d) AS z_cuped
      |  FROM th
      |)
      |SELECT event_type, n_a, n_b, theta, var_reduction, z_plain, z_cuped,
      |  CASE WHEN z_cuped IS NULL THEN NULL ELSE ABS(z_cuped) > 1.96 END
      |    AS significant
      |FROM zz
      |ORDER BY event_type""".stripMargin

  /** §2 entry `events_ab_srm` — the SAMPLE-RATIO-MISMATCH check, the
    * test an experimentation platform runs BEFORE any metric test: if
    * the 50/50 assignment itself is off (a redirect bug, a bot filter
    * hitting one arm, crash-looping clients), every downstream readout
    * is garbage no matter how significant. Per event type the exposed
    * populations (distinct users per arm) against the expected parity
    * split: z = (u_a − u_b)/√(u_a + u_b) — the df=1 χ² in z form.
    * Exactness: user counts are exact BIGINT DISTINCT collapses (the
    * proportions-entry grain); z is one mirrored divide + sqrt; an
    * empty type → NULL z. An SRM hit here is the documented reason to
    * DISCARD the Welch/MW/KS/CUPED rows beside it.
    */
  def eventsAbSrm(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val u = Tables.events(spark, dir)
      .select($"event_type", $"user_id", pmod($"user_id", lit(2)).as("arm"))
      .distinct()
      .groupBy($"event_type").agg(
        sum(when($"arm" === 0, 1L).otherwise(0L)).as("u_a"),
        sum(when($"arm" === 1, 1L).otherwise(0L)).as("u_b"))
    u
      .withColumn("z",
        when($"u_a" + $"u_b" > 0L,
          ($"u_a" - $"u_b").cast("double") / sqrt(($"u_a" + $"u_b").cast("double"))))
      .withColumn("srm_detected",
        when($"z".isNull, lit(null).cast("boolean")).otherwise(abs($"z") > 1.96))
      .select($"event_type", $"u_a", $"u_b", $"z", $"srm_detected")
      .orderBy($"event_type")
  }

  val eventsAbSrmSql: String =
    """WITH u AS (
      |  SELECT DISTINCT event_type, user_id, user_id % 2 AS arm FROM events
      |), agg AS (
      |  SELECT event_type,
      |    CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS u_a,
      |    CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS u_b
      |  FROM u GROUP BY 1
      |), z AS (
      |  SELECT event_type, u_a, u_b,
      |    CASE WHEN u_a + u_b > 0
      |      THEN CAST(u_a - u_b AS DOUBLE) / sqrt(CAST(u_a + u_b AS DOUBLE))
      |      END AS z
      |  FROM agg
      |)
      |SELECT event_type, u_a, u_b, z,
      |  CASE WHEN z IS NULL THEN NULL ELSE ABS(z) > 1.96 END AS srm_detected
      |FROM z
      |ORDER BY event_type""".stripMargin

  /** §2 entry `events_ab_power` — the A/B SAMPLE-SIZE calculator ("is
    * this experiment even big enough to read?"): per event type, the
    * per-arm n required to detect a 5% lift on the mean value at
    * α = 0.05 two-sided / 80% power — n = ⌈2·(z_α + z_β)²·s²/δ²⌉ with
    * s² the pooled sample variance and δ = 5% of the pooled mean — and
    * the verdict `powered` = min(n_a, n_b) ≥ n_required. The companion
    * every z column in this file needs: a null Welch z on an
    * underpowered type is EXPECTED, not evidence of no effect.
    *
    * Exactness: the same exact integer cents moments as the Welch
    * entry (ONE conditional-sum pass); the pooled variance, δ and the
    * ceil enter as a fixed mirrored double tree — ceil of the same
    * IEEE double is engine-identical. z_α = 1.96 is the house literal;
    * z_β = Φ⁻¹(0.8) enters as the literal 0.8416212335729143, which
    * RankTestsSpec RE-DERIVES by inverting a Taylor-series normal CDF
    * (the literal-weights discipline — a transcription error cannot
    * survive the suite). Degenerate: mean ≤ 0 or undefined variance →
    * NULL n_required and verdict in both engines.
    */
  private[graft] val PowerZBeta80 = 0.8416212335729143 // qnorm(0.8)

  def eventsAbPower(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val stats = Tables.events(spark, dir)
      .select($"event_type", pmod($"user_id", lit(2)).as("arm"),
        ($"value".cast("decimal(10,2)") * 100).cast("long").as("y_c"))
      .groupBy($"event_type").agg(
        sum(when($"arm" === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when($"arm" === 0, $"y_c").otherwise(0L)).as("sy_a"),
        sum(when($"arm" === 0, $"y_c".cast("decimal(38,0)") * $"y_c")
          .otherwise(lit(0L).cast("decimal(38,0)"))).as("syy_a"),
        sum(when($"arm" === 1, 1L).otherwise(0L)).as("n_b"),
        sum(when($"arm" === 1, $"y_c").otherwise(0L)).as("sy_b"),
        sum(when($"arm" === 1, $"y_c".cast("decimal(38,0)") * $"y_c")
          .otherwise(lit(0L).cast("decimal(38,0)"))).as("syy_b"))
    val naD = $"n_a".cast("double")
    val nbD = $"n_b".cast("double")
    val varA = when($"n_a" > 1L,
      (naD * $"syy_a".cast("double") - $"sy_a".cast("double") * $"sy_a".cast("double"))
        / (naD * (naD - 1.0)))
    val varB = when($"n_b" > 1L,
      (nbD * $"syy_b".cast("double") - $"sy_b".cast("double") * $"sy_b".cast("double"))
        / (nbD * (nbD - 1.0)))
    val pooledVar = ((naD - 1.0) * varA + (nbD - 1.0) * varB) / (naD + nbD - 2.0)
    val mean = ($"sy_a" + $"sy_b").cast("double") / (naD + nbD)
    val delta = lit(0.05) * mean
    val nReq = ceil(lit(2.0) * lit((1.96 + PowerZBeta80) * (1.96 + PowerZBeta80)) *
      pooledVar / (delta * delta)).cast("long")
    stats
      .withColumn("mean_cents", when($"n_a" + $"n_b" > 0L, mean))
      .withColumn("pooled_var", when($"n_a" > 1L && $"n_b" > 1L, pooledVar))
      .withColumn("n_required",
        when($"pooled_var".isNotNull && $"mean_cents" > 0.0, nReq))
      .withColumn("powered",
        when($"n_required".isNull, lit(null).cast("boolean"))
          .otherwise(least($"n_a", $"n_b") >= $"n_required"))
      .select($"event_type", $"n_a", $"n_b", $"mean_cents", $"pooled_var",
        $"n_required", $"powered")
      .orderBy($"event_type")
  }

  val eventsAbPowerSql: String = {
    val zsum2 = (1.96 + PowerZBeta80) * (1.96 + PowerZBeta80)
    s"""WITH ev AS (
      |  SELECT event_type, user_id % 2 AS arm,
      |    CAST(CAST(value AS DECIMAL(10,2)) * 100 AS BIGINT) AS y_c
      |  FROM events
      |), stats AS (
      |  SELECT event_type,
      |    CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
      |    CAST(SUM(CASE WHEN arm = 0 THEN y_c ELSE 0 END) AS BIGINT) AS sy_a,
      |    SUM(CASE WHEN arm = 0 THEN CAST(y_c AS HUGEINT) * y_c ELSE 0 END) AS syy_a,
      |    CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
      |    CAST(SUM(CASE WHEN arm = 1 THEN y_c ELSE 0 END) AS BIGINT) AS sy_b,
      |    SUM(CASE WHEN arm = 1 THEN CAST(y_c AS HUGEINT) * y_c ELSE 0 END) AS syy_b
      |  FROM ev GROUP BY 1
      |), d AS (
      |  SELECT event_type, n_a, n_b,
      |    CAST(n_a AS DOUBLE) AS na_d, CAST(n_b AS DOUBLE) AS nb_d,
      |    CASE WHEN n_a > 1 THEN (CAST(n_a AS DOUBLE) * CAST(syy_a AS DOUBLE)
      |        - CAST(sy_a AS DOUBLE) * CAST(sy_a AS DOUBLE))
      |      / (CAST(n_a AS DOUBLE) * (CAST(n_a AS DOUBLE) - 1.0)) END AS var_a,
      |    CASE WHEN n_b > 1 THEN (CAST(n_b AS DOUBLE) * CAST(syy_b AS DOUBLE)
      |        - CAST(sy_b AS DOUBLE) * CAST(sy_b AS DOUBLE))
      |      / (CAST(n_b AS DOUBLE) * (CAST(n_b AS DOUBLE) - 1.0)) END AS var_b,
      |    CAST(sy_a + sy_b AS DOUBLE) / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))
      |      AS mean_raw
      |  FROM stats
      |), p AS (
      |  SELECT event_type, n_a, n_b,
      |    CASE WHEN n_a + n_b > 0 THEN mean_raw END AS mean_cents,
      |    CASE WHEN n_a > 1 AND n_b > 1
      |      THEN ((na_d - 1.0) * var_a + (nb_d - 1.0) * var_b)
      |        / (na_d + nb_d - 2.0) END AS pooled_var,
      |    mean_raw
      |  FROM d
      |), r AS (
      |  SELECT event_type, n_a, n_b, mean_cents, pooled_var,
      |    CASE WHEN pooled_var IS NOT NULL AND mean_cents > 0.0
      |      THEN CAST(ceil(2.0 * $zsum2 * pooled_var
      |        / ((0.05 * mean_raw) * (0.05 * mean_raw))) AS BIGINT)
      |      END AS n_required
      |  FROM p
      |)
      |SELECT event_type, n_a, n_b, mean_cents, pooled_var, n_required,
      |  CASE WHEN n_required IS NULL THEN NULL
      |    ELSE LEAST(n_a, n_b) >= n_required END AS powered
      |FROM r
      |ORDER BY event_type""".stripMargin
  }

  /** §2 entry `events_ab_readout` — the EXPERIMENT DECISION ROW, the
    * composite every platform's readout page implements over the tests
    * this file provides: per event type, ONE row carrying the
    * assignment-integrity flag (SRM), the power verdict, all four z's
    * (Welch mean / CUPED-adjusted mean / Mann–Whitney order /
    * conversion) plus the KS shape verdict, and a DECISION that
    * encodes the canonical reading order — `invalid_srm` trumps
    * everything (a broken split voids all metrics), then
    * `underpowered` (a null z on a too-small sample is expected, not
    * evidence), then `effect` iff ANY z clears the BONFERRONI-
    * corrected bound for the m = 4 z-test family (z_{α/2m} =
    * Φ⁻¹(1 − 0.00625) — the literal RankTestsSpec re-derives by the
    * same Taylor-CDF inversion as the power literal; uncorrected 1.96
    * across four tests inflates the family false-positive rate to
    * ~18%), else `no_effect`.
    *
    * Composition, not recomputation-in-kind: each component is the
    * already-hash-gated entry joined on event_type, so the readout's
    * oracle is the JOIN of the component oracles verbatim (each as a
    * WITH-bearing subquery) — any future drift in a component breaks
    * this gate too. Bench-excluded (the eval-harness precedent: it
    * re-runs six corpus passes the suite already times individually).
    */
  private[graft] val BonferroniZ4 = 2.4977054744123737 // qnorm(1 - 0.05/8)

  def eventsAbReadout(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val welch = graft.core.StatsQueries.eventsAbWelch(spark, dir)
      .select($"event_type", $"t_stat".as("z_welch"))
    val mw = eventsAbMannWhitney(spark, dir).select($"event_type", $"z".as("z_mw"))
    val conv = eventsAbProportions(spark, dir).select($"event_type", $"z".as("z_conv"))
    val cuped = eventsAbCuped(spark, dir)
      .select($"event_type", $"z_cuped", $"var_reduction")
    val ks = eventsAbKs(spark, dir)
      .select($"event_type", $"d".as("ks_d"), $"significant".as("ks_shape_shift"))
    val srm = eventsAbSrm(spark, dir).select($"event_type", $"srm_detected")
    val power = eventsAbPower(spark, dir).select($"event_type", $"powered")
    val c = lit(BonferroniZ4)
    srm
      .join(power, Seq("event_type"))
      .join(welch, Seq("event_type"))
      .join(cuped, Seq("event_type"))
      .join(mw, Seq("event_type"))
      .join(conv, Seq("event_type"))
      .join(ks, Seq("event_type"))
      .withColumn("any_effect",
        abs($"z_welch") > c || abs($"z_cuped") > c ||
          abs($"z_mw") > c || abs($"z_conv") > c)
      .withColumn("decision",
        when($"srm_detected", "invalid_srm")
          .when(!$"powered", "underpowered")
          .when($"any_effect", "effect")
          .otherwise("no_effect"))
      .select($"event_type", $"srm_detected", $"powered",
        $"z_welch", $"z_cuped", $"var_reduction", $"z_mw", $"z_conv",
        $"ks_d", $"ks_shape_shift", $"any_effect", $"decision")
      .orderBy($"event_type")
  }

  val eventsAbReadoutSql: String =
    s"""SELECT s.event_type, s.srm_detected, p.powered,
      |  w.t_stat AS z_welch, c.z_cuped, c.var_reduction,
      |  m.z AS z_mw, v.z AS z_conv,
      |  k.d AS ks_d, k.significant AS ks_shape_shift,
      |  (ABS(w.t_stat) > $BonferroniZ4 OR ABS(c.z_cuped) > $BonferroniZ4
      |    OR ABS(m.z) > $BonferroniZ4 OR ABS(v.z) > $BonferroniZ4) AS any_effect,
      |  CASE WHEN s.srm_detected THEN 'invalid_srm'
      |       WHEN NOT p.powered THEN 'underpowered'
      |       WHEN (ABS(w.t_stat) > $BonferroniZ4 OR ABS(c.z_cuped) > $BonferroniZ4
      |         OR ABS(m.z) > $BonferroniZ4 OR ABS(v.z) > $BonferroniZ4)
      |         THEN 'effect'
      |       ELSE 'no_effect' END AS decision
      |FROM ($eventsAbSrmSql) s
      |JOIN ($eventsAbPowerSql) p ON p.event_type = s.event_type
      |JOIN (${graft.core.StatsQueries.eventsAbWelchSql}) w
      |  ON w.event_type = s.event_type
      |JOIN ($eventsAbCupedSql) c ON c.event_type = s.event_type
      |JOIN ($eventsAbMannWhitneySql) m ON m.event_type = s.event_type
      |JOIN ($eventsAbProportionsSql) v ON v.event_type = s.event_type
      |JOIN ($eventsAbKsSql) k ON k.event_type = s.event_type
      |ORDER BY s.event_type""".stripMargin

  /** §2 entry `events_ab_sequential` — the GROUP-SEQUENTIAL readout
    * beside the fixed-horizon decision row (`events_ab_readout`): real
    * platforms PEEK — reading the fixed-horizon z at every interim look
    * inflates the false-positive rate well past α, so the honest
    * peeking protocol is a monitoring boundary. This entry runs the
    * O'Brien–Fleming-type design with K = 4 equally-spaced looks over
    * the experiment's calendar span: at look k the cumulative Welch z
    * (all events up to that look's close) is compared against the OBF
    * boundary c·√(K/k) — near-unspendable early (4.05σ at look 1),
    * converging to c = 2.024 ≈ the fixed-horizon bound at the final
    * look, so early stops need overwhelming evidence and the total
    * type-I spend stays ≈ 0.05. One row per (event_type, look) with
    * the running z, its boundary, the crossing flag, the type's
    * stop_look (first crossing — min over the partition; looks after
    * it are the counterfactual a platform would never run), and the
    * decision: `reject_early` (stopped before look 4) /
    * `reject_final` / `accept`.
    *
    * Scale shape: ONE corpus pass collapses events to the (type, look)
    * per-arm sufficient-statistic grain (6 conditional sums, map-side
    * combined, ≤ types×4 rows out); the cumulative sums, the z tree,
    * and the stop_look min are windows PARTITIONED BY event_type over
    * that bounded frame — the bounded-aggregate window discipline,
    * never a corpus sort. The look index is exact integer calendar
    * arithmetic: d·4 and span+1 are small ints, so floor(double
    * division) is deterministic and identical in both engines; the
    * span scalar is the one driver-side value (the CUPED cutoff
    * device).
    *
    * Exactness (hash-gate): cumulative n/Σ/Σ² per arm are exact
    * BIGINTs (cents / cents² — the Welch bound: Σy²·10⁴ < 2⁶³ to
    * ~$9.6B of 10⁶-cent events per type-look; past that the sums move
    * to DECIMAL(38,0), plan unchanged); the per-look z re-runs the
    * `welchFrom` IEEE tree token for token; the boundary is the
    * literal c = 2.024 (Jennison–Turnbull Table 2.1, two-sided
    * α = 0.05, K = 4 — the BonferroniZ4 literal-constants discipline)
    * times √(4/k). Degenerate looks (an arm with n ≤ 1 at an early
    * look) → NULL z → NULL crossed in BOTH engines, and min() skips
    * NULL looks identically. Reference semantics: the interim-analysis
    * protocol over the reference's engagement readouts (gold_ddl.sql)
    * — the reading order its dashboard queries invite but never guard.
    */
  private[graft] val ObfCritZ4 = 2.024 // O'Brien–Fleming C_B(K=4, α=0.05, two-sided)

  /** The sequential core over a caller-supplied (event_type, arm, day,
    * y_c, yy_4) frame with the span scalars pinned — split out for the
    * planted cross-boundary-trajectory specs.
    */
  private[graft] def sequentialOn(ev: DataFrame, mn: Column, spanP: Column): DataFrame = {
    import ev.sparkSession.implicits._
    // (type, day) daily-moment collapse first — the grain the streamed
    // A/B daily state lands ([[graft.streaming.AbStream.dailyMomentsFold]]);
    // integer sums regroup exactly, so batch == serve-from-state through
    // the shared tail below
    sequentialFromDaily(ev.groupBy($"event_type", $"day").agg(
      sum(when($"arm" === 0, 1L).otherwise(0L)).as("dn_a"),
      sum(when($"arm" === 0, $"y_c").otherwise(0L)).as("dsy_a"),
      sum(when($"arm" === 0, $"yy_4").otherwise(0L)).as("dsyy_a"),
      sum(when($"arm" === 1, 1L).otherwise(0L)).as("dn_b"),
      sum(when($"arm" === 1, $"y_c").otherwise(0L)).as("dsy_b"),
      sum(when($"arm" === 1, $"yy_4").otherwise(0L)).as("dsyy_b")), mn, spanP)
  }

  /** The sequential tail over the (event_type, day) daily-moments grain
    * — shared by the batch entry and the streamed daily-state serve
    * (moments are mergeable by addition, so streamed == batch is
    * bit-exact through this core; look assignment happens HERE because
    * the look grid depends on the full day span only the reader knows).
    */
  private[graft] def sequentialFromDaily(daily: DataFrame, mn: Column,
      spanP: Column): DataFrame = {
    import daily.sparkSession.implicits._
    val withLook = daily.withColumn("look",
      floor((datediff($"day", mn) * 4).cast("double") / spanP) + lit(1L))
    val per = withLook.groupBy($"event_type", $"look").agg(
      sum($"dn_a").as("pn_a"), sum($"dsy_a").as("psy_a"),
      sum($"dsyy_a").as("psyy_a"),
      sum($"dn_b").as("pn_b"), sum($"dsy_b").as("psy_b"),
      sum($"dsyy_b").as("psyy_b"))
    val wCum = Window.partitionBy($"event_type").orderBy($"look")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = per.select($"event_type", $"look",
      sum($"pn_a").over(wCum).as("n_a"),
      sum($"psy_a").over(wCum).as("sy_a"),
      sum($"psyy_a").over(wCum).as("syy_a"),
      sum($"pn_b").over(wCum).as("n_b"),
      sum($"psy_b").over(wCum).as("sy_b"),
      sum($"psyy_b").over(wCum).as("syy_b"))
    val naD  = $"n_a".cast("double")
    val nbD  = $"n_b".cast("double")
    val syaD = $"sy_a".cast("double") / 100.0
    val sybD = $"sy_b".cast("double") / 100.0
    val syyaD = $"syy_a".cast("double") / 10000.0
    val syybD = $"syy_b".cast("double") / 10000.0
    val wAll = Window.partitionBy($"event_type")
    cum
      .withColumn("mean_a", when($"n_a" > 0, syaD / naD))
      .withColumn("mean_b", when($"n_b" > 0, sybD / nbD))
      .withColumn("var_a", when($"n_a" > 1,
        (naD * syyaD - syaD * syaD) / (naD * (naD - 1.0))))
      .withColumn("var_b", when($"n_b" > 1,
        (nbD * syybD - sybD * sybD) / (nbD * (nbD - 1.0))))
      .withColumn("z", ($"mean_a" - $"mean_b")
        / sqrt($"var_a" / naD + $"var_b" / nbD))
      .withColumn("boundary",
        lit(ObfCritZ4) * sqrt(lit(4.0) / $"look".cast("double")))
      .withColumn("crossed", when($"z".isNull, lit(null).cast("boolean"))
        .otherwise(abs($"z") > $"boundary"))
      .withColumn("stop_look", min(when($"crossed", $"look")).over(wAll))
      .withColumn("decision",
        when($"stop_look".isNull, "accept")
          .when($"stop_look" < 4, "reject_early")
          .otherwise("reject_final"))
      .select($"event_type", $"look", $"n_a", $"n_b", $"z", $"boundary",
        $"crossed", $"stop_look", $"decision")
      .orderBy($"event_type", $"look")
  }

  def eventsAbSequential(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select($"event_type", pmod($"user_id", lit(2)).as("arm"),
        to_date($"ts").as("day"),
        $"value".cast("decimal(10,2)").as("y"))
      .withColumn("y_c", ($"y" * 100).cast("long"))
      .withColumn("yy_4", ($"y" * $"y" * 10000).cast("long"))
      .drop("y")
    // the one driver-side scalar pair (the CUPED cutoff device): the
    // corpus's first day and span+1 pin the four look windows
    val b = ev.agg(min($"day").as("mn"), max($"day").as("mx")).head()
    val (mn, spanP) =
      if (b.isNullAt(0)) (java.sql.Date.valueOf("1970-01-01"), 1L)
      else {
        val mnL = b.getDate(0).toLocalDate
        (java.sql.Date.valueOf(mnL), java.time.temporal.ChronoUnit.DAYS
          .between(mnL, b.getDate(1).toLocalDate) + 1L)
      }
    sequentialOn(ev, lit(mn), lit(spanP))
  }

  val eventsAbSequentialSql: String =
    s"""WITH ev AS (
      |  SELECT event_type, user_id % 2 AS arm,
      |    CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
      |    CAST(CAST(value AS DECIMAL(10,2)) * 100 AS BIGINT) AS y_c,
      |    CAST(CAST(value AS DECIMAL(10,2)) * CAST(value AS DECIMAL(10,2)) * 10000 AS BIGINT) AS yy_4
      |  FROM events
      |), bounds AS (
      |  SELECT MIN(day) AS mn,
      |    date_diff('day', MIN(day), MAX(day)) + 1 AS spanp
      |  FROM ev
      |), lk AS (
      |  SELECT event_type, arm, y_c, yy_4,
      |    CAST(FLOOR(CAST(date_diff('day', (SELECT mn FROM bounds), day) * 4 AS DOUBLE)
      |      / (SELECT spanp FROM bounds)) AS BIGINT) + 1 AS look
      |  FROM ev
      |), per AS (
      |  SELECT event_type, look,
      |    CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS pn_a,
      |    CAST(SUM(CASE WHEN arm = 0 THEN y_c ELSE 0 END) AS BIGINT) AS psy_a,
      |    CAST(SUM(CASE WHEN arm = 0 THEN yy_4 ELSE 0 END) AS BIGINT) AS psyy_a,
      |    CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS pn_b,
      |    CAST(SUM(CASE WHEN arm = 1 THEN y_c ELSE 0 END) AS BIGINT) AS psy_b,
      |    CAST(SUM(CASE WHEN arm = 1 THEN yy_4 ELSE 0 END) AS BIGINT) AS psyy_b
      |  FROM lk GROUP BY 1, 2
      |), cum AS (
      |  SELECT event_type, look,
      |    CAST(SUM(pn_a) OVER w AS BIGINT) AS n_a,
      |    CAST(SUM(psy_a) OVER w AS BIGINT) AS sy_a,
      |    CAST(SUM(psyy_a) OVER w AS BIGINT) AS syy_a,
      |    CAST(SUM(pn_b) OVER w AS BIGINT) AS n_b,
      |    CAST(SUM(psy_b) OVER w AS BIGINT) AS sy_b,
      |    CAST(SUM(psyy_b) OVER w AS BIGINT) AS syy_b
      |  FROM per
      |  WINDOW w AS (PARTITION BY event_type ORDER BY look
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |), d AS (
      |  SELECT event_type, look, n_a, n_b,
      |    CAST(n_a AS DOUBLE) AS nad, CAST(n_b AS DOUBLE) AS nbd,
      |    CAST(sy_a AS DOUBLE) / 100.0 AS syad, CAST(sy_b AS DOUBLE) / 100.0 AS sybd,
      |    CAST(syy_a AS DOUBLE) / 10000.0 AS syyad, CAST(syy_b AS DOUBLE) / 10000.0 AS syybd
      |  FROM cum
      |), m AS (
      |  SELECT event_type, look, n_a, n_b, nad, nbd,
      |    CASE WHEN n_a > 0 THEN syad / nad END AS mean_a,
      |    CASE WHEN n_b > 0 THEN sybd / nbd END AS mean_b,
      |    CASE WHEN n_a > 1
      |      THEN (nad * syyad - syad * syad) / (nad * (nad - 1.0)) END AS var_a,
      |    CASE WHEN n_b > 1
      |      THEN (nbd * syybd - sybd * sybd) / (nbd * (nbd - 1.0)) END AS var_b
      |  FROM d
      |), r AS (
      |  SELECT event_type, look, n_a, n_b,
      |    (mean_a - mean_b) / sqrt(var_a / nad + var_b / nbd) AS z,
      |    $ObfCritZ4 * sqrt(4.0 / CAST(look AS DOUBLE)) AS boundary
      |  FROM m
      |), cr AS (
      |  SELECT event_type, look, n_a, n_b, z, boundary,
      |    CASE WHEN z IS NULL THEN NULL ELSE abs(z) > boundary END AS crossed
      |  FROM r
      |), st AS (
      |  SELECT *, MIN(CASE WHEN crossed THEN look END)
      |    OVER (PARTITION BY event_type) AS stop_look
      |  FROM cr
      |)
      |SELECT event_type, look, n_a, n_b, z, boundary, crossed, stop_look,
      |  CASE WHEN stop_look IS NULL THEN 'accept'
      |       WHEN stop_look < 4 THEN 'reject_early'
      |       ELSE 'reject_final' END AS decision
      |FROM st
      |ORDER BY event_type, look""".stripMargin

  /** §2 entry `events_ab_sequential_cuped` — the monitor a production
    * platform ACTUALLY runs: the CUPED-adjusted z inside the
    * O'Brien–Fleming boundary. `events_ab_sequential` reads the plain
    * Welch z at each look; `events_ab_cuped` shrinks the variance but
    * reads once at the horizon. Composing them is not cosmetic — the
    * variance reduction moves the CROSSING TIME (the same true lift
    * clears the boundary looks earlier when the covariate explains the
    * noise), which is the whole commercial point of CUPED on a
    * monitored experiment. Calendar frame: pre-period = first half of
    * the day span (the CUPED cut device), K = 4 equally-spaced looks
    * over the SECOND half; θ re-estimated from cumulative data at
    * every look (the platform convention — the covariate model uses
    * everything known at the peek).
    *
    * Scale shape: ONE corpus pass to the (type, user, arm) grain with
    * x and the four look-bucket y's (5 conditional sums); the 4-look
    * cumulative unpivot is a 4× explode at USER grain (bounded, no
    * corpus re-scan); then one map-side-combined moment collapse per
    * (type, look) — 12 sufficient statistics, ≤ types×4 rows — and
    * the shared [[withCupedZ]] tree + the OBF tail over that bounded
    * frame. Driver scalars: the cut date and the experiment-window
    * span (the CUPED/RecEval device).
    *
    * Exactness (hash-gate): per-user cents sums BIGINT; second moments
    * DECIMAL(38,0)/HUGEINT (the CUPED bound); the z trees are the
    * fixed-horizon entry's VERBATIM (shared code here, token-mirrored
    * SQL there); boundary literals the sequential entry's. Degenerate
    * looks (n ≤ 1 arm, var(x) ≤ 0 → θ = 0) degrade exactly as the
    * fixed-horizon twin. Reference semantics: the interim-analysis
    * protocol over the reference's engagement readouts with its
    * pre-period covariate — the full platform reading order.
    */
  private[graft] def sequentialCupedOn(ev: DataFrame, cut: Column,
      span2P: Column): DataFrame = {
    import ev.sparkSession.implicits._
    val bucket =
      floor(((datediff($"day", cut) - 1) * 4).cast("double") / span2P) + lit(1L)
    val pu = ev.groupBy($"event_type", $"user_id", $"arm").agg(
      sum(when($"day" <= cut, $"y_c").otherwise(0L)).as("x"),
      sum(when($"day" > cut && bucket === 1L, $"y_c").otherwise(0L)).as("y1"),
      sum(when($"day" > cut && bucket === 2L, $"y_c").otherwise(0L)).as("y2"),
      sum(when($"day" > cut && bucket === 3L, $"y_c").otherwise(0L)).as("y3"),
      sum(when($"day" > cut && bucket === 4L, $"y_c").otherwise(0L)).as("y4"))
    val looks = pu.select($"event_type", $"arm", $"x",
      explode(array(
        struct(lit(1L).as("look"), $"y1".as("yy")),
        struct(lit(2L).as("look"), ($"y1" + $"y2").as("yy")),
        struct(lit(3L).as("look"), ($"y1" + $"y2" + $"y3").as("yy")),
        struct(lit(4L).as("look"),
          ($"y1" + $"y2" + $"y3" + $"y4").as("yy")))).as("s"))
      .select($"event_type", $"arm", $"x",
        $"s.look".as("look"), $"s.yy".as("y"))
    val m = looks.groupBy($"event_type", $"look")
      .agg(cupedMomentAggs.head, cupedMomentAggs.tail: _*)
    val wAll = Window.partitionBy($"event_type")
    withCupedZ(m)
      .withColumn("boundary",
        lit(ObfCritZ4) * sqrt(lit(4.0) / $"look".cast("double")))
      .withColumn("crossed", when($"z_cuped".isNull, lit(null).cast("boolean"))
        .otherwise(abs($"z_cuped") > $"boundary"))
      .withColumn("stop_look", min(when($"crossed", $"look")).over(wAll))
      .withColumn("decision",
        when($"stop_look".isNull, "accept")
          .when($"stop_look" < 4, "reject_early")
          .otherwise("reject_final"))
      .select($"event_type", $"look", $"n_a", $"n_b", $"theta",
        $"var_reduction", $"z_plain", $"z_cuped", $"boundary", $"crossed",
        $"stop_look", $"decision")
      .orderBy($"event_type", $"look")
  }

  def eventsAbSequentialCuped(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select($"event_type", $"user_id", pmod($"user_id", lit(2)).as("arm"),
        to_date($"ts").as("day"),
        ($"value".cast("decimal(10,2)") * 100).cast("long").as("y_c"))
    // two driver-side scalars (the CUPED cutoff device): the pre/post
    // cut and the experiment-window span that pins the four looks
    val b = ev.agg(min($"day").as("mn"), max($"day").as("mx")).head()
    val (cut, span2P) =
      if (b.isNullAt(0)) (java.sql.Date.valueOf("1970-01-01"), 1L)
      else {
        val mn = b.getDate(0).toLocalDate
        val mx = b.getDate(1).toLocalDate
        val cutL = mn.plusDays(java.time.temporal.ChronoUnit.DAYS.between(mn, mx) / 2)
        (java.sql.Date.valueOf(cutL),
          math.max(1L, java.time.temporal.ChronoUnit.DAYS.between(cutL, mx)))
      }
    sequentialCupedOn(ev, lit(cut), lit(span2P))
  }

  val eventsAbSequentialCupedSql: String =
    s"""WITH ev AS (
      |  SELECT event_type, user_id, user_id % 2 AS arm,
      |    CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
      |    CAST(CAST(value AS DECIMAL(10,2)) * 100 AS BIGINT) AS y_c
      |  FROM events
      |), bounds AS (
      |  SELECT MIN(day) AS mn, MAX(day) AS mx FROM ev
      |), cut AS (
      |  SELECT mn + CAST(date_diff('day', mn, mx) // 2 AS INTEGER) AS cutoff
      |  FROM bounds
      |), span2 AS (
      |  SELECT GREATEST(CAST(1 AS BIGINT),
      |    date_diff('day', (SELECT cutoff FROM cut), (SELECT mx FROM bounds))) AS s2
      |), pu AS (
      |  SELECT event_type, user_id, arm,
      |    CAST(SUM(CASE WHEN day <= (SELECT cutoff FROM cut) THEN y_c ELSE 0 END)
      |      AS BIGINT) AS x,
      |    CAST(SUM(CASE WHEN day > (SELECT cutoff FROM cut)
      |      AND CAST(FLOOR(CAST((date_diff('day', (SELECT cutoff FROM cut), day) - 1) * 4 AS DOUBLE)
      |        / (SELECT s2 FROM span2)) AS BIGINT) + 1 = 1 THEN y_c ELSE 0 END)
      |      AS BIGINT) AS y1,
      |    CAST(SUM(CASE WHEN day > (SELECT cutoff FROM cut)
      |      AND CAST(FLOOR(CAST((date_diff('day', (SELECT cutoff FROM cut), day) - 1) * 4 AS DOUBLE)
      |        / (SELECT s2 FROM span2)) AS BIGINT) + 1 = 2 THEN y_c ELSE 0 END)
      |      AS BIGINT) AS y2,
      |    CAST(SUM(CASE WHEN day > (SELECT cutoff FROM cut)
      |      AND CAST(FLOOR(CAST((date_diff('day', (SELECT cutoff FROM cut), day) - 1) * 4 AS DOUBLE)
      |        / (SELECT s2 FROM span2)) AS BIGINT) + 1 = 3 THEN y_c ELSE 0 END)
      |      AS BIGINT) AS y3,
      |    CAST(SUM(CASE WHEN day > (SELECT cutoff FROM cut)
      |      AND CAST(FLOOR(CAST((date_diff('day', (SELECT cutoff FROM cut), day) - 1) * 4 AS DOUBLE)
      |        / (SELECT s2 FROM span2)) AS BIGINT) + 1 = 4 THEN y_c ELSE 0 END)
      |      AS BIGINT) AS y4
      |  FROM ev GROUP BY 1, 2, 3
      |), lk AS (
      |  SELECT event_type, arm, x, CAST(k AS BIGINT) AS look,
      |    CAST(y1 + CASE WHEN k >= 2 THEN y2 ELSE 0 END
      |       + CASE WHEN k >= 3 THEN y3 ELSE 0 END
      |       + CASE WHEN k >= 4 THEN y4 ELSE 0 END AS BIGINT) AS y
      |  FROM pu, UNNEST([1, 2, 3, 4]) AS r(k)
      |), m AS (
      |  SELECT event_type, look,
      |    CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
      |    CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
      |    CAST(SUM(CASE WHEN arm = 0 THEN x ELSE 0 END) AS BIGINT) AS sx_a,
      |    CAST(SUM(CASE WHEN arm = 1 THEN x ELSE 0 END) AS BIGINT) AS sx_b,
      |    CAST(SUM(CASE WHEN arm = 0 THEN y ELSE 0 END) AS BIGINT) AS sy_a,
      |    CAST(SUM(CASE WHEN arm = 1 THEN y ELSE 0 END) AS BIGINT) AS sy_b,
      |    SUM(CASE WHEN arm = 0 THEN CAST(x AS HUGEINT) * x ELSE 0 END) AS sxx_a,
      |    SUM(CASE WHEN arm = 1 THEN CAST(x AS HUGEINT) * x ELSE 0 END) AS sxx_b,
      |    SUM(CASE WHEN arm = 0 THEN CAST(y AS HUGEINT) * y ELSE 0 END) AS syy_a,
      |    SUM(CASE WHEN arm = 1 THEN CAST(y AS HUGEINT) * y ELSE 0 END) AS syy_b,
      |    SUM(CASE WHEN arm = 0 THEN CAST(x AS HUGEINT) * y ELSE 0 END) AS sxy_a,
      |    SUM(CASE WHEN arm = 1 THEN CAST(x AS HUGEINT) * y ELSE 0 END) AS sxy_b
      |  FROM lk GROUP BY 1, 2
      |), d AS (
      |  SELECT event_type, look, n_a, n_b,
      |    CAST(n_a + n_b AS DOUBLE) AS n_d,
      |    CAST(n_a AS DOUBLE) AS na_d, CAST(n_b AS DOUBLE) AS nb_d,
      |    CAST(sx_a + sx_b AS DOUBLE) AS sx_d,
      |    CAST(sy_a + sy_b AS DOUBLE) AS sy_d,
      |    CAST(sxx_a + sxx_b AS DOUBLE) AS sxx_d,
      |    CAST(syy_a + syy_b AS DOUBLE) AS syy_d,
      |    CAST(sxy_a + sxy_b AS DOUBLE) AS sxy_d,
      |    CAST(sx_a AS DOUBLE) AS sxa, CAST(sx_b AS DOUBLE) AS sxb,
      |    CAST(sy_a AS DOUBLE) AS sya, CAST(sy_b AS DOUBLE) AS syb,
      |    CAST(sxx_a AS DOUBLE) AS sxxa, CAST(sxx_b AS DOUBLE) AS sxxb,
      |    CAST(syy_a AS DOUBLE) AS syya, CAST(syy_b AS DOUBLE) AS syyb,
      |    CAST(sxy_a AS DOUBLE) AS sxya, CAST(sxy_b AS DOUBLE) AS sxyb
      |  FROM m
      |), th AS (
      |  SELECT *,
      |    CASE WHEN n_d * sxx_d - sx_d * sx_d > 0.0
      |      THEN (n_d * sxy_d - sx_d * sy_d) / (n_d * sxx_d - sx_d * sx_d)
      |      ELSE 0.0 END AS theta,
      |    CASE WHEN n_d * sxx_d - sx_d * sx_d > 0.0
      |        AND n_d * syy_d - sy_d * sy_d > 0.0
      |      THEN (n_d * sxy_d - sx_d * sy_d) * (n_d * sxy_d - sx_d * sy_d)
      |        / ((n_d * sxx_d - sx_d * sx_d) * (n_d * syy_d - sy_d * sy_d))
      |      END AS var_reduction
      |  FROM d
      |), zz AS (
      |  SELECT event_type, look, n_a, n_b, theta, var_reduction,
      |    (CASE WHEN n_a > 0 THEN (sya - 0.0 * sxa) / na_d END
      |     - CASE WHEN n_b > 0 THEN (syb - 0.0 * sxb) / nb_d END)
      |    / sqrt(
      |      CASE WHEN n_a > 1 THEN (na_d * (syya - 2.0 * 0.0 * sxya
      |          + 0.0 * 0.0 * sxxa)
      |          - (sya - 0.0 * sxa) * (sya - 0.0 * sxa))
      |        / (na_d * (na_d - 1.0)) END / na_d
      |      + CASE WHEN n_b > 1 THEN (nb_d * (syyb - 2.0 * 0.0 * sxyb
      |          + 0.0 * 0.0 * sxxb)
      |          - (syb - 0.0 * sxb) * (syb - 0.0 * sxb))
      |        / (nb_d * (nb_d - 1.0)) END / nb_d) AS z_plain,
      |    (CASE WHEN n_a > 0 THEN (sya - theta * sxa) / na_d END
      |     - CASE WHEN n_b > 0 THEN (syb - theta * sxb) / nb_d END)
      |    / sqrt(
      |      CASE WHEN n_a > 1 THEN (na_d * (syya - 2.0 * theta * sxya
      |          + theta * theta * sxxa)
      |          - (sya - theta * sxa) * (sya - theta * sxa))
      |        / (na_d * (na_d - 1.0)) END / na_d
      |      + CASE WHEN n_b > 1 THEN (nb_d * (syyb - 2.0 * theta * sxyb
      |          + theta * theta * sxxb)
      |          - (syb - theta * sxb) * (syb - theta * sxb))
      |        / (nb_d * (nb_d - 1.0)) END / nb_d) AS z_cuped,
      |    $ObfCritZ4 * sqrt(4.0 / CAST(look AS DOUBLE)) AS boundary
      |  FROM th
      |), cr AS (
      |  SELECT *, CASE WHEN z_cuped IS NULL THEN NULL
      |    ELSE ABS(z_cuped) > boundary END AS crossed
      |  FROM zz
      |), st AS (
      |  SELECT *, MIN(CASE WHEN crossed THEN look END)
      |    OVER (PARTITION BY event_type) AS stop_look
      |  FROM cr
      |)
      |SELECT event_type, look, n_a, n_b, theta, var_reduction,
      |  z_plain, z_cuped, boundary, crossed, stop_look,
      |  CASE WHEN stop_look IS NULL THEN 'accept'
      |       WHEN stop_look < 4 THEN 'reject_early'
      |       ELSE 'reject_final' END AS decision
      |FROM st
      |ORDER BY event_type, look""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_ab_mannwhitney" -> (eventsAbMannWhitney _),
    "events_ab_proportions" -> (eventsAbProportions _),
    "events_ab_ks"          -> (eventsAbKs _),
    "events_ab_kruskal"     -> (eventsAbKruskal _),
    "events_ab_cuped"       -> (eventsAbCuped _),
    "events_ab_srm"         -> (eventsAbSrm _),
    "events_ab_power"       -> (eventsAbPower _),
    "events_ab_readout"     -> (eventsAbReadout _),
    "events_ab_sequential"  -> (eventsAbSequential _),
    "events_ab_sequential_cuped" -> (eventsAbSequentialCuped _)
  )

  val oracleSql: Map[String, String] = Map(
    "events_ab_mannwhitney" -> eventsAbMannWhitneySql,
    "events_ab_proportions" -> eventsAbProportionsSql,
    "events_ab_ks"          -> eventsAbKsSql,
    "events_ab_kruskal"     -> eventsAbKruskalSql,
    "events_ab_cuped"       -> eventsAbCupedSql,
    "events_ab_srm"         -> eventsAbSrmSql,
    "events_ab_power"       -> eventsAbPowerSql,
    "events_ab_readout"     -> eventsAbReadoutSql,
    "events_ab_sequential"  -> eventsAbSequentialSql,
    "events_ab_sequential_cuped" -> eventsAbSequentialCupedSql
  )
}
