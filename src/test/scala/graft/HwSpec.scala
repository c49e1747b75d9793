package graft

import org.apache.spark.sql.functions._

/** Holt–Winters seasonal forecast: the embedded literal weights must
  * equal the exact rational impulse response of the recurrences, the
  * filter must reproduce a constant series with zero seasonal component,
  * recover a pure weekly cycle, and the served twin must match the batch
  * entry bit-for-bit.
  */
class HwSpec extends SparkSuite {

  /** Exact rational as a reduced BigInt pair. */
  private case class Q(n: BigInt, d: BigInt) {
    require(d > 0)
    def +(o: Q): Q = Q.mk(n * o.d + o.n * d, d * o.d)
    def -(o: Q): Q = Q.mk(n * o.d - o.n * d, d * o.d)
    def /(k: Int): Q = Q.mk(n, d * k)
  }
  private object Q {
    def mk(n: BigInt, d: BigInt): Q = {
      val g = n.gcd(d) max BigInt(1)
      if (d < 0) Q(-n / g, -d / g) else Q(n / g, d / g)
    }
    val zero: Q = Q(0, 1)
  }

  /** Impulse responses of the classic Winters recurrences over the
    * H-day window — an independent re-derivation of the literals.
    */
  private def deriveWeights(): (Seq[Q], Seq[Q]) = {
    val H = core.HwForecast.H
    val m = core.HwForecast.period
    type V = Vector[Q] // weight of y_1..y_H (index 0 = y_1)
    val zero: V = Vector.fill(H)(Q.zero)
    def unit(t: Int): V = zero.updated(t - 1, Q(1, 1))
    var l: V = Vector.tabulate(H)(j => if (j < m) Q(1, m) else Q.zero)
    var b: V = zero
    val s = scala.collection.mutable.Map.empty[Int, V]
    for (t <- 1 to m) s(t) = unit(t).zip(l).map { case (a, c) => a - c }
    for (t <- m + 1 to H) {
      val lPrev = l; val bPrev = b
      l = Vector.tabulate(H)(j =>
        (unit(t)(j) - s(t - m)(j) + lPrev(j) + bPrev(j)) / 2)
      b = Vector.tabulate(H)(j => (l(j) - lPrev(j)) / 2 + bPrev(j) / 2)
      s(t) = Vector.tabulate(H)(j => (unit(t)(j) - l(j)) / 2 + s(t - m)(j) / 2)
    }
    val sNext = s(H + 1 - m)
    val fc = Vector.tabulate(H)(j => l(j) + b(j) + sNext(j))
    (fc, sNext)
  }

  test("literal weights == exact rational impulse response over 7*2^42") {
    val (fc, sn) = deriveWeights()
    val d = BigInt(core.HwForecast.den.toLong)
    fc.zip(core.HwForecast.fcNum).zipWithIndex.foreach { case ((q, lit), i) =>
      assert(q.n * d == BigInt(lit) * q.d, s"fc weight $i: $q vs $lit/$d")
    }
    sn.zip(core.HwForecast.snNum).zipWithIndex.foreach { case ((q, lit), i) =>
      assert(q.n * d == BigInt(lit) * q.d, s"sn weight $i: $q vs $lit/$d")
    }
    assert(core.HwForecast.fcNum.sum == core.HwForecast.den.toLong,
      "forecast weights must sum to exactly 1")
    assert(core.HwForecast.snNum.sum == 0L,
      "seasonal weights must sum to exactly 0")
  }

  private def daily(rows: Seq[(String, String, Long)]) = {
    import spark.implicits._
    rows.toDF("event_type", "day", "n")
      .select($"event_type", to_date($"day").as("day"), $"n")
  }

  test("constant series: forecast reproduces it, season is zero") {
    val d = daily((1 to 28).map(i => ("a", f"2024-01-$i%02d", 42L)))
    val row = core.HwForecast.hwOn(d).collect().head
    assert(row.getAs[Long]("n_days") == 28L)
    assert(row.getAs[Double]("forecast_next_day") == 42.0)
    assert(row.getAs[Double]("season_next_day") == 0.0)
  }

  test("pure weekly cycle: forecast picks the right day-of-week value") {
    // period-7 pattern repeated 4x; next day continues the cycle. With
    // zero trend and an exact repeating season, HW must forecast the
    // value of the upcoming day-of-week exactly (the recurrences are
    // exact on any series that already satisfies the model).
    val cycle = Seq(10L, 20L, 30L, 40L, 30L, 20L, 10L)
    val d = daily((0 until 28).map(i => ("a", f"2024-01-${i + 1}%02d", cycle(i % 7))))
    val row = core.HwForecast.hwOn(d).collect().head
    // day 29 is index 28 -> cycle(0) = 10
    assert(row.getAs[Double]("forecast_next_day") == 10.0)
    assert(row.getAs[Double]("season_next_day")
      == 10.0 - cycle.sum.toDouble / 7.0)
  }

  test("only the trailing 28 calendar days participate") {
    val in = daily((1 to 28).map(i => ("a", f"2024-01-$i%02d", 7L)))
    val withOld = daily(Seq(("a", "2023-12-01", 999999L)) ++
      (1 to 28).map(i => ("a", f"2024-01-$i%02d", 7L)))
    val a = core.HwForecast.hwOn(in).collect().head
    val b = core.HwForecast.hwOn(withOld).collect().head
    assert(a.getAs[Double]("forecast_next_day")
      == b.getAs[Double]("forecast_next_day"))
    assert(b.getAs[Long]("n_days") == 28L)
  }

  test("served twin is bit-identical to the batch entry") {
    val batch = core.HwForecast.eventsForecastHw(spark, sf).collect().toSeq
    val served = streaming.ForecastServe.hwServed(spark, sf).collect().toSeq
    assert(batch == served)
    assert(batch.nonEmpty)
  }
}
