package graft

import java.sql.Date

import org.apache.spark.sql.functions._

/** Holt forecast: the literal dyadic weights vs a direct recurrence
  * simulation (both sides exact in doubles — every intermediate is a
  * dyadic rational with numerator « 2⁵³, so == comparison, no epsilon),
  * plus the two algebraic identities the weight tables encode: a
  * constant series forecasts itself with zero trend, and a rising ramp
  * forecasts above its last value with positive trend.
  */
class HoltSpec extends SparkSuite {

  private def dailyOf(series: Seq[Long]) = {
    import spark.implicits._
    // newest day = 2024-03-01; series is oldest-first over consecutive days
    series.zipWithIndex.map { case (n, j) =>
      ("t", Date.valueOf(java.time.LocalDate.of(2024, 2, 1).plusDays(j)), n)
    }.toDF("event_type", "day", "n")
  }

  /** The recurrence itself, oldest-first, zero-filled to 14 values:
    * l₁ = x₁, b₁ = 0; divisions by 2 are exact in binary doubles.
    */
  private def simulate(series: Seq[Long]): (Double, Double) = {
    val xs = (Seq.fill(14 - series.length)(0L) ++ series.takeRight(14)).map(_.toDouble)
    var l = xs.head; var b = 0.0
    for (t <- 1 until 14) {
      val lp = l
      l = (xs(t) + l + b) / 2.0
      b = (l - lp) / 2.0 + b / 2.0
    }
    (l + b, b)
  }

  private def run(series: Seq[Long]): (Double, Double) = {
    val r = core.HoltForecast.holtOn(dailyOf(series)).head()
    (r.getAs[Double]("forecast_next_day"), r.getAs[Double]("trend_per_day"))
  }

  test("literal weights equal the recurrence exactly on a pseudorandom series") {
    val rnd = new scala.util.Random(7)
    val series = Seq.fill(14)(rnd.nextInt(5000).toLong)
    assert(run(series) == simulate(series))
  }

  test("a short series behaves as its calendar zero-fill") {
    val series = Seq(100L, 120L, 140L, 160L, 180L)
    assert(run(series) == simulate(series))
  }

  test("constant series: forecast is the constant, trend exactly zero") {
    val (f, t) = run(Seq.fill(14)(777L))
    assert(f == 777.0 && t == 0.0)
  }

  test("rising ramp: forecast above last value, positive trend") {
    val series = (1L to 14L).map(_ * 10L)
    val (f, t) = run(series)
    assert(f > 140.0 && t > 0.0)
    assert(run(series) == simulate(series))
  }

  test("entry runs on the gate table with one row per event type") {
    val df = core.HoltForecast.eventsForecastHolt(spark, sf)
    val n = df.count()
    assert(n > 0)
    assert(df.select(countDistinct(col("event_type"))).head().getLong(0) == n)
  }
}
