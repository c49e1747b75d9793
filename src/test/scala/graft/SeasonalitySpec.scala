package graft

import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Day-of-week seasonality strength (one-way η²): exact recovery of a
  * pure weekly cycle, the constant-series NULL edge, a hand-computed
  * mixed case, and served-from-streamed-state == batch bit-for-bit.
  */
class SeasonalitySpec extends SparkSuite {

  private def daily(rows: Seq[(String, String, Long)]) = {
    import spark.implicits._
    rows.toDF("event_type", "day", "n")
      .select($"event_type", to_date($"day").as("day"), $"n")
  }

  test("a pure weekly cycle has eta2 == 1 exactly") {
    // 4 full weeks of a dow-determined profile starting Mon 2024-01-01
    val profile = Seq(10L, 20L, 30L, 40L, 50L, 5L, 1L)
    val rows = for (w <- 0 until 4; d <- 0 until 7) yield {
      val day = java.time.LocalDate.of(2024, 1, 1).plusDays(w * 7L + d)
      ("a", day.toString, profile(d))
    }
    val r = core.SeasonalityQueries.seasonalityOn(daily(rows)).collect().head
    assert(r.getAs[Long]("n_days") == 28L)
    assert(r.getAs[Double]("ss_within") == 0.0)
    assert(r.getAs[Double]("eta2") == 1.0)
    assert(r.getAs[Boolean]("weekly_seasonal"))
  }

  test("a constant series has no variance to explain -> NULL eta2") {
    val rows = (0 until 14).map { d =>
      ("a", java.time.LocalDate.of(2024, 1, 1).plusDays(d.toLong).toString, 7L)
    }
    val r = core.SeasonalityQueries.seasonalityOn(daily(rows)).collect().head
    assert(r.getAs[Double]("ss_total") == 0.0)
    assert(r.isNullAt(r.fieldIndex("eta2")))
    assert(r.isNullAt(r.fieldIndex("weekly_seasonal")))
  }

  test("hand-computed mixed case (absent dows contribute zero)") {
    // Mon {1,3}: w = (2*10-16)/2 = 2; Tue {5}: w = 0
    // totals N=3 S=9 Q=35 -> sst = (105-81)/3 = 8; eta2 = 1 - 2/8
    val r = core.SeasonalityQueries.seasonalityOn(daily(Seq(
      ("a", "2024-01-01", 1L), ("a", "2024-01-08", 3L),
      ("a", "2024-01-02", 5L)))).collect().head
    assert(r.getAs[Double]("ss_within") == 2.0)
    assert(r.getAs[Double]("ss_total") == 8.0)
    assert(r.getAs[Double]("eta2") == 0.75)
  }

  test("corpus entry is non-vacuous with eta2 in [0, 1]") {
    val rows = core.SeasonalityQueries.eventsSeasonalityStrength(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      if (!r.isNullAt(r.fieldIndex("eta2"))) {
        val e = r.getAs[Double]("eta2")
        assert(e >= 0.0 && e <= 1.0 + 1e-12)
      }
    }
  }

  test("served from streamed state == batch bit-for-bit") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_season_stream").toString
    val ev = Tables.events(spark, sf)
    streaming.ForecastStream.dailyFold(ev.filter($"event_id" % 2 === 0), dir, 0L)
    streaming.ForecastStream.dailyFold(ev.filter($"event_id" % 2 === 1), dir, 1L)
    val served = streaming.ForecastStream.serveSeasonality(spark, dir)
      .collect().map(_.toSeq).toSeq
    val batch = core.SeasonalityQueries.eventsSeasonalityStrength(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(served == batch && served.nonEmpty)
  }
}
