package graft

import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Streaming sufficient-statistics fold: bit-identical to the batch
  * Pearson/OLS entry over any batch split (exact integer state + the
  * shared IEEE estimator tree); retry no-ops; stale state fails loudly.
  */
class StatsStreamSpec extends SparkSuite {

  test("streamed over 3 batches == batch events_value_corr bit-for-bit") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_corrstream").toString
    val ev = Tables.events(spark, sf)
    streaming.StatsStream.corrFold(ev.filter($"event_id" % 3 === 0), dir, 0L)
    streaming.StatsStream.corrFold(ev.filter($"event_id" % 3 === 1), dir, 1L)
    streaming.StatsStream.corrFold(ev.filter($"event_id" % 3 === 2), dir, 2L)
    val streamed = streaming.StatsStream.serveCorr(spark, dir)
      .collect().map(_.toSeq).toSeq
    val batch = core.StatsQueries.eventsValueCorr(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(streamed == batch,
      "streamed sufficient-statistics fold diverges from the batch entry")
    assert(batch.nonEmpty)
    // the statistics are real numbers, not NaN artifacts
    val rs = streaming.StatsStream.serveCorr(spark, dir)
      .collect().map(_.getAs[Double]("pearson_r"))
    assert(rs.forall(r => !r.isNaN && r.abs <= 1.0))
  }

  test("retry of the last committed batch no-ops; an older batch id fails loudly") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_corrstream_retry").toString
    val ev = Tables.events(spark, sf)
    val b0 = ev.filter($"event_id" % 2 === 0)
    val b1 = ev.filter($"event_id" % 2 === 1)
    streaming.StatsStream.corrFold(b0, dir, 0L)
    streaming.StatsStream.corrFold(b1, dir, 1L)
    val state = streaming.StateFold.readState(spark, dir).get.collect().map(_.toSeq).toSet
    streaming.StatsStream.corrFold(b1, dir, 1L) // retry — already folded
    assert(streaming.StateFold.readState(spark, dir).get.collect().map(_.toSeq).toSet == state,
      "retry mutated the folded sums")
    val e = intercept[IllegalStateException] {
      streaming.StatsStream.corrFold(b0, dir, 0L)
    }
    assert(e.getMessage.contains("clear the state path"))
  }

  test("mad: both medians equal a driver lower-median reference exactly") {
    import spark.implicits._
    val vals = Tables.events(spark, sf)
      .select($"event_type", $"event_id",
        ($"value".cast("decimal(10,2)") * 100).cast("long").as("v_c"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    def lowerMedian(xs: Seq[(Long, Long)]): Long = { // (v, id), rank ceil(n/2)
      val sorted = xs.sortBy(identity)
      sorted(((sorted.length + 1) / 2) - 1)._1
    }
    val want = vals.groupBy(_._1).map { case (t, rs) =>
      val med = lowerMedian(rs.map(r => (r._3, r._2)))
      val mad = lowerMedian(rs.map(r => (math.abs(r._3 - med), r._2)))
      t -> (rs.length.toLong, med, mad)
    }
    val got = core.StatsQueries.aggMadExact(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val t = r.getString(0)
      val (wn, wmed, wmad) = want(t)
      assert(r.getLong(1) == wn)
      assert(r.getLong(2) == wmed, s"$t median")
      assert(r.getLong(3) == wmad, s"$t mad")
      assert(r.getDouble(4) == wmed / 100.0 && r.getDouble(5) == wmad / 100.0)
    }
  }

  test("welch a/b: arms partition every event; t matches a driver reference to 1e-12") {
    import spark.implicits._
    val rows = core.StatsQueries.eventsAbWelch(spark, sf).collect()
    assert(rows.nonEmpty)
    val totals = Tables.events(spark, sf).groupBy($"event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val t = r.getAs[String]("event_type")
      assert(r.getAs[Long]("n_a") + r.getAs[Long]("n_b") == totals(t),
        s"$t: arms must partition the events")
    }
    // driver-side Welch reference from raw values
    val raw = Tables.events(spark, sf)
      .select($"event_type", pmod($"user_id", org.apache.spark.sql.functions.lit(2)),
        $"value".cast("decimal(10,2)").cast("double"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    rows.foreach { r =>
      val t = r.getAs[String]("event_type")
      val a = raw.collect { case (`t`, 0L, v) => v }
      val b = raw.collect { case (`t`, 1L, v) => v }
      def meanVar(x: Array[Double]) = {
        val m = x.sum / x.length
        (m, x.map(v => (v - m) * (v - m)).sum / (x.length - 1))
      }
      val ((ma, va), (mb, vb)) = (meanVar(a), meanVar(b))
      val tRef = (ma - mb) / math.sqrt(va / a.length + vb / b.length)
      assert(math.abs(r.getAs[Double]("t_stat") - tRef) < 1e-9, s"$t t-stat")
      assert(r.getAs[Boolean]("significant") == (math.abs(tRef) > 1.96), s"$t flag")
    }
  }
}
