package graft

/** Invariants for the multi-touch attribution surface. Value-level
  * correctness is the driver's DuckDB gate; these pin the credit-model
  * semantics on a hand-checked synthetic frame plus non-vacuity and
  * reconciliation on the test corpus.
  */
class AttributionSpec extends SparkSuite {

  test("synthetic chain: window bound, strict-before, tie-break, direct class") {
    import spark.implicits._
    val week = 7L * 86400L
    // u1's purchase (id 10) at t=1000: touches 1 (view, t=10), 2 (click,
    // t=500) qualify; 3 (click, t=1000) is NOT strictly before; 4 (view,
    // t=1000-week) is exactly at the lookback bound (qualifies, >=);
    // 5 (view, t=999-week) is outside. u2's purchase (id 20) has no
    // touches -> direct. u3 has two touches at the SAME second -> the
    // higher event_id wins last-touch, lower wins first-touch.
    val ev = Seq(
      (1L, 1L, "view", 10L, 0.0),
      (2L, 1L, "click", 500L, 0.0),
      (3L, 1L, "click", 1000L, 0.0),
      (4L, 1L, "view", 1000L - week, 0.0),
      (5L, 1L, "view", 999L - week, 0.0),
      (10L, 1L, "purchase", 1000L, 10.00),
      (20L, 2L, "purchase", 1000L, 5.00),
      (30L, 3L, "view", 100L, 0.0),
      (31L, 3L, "click", 100L, 0.0),
      (40L, 3L, "purchase", 200L, 9.00)
    ).toDF("event_id", "user_id", "event_type", "ts_sec", "value")
    val rows = core.AttributionQueries.attributionOn(ev)
      .orderBy("purchase_id").collect()
    assert(rows.length == 3)
    val r1 = rows(0)
    assert(r1.getAs[Long]("purchase_id") == 10L)
    assert(r1.getAs[Long]("n_touches") == 3L) // ids 1, 2, 4
    assert(r1.getAs[Long]("first_touch_id") == 4L) // oldest in window
    assert(r1.getAs[Long]("last_touch_id") == 2L)  // id 3 not strictly before
    assert(r1.getAs[String]("last_touch_type") == "click")
    assert(r1.getAs[Long]("value_cents") == 1000L)
    assert(r1.getAs[Double]("credit_per_touch") == 1000.0 / 3.0)
    val r2 = rows(1)
    assert(r2.getAs[Long]("n_touches") == 0L)
    assert(r2.isNullAt(r2.fieldIndex("last_touch_type")))
    assert(r2.isNullAt(r2.fieldIndex("credit_per_touch")))
    val r3 = rows(2)
    assert(r3.getAs[Long]("first_touch_id") == 30L, "same-second tie: lower id is first")
    assert(r3.getAs[Long]("last_touch_id") == 31L, "same-second tie: higher id is last")
  }

  test("corpus: every purchase accounted once; channel rollup reconciles") {
    import org.apache.spark.sql.functions._
    val att = core.AttributionQueries.eventsAttribution(spark, sf)
    val ch  = core.AttributionQueries.eventsAttributionChannel(spark, sf)
    val nPurchases = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase").count()
    assert(att.count() == nPurchases, "one row per purchase, none dropped")
    val chRows = ch.collect()
    assert(chRows.map(_.getAs[Long]("n_purchases")).sum == nPurchases)
    val totalCents = att.agg(sum("value_cents")).head.getLong(0)
    assert(chRows.map(_.getAs[Long]("attributed_cents")).sum == totalCents,
      "last-touch credit conserves total revenue exactly")
    val channels = chRows.map(_.getAs[String]("channel")).toSet
    assert(channels.subsetOf(Set("click", "view", "direct")))
    assert((channels - "direct").nonEmpty, "attributed channels non-vacuous")
  }

  test("position model: U-shape split hand-checked, largest-remainder exact") {
    import spark.implicits._
    // one purchase of 10.01 (1001 cents) with 4 touches: weights
    // 4/1/1/4 over D=10 -> bases 400/100/100/400 (=1000), remainders
    // 4/1/1/4, leftover 1 cent goes to the largest-remainder touch with
    // the LOWEST position (the first touch, id 1). n=1 (u2) takes all;
    // n=2 (u3) splits 450/451 by the same rule (901 cents, rem 1/1,
    // position tie-break gives the extra cent to the first).
    val ev = Seq(
      (1L, 1L, "view", 100L, 0.0),
      (2L, 1L, "click", 200L, 0.0),
      (3L, 1L, "click", 300L, 0.0),
      (4L, 1L, "view", 400L, 0.0),
      (10L, 1L, "purchase", 1000L, 10.01),
      (5L, 2L, "click", 100L, 0.0),
      (20L, 2L, "purchase", 1000L, 5.00),
      (6L, 3L, "view", 100L, 0.0),
      (7L, 3L, "click", 200L, 0.0),
      (30L, 3L, "purchase", 1000L, 9.01),
      (40L, 4L, "purchase", 1000L, 2.00)
    ).toDF("event_id", "user_id", "event_type", "ts_sec", "value")
    val rows = core.AttributionQueries.attributionPositionOn(ev)
      .collect().map(r => r.getAs[String]("channel") ->
        (r.getAs[Long]("n_credits"), r.getAs[Long]("attributed_cents"))).toMap
    // u1: first view 400+1, middle clicks 100+100, last view 400
    // u2: click 500;  u3: first view 450+1, last click 450;  u4: direct 200
    assert(rows("view") == (3L, 1252L), s"views: ${rows("view")}")
    assert(rows("click") == (4L, 1150L), s"clicks: ${rows("click")}")
    assert(rows("direct") == (1L, 200L))
    assert(rows.values.map(_._2).sum == 1001L + 500L + 901L + 200L,
      "largest-remainder allocation conserves every purchase exactly")
  }

  test("position model on the corpus: conservation law holds exactly") {
    import org.apache.spark.sql.functions._
    val pos = core.AttributionQueries.eventsAttributionPosition(spark, sf)
    val totalCents = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .agg(sum((col("value").cast("decimal(10,2)") * 100).cast("long")))
      .head.getLong(0)
    val attributed = pos.agg(sum("attributed_cents")).head.getLong(0)
    assert(attributed == totalCents,
      s"position credits must sum to purchase total: $attributed != $totalCents")
  }
}
