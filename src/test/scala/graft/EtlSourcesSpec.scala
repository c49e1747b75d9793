package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** JSON-file ingest fidelity (the reference reads Spotify export JSON with
  * per-file error handling) + bucketed co-located joins (the 100 TB layout
  * for repeated fact-fact joins).
  */
class EtlSourcesSpec extends SparkSuite {

  test("orc roundtrip: hive partition layout, value-exact read-back, dir pruning") {
    import spark.implicits._
    val p = etl.OrcRoundtrip.orcPath(spark, sf)
    // hive layout: one l_returnflag= dir per flag value
    val dirs = new java.io.File(p).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("l_returnflag=")), dirs.mkString(","))
    // read-back row count and per-row values match the source exactly
    val src = Tables.lineitem(spark, sf)
      .select($"l_orderkey", $"l_partkey",
        $"l_quantity".cast("decimal(12,2)").as("qty"), $"l_returnflag")
      .collect().map(_.toSeq).toSet
    val back = spark.read.orc(p)
      .select($"l_orderkey", $"l_partkey", $"qty", $"l_returnflag")
      .collect().map(_.toSeq).toSet
    assert(back == src, "ORC round trip changed values")
    // a flag filter reaches the scan as a PARTITION filter (dir pruning),
    // and the pruned scan reads exactly one partition's files
    val prunedDf = spark.read.orc(p).filter($"l_returnflag" === "A")
    prunedDf.collect()
    val scans = tools.PlanWalk.flatten(prunedDf.queryExecution.executedPlan)
      .collect { case s: org.apache.spark.sql.execution.FileSourceScanExec => s }
    assert(scans.nonEmpty)
    scans.foreach { s =>
      assert(s.partitionFilters.exists(_.references.exists(_.name == "l_returnflag")),
        s"no partition filter on the ORC scan:\n$s")
      val files = s.relation.location.listFiles(s.partitionFilters, s.dataFilters)
        .flatMap(_.files).map(_.getPath.toString)
      assert(files.nonEmpty && files.forall(_.contains("l_returnflag=A")),
        s"pruned scan still lists foreign partitions: ${files.mkString(",")}")
    }
  }

  test("json ingest: explicit schema, corrupt-record quarantine, delta load") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_json").toString
    val good = (0 until 20).map { i =>
      s"""{"ts":"2024-01-${"%02d".format(i % 28 + 1)}T10:00:00Z","platform":"ios","ms_played":${i * 1000},""" +
        s""""conn_country":"DE","ip_addr":"10.0.0.$i","master_metadata_track_name":"t$i",""" +
        s""""master_metadata_album_artist_name":"a","master_metadata_album_album_name":"al",""" +
        s""""spotify_track_uri":"spotify:track:$i","episode_name":null,"episode_show_name":null,""" +
        s""""spotify_episode_uri":null,"reason_start":"clickrow","reason_end":"trackdone",""" +
        s""""shuffle":true,"skipped":false,"offline":false,"offline_timestamp":0,"incognito_mode":false}"""
    }
    val bad = Seq(
      """{"ts":"not-a-timestamp","platform":"ios","ms_played":5}""",
      """{"ts":"2024-01-01T10:00:00Z","platform":"ios","ms_played":-4}""",
      """{"ts":"2024-01-01T11:00:00Z","platform":"ios","ms_played":null}""",
      """{this is not json at all""")
    Files.write(java.nio.file.Paths.get(dir, "history_0.json"),
      scala.util.Random.shuffle(good ++ bad).mkString("\n").getBytes)

    val raw = etl.Extractor.readHistoryJson(spark, dir)
    val (clean, quarantine) = etl.Extractor.cleanHistory(raw)
    assert(clean.count() == 20)
    // quarantine is the exact complement of clean: every bad row lands in
    // it, including NULL ms_played (which satisfies neither >= 0 nor < 0)
    val reasons = quarantine.collect().map(_.getAs[String]("error_reason")).sorted
    assert(reasons.toSeq ==
      Seq("malformed json", "negative ms_played", "null ms_played", "unparseable ts"))
    assert(clean.count() + quarantine.count() == raw.count())

    // delta load: with the first 10 days already loaded, only newer arrive
    val loaded = clean.filter(dayofmonth($"ts_utc") <= 10)
    val delta = etl.Extractor.deltaLoad(clean, loaded)
    val expected = clean.collect().map(_.getAs[java.sql.Timestamp]("ts_utc"))
      .count(_.after(loaded.agg(max($"ts_utc")).collect().head.getTimestamp(0)))
    assert(delta.count() == expected && expected > 0)
  }

  test("bucketed tables: co-located fact-fact join needs no shuffle") {
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    // the in-memory catalog forgets tables across JVMs but the managed
    // location survives on disk — clear it or CTAS fails
    Seq("li_bucketed", "ord_bucketed").foreach { t =>
      val dir = new java.io.File(s"/tmp/graft_warehouse/$t")
      if (dir.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(dir)
      }
    }
    Tables.lineitem(spark, sf).select($"l_orderkey", $"l_quantity")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_bucketed")
    Tables.orders(spark, sf).select($"o_orderkey", $"o_totalprice")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("ord_bucketed")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"), $"l_orderkey" === $"o_orderkey")
      joined.collect()
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), p)
      assert(!p.contains("Exchange"), s"bucketed join should not shuffle:\n$p")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("bucketed warehouse: upsert anti-join shuffles only the incoming batch") {
    import spark.implicits._
    // li_bucketed (created above) plays the bucketed warehouse: the
    // ON-CONFLICT anti-join hashes the SMALL incoming batch to the
    // warehouse's bucketing; the big side is read in place — the
    // upsertWarehouseSink scale path from its scaladoc, proven on a plan
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val batch = spark.range(0, 1000).select(($"id" * 3).as("l_orderkey"))
      val fresh = batch.join(
        spark.table("li_bucketed").select($"l_orderkey"), Seq("l_orderkey"), "left_anti")
      fresh.collect()
      val p = fresh.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head // AQE echoes the pre-AQE plan below
      val exchanges = p.split("Exchange").length - 1
      assert(exchanges == 1, s"expected exactly one (batch-side) exchange:\n$p")
      assert(p.contains("Bucketed: true"), p)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("schema evolution: merged read backfills exactly the absent-column rows") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rows = etl.EtlQueries.schemaEvolution(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n_orders")).sum ==
      Tables.orders(spark, sf).count(), "every order lands exactly once")
    // the old batch (no priority column) must surface ONLY as (UNKNOWN, legacy)
    rows.foreach { r =>
      val (p, c) = (r.getAs[String]("priority"), r.getAs[String]("channel"))
      if (p == "UNKNOWN") assert(c == "legacy", "absent columns travel together")
      else assert(c == "api" || c == "batch")
    }
    assert(rows.exists(_.getAs[String]("priority") == "UNKNOWN"), "old batch non-vacuous")
    assert(rows.map(_.getAs[String]("channel")).toSet.contains("api"))
    // watermark split is a real split: UNKNOWN keys all below every new-batch key
    val unknownMax = rows.filter(_.getAs[String]("priority") == "UNKNOWN")
      .map(_.getAs[Long]("max_key")).max
    val newMin = rows.filter(_.getAs[String]("priority") != "UNKNOWN")
      .map(_.getAs[Long]("min_key")).min
    assert(unknownMax < newMin)
  }

  test("pit join: every purchase resolves to the scd2 interval containing it") {
    import spark.implicits._
    val dim = etl.EtlQueries.scd2History(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        if (r.isNullAt(4)) Long.MaxValue else r.getLong(4)))
    val byUser = dim.groupBy(_._1)
    val got = etl.EtlQueries.pitJoin(spark, sf).collect()
    val nPurchases = Tables.events(spark, sf)
      .filter(org.apache.spark.sql.functions.col("event_type") === "purchase").count()
    assert(got.length == nPurchases, "left join keeps every purchase")
    got.foreach { r =>
      val (u, ts) = (r.getLong(1), r.getLong(2))
      val hit = byUser.get(u).flatMap(_.find { case (_, _, _, from, to) =>
        from <= ts && ts < to })
      hit match {
        case Some((_, v, st, _, _)) =>
          assert(r.getLong(3) == v && r.getString(4) == st,
            s"purchase ${r.getLong(0)}: version/state must match the containing interval")
        case None =>
          assert(r.isNullAt(3), s"purchase ${r.getLong(0)}: no interval → null version")
      }
    }
  }
}
