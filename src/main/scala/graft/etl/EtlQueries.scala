package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** The reference's Extract + Transform surface (reference:
  * scripts/etl/extractor.py, scripts/etl/transformer.py,
  * docs/sql/dim_date_populate.sql, dim_time_populate.sql) re-expressed
  * declaratively on Spark.
  *
  * Role mapping: `events` is the raw streaming history (ts / user_id /
  * event_type / value / props ≈ ts / entity / reason / sec_played / raw
  * JSON); `documents` carries the dirty release-date payloads; `supplier`
  * is the already-loaded core dim for new-item detection.
  *
  * The reference processes in client-side batches of 50 with a retry loop;
  * on Spark every one of those steps is a set-oriented plan instead —
  * enrichment is a broadcast join against the (deduplicated) key set, delta
  * load is a scalar-subquery watermark that stays in the plan, new-item
  * detection is two anti-joins. Nothing is collected to the driver.
  */
object EtlQueries {

  private def dec(c: Column, p: Int = 12, s: Int = 2): Column = c.cast(s"decimal($p,$s)")

  // ---------------------------------------------------------------- extract

  /** extractor.py:18 extract_streaming_history — raw-file ingest with schema
    * projection, ts parsing (minute precision like the staging layer), and
    * raw-JSON payload extraction, keeping only valid rows.
    */
  def extractHistory(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .filter($"value" >= 0 && $"event_type".isNotNull)
      .select(
        $"event_id",
        date_trunc("minute", $"ts").as("ts_minute"),
        $"user_id", $"event_type",
        $"value".as("sec_played"),
        get_json_object($"props", "$.k").cast("long").as("k"))
      .orderBy($"event_id")
  }

  val extractHistorySql: String =
    """SELECT event_id,
      |  date_trunc('minute', CAST(ts AS TIMESTAMP)) AS ts_minute,
      |  user_id, event_type,
      |  value AS sec_played,
      |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      |FROM events
      |WHERE value >= 0 AND event_type IS NOT NULL
      |ORDER BY event_id""".stripMargin

  /** transformer.py:251 insert_core_facts, WHERE s.ts > (SELECT COALESCE(MAX…))
    * — delta load: only rows newer than the loaded watermark. The watermark
    * is a scalar aggregate that stays in the plan (broadcast, no collect).
    */
  def deltaLoad(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val watermark = Tables.orders(spark, dir)
      .filter($"o_orderstatus" === "F")
      .agg(coalesce(max($"o_orderdate"), lit("1900-01-01").cast("timestamp")).as("wm"))
    Tables.lineitem(spark, dir)
      .join(broadcast(watermark), $"l_shipdate" > $"wm")
      .select($"l_orderkey", $"l_linenumber", $"l_shipdate", $"l_quantity".as("quantity"))
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  val deltaLoadSql: String =
    """SELECT l_orderkey, l_linenumber, l_shipdate, l_quantity AS quantity
      |FROM lineitem
      |WHERE l_shipdate > (
      |  SELECT COALESCE(MAX(o_orderdate), TIMESTAMP '1900-01-01')
      |  FROM orders WHERE o_orderstatus = 'F')
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** extractor.py:227 _get_new_items — new unique keys = staged − core −
    * already-staged, as two LEFT ANTI joins (the distributed form of the
    * reference's Python set difference).
    */
  def newItems(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val staged  = Tables.events(spark, dir).select($"user_id").distinct()
    val core    = Tables.supplier(spark, dir).select($"s_suppkey".as("user_id"))
    val already = Tables.events(spark, dir)
      .filter($"event_type" === "signup" && $"event_id" < 1000)
      .select($"user_id").distinct()
    staged
      .join(broadcast(core), Seq("user_id"), "left_anti")
      .join(broadcast(already), Seq("user_id"), "left_anti")
      .orderBy($"user_id")
  }

  val newItemsSql: String =
    """SELECT DISTINCT user_id FROM events
      |WHERE user_id NOT IN (SELECT s_suppkey FROM supplier)
      |  AND user_id NOT IN (SELECT user_id FROM events WHERE event_type = 'signup' AND event_id < 1000)
      |ORDER BY user_id""".stripMargin

  // ------------------------------------------------------------------ dims

  /** dim_date_populate.sql — generated calendar 2018-01-01..2030-12-31. */
  def dimDate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d = date_add(to_date(lit("2018-01-01")), $"id".cast("int"))
    spark.range(0, 4748)
      .select(d.as("d"))
      .select(
        (year($"d") * 10000 + month($"d") * 100 + dayofmonth($"d")).cast("long").as("date_id"),
        $"d".cast("timestamp").as("date"),
        year($"d").cast("long").as("year"),
        month($"d").cast("long").as("month_num"),
        date_format($"d", "MMM").as("month_abbr"),
        date_format($"d", "MMMM").as("month_name"),
        dayofmonth($"d").cast("long").as("day"),
        date_format($"d", "EEEE").as("day_name"),
        weekofyear($"d").cast("long").as("week"),
        date_format($"d", "EEEE").isin("Saturday", "Sunday").as("is_weekend"))
      .orderBy($"date_id")
  }

  val dimDateSql: String =
    """SELECT
      |  CAST(year(d) * 10000 + month(d) * 100 + day(d) AS BIGINT) AS date_id,
      |  CAST(d AS TIMESTAMP) AS date,
      |  CAST(year(d) AS BIGINT) AS year,
      |  CAST(month(d) AS BIGINT) AS month_num,
      |  strftime(d, '%b') AS month_abbr,
      |  monthname(d) AS month_name,
      |  CAST(day(d) AS BIGINT) AS day,
      |  dayname(d) AS day_name,
      |  CAST(week(d) AS BIGINT) AS week,
      |  isodow(d) IN (6, 7) AS is_weekend
      |FROM generate_series(DATE '2018-01-01', DATE '2030-12-31', INTERVAL 1 DAY) t(d)
      |ORDER BY date_id""".stripMargin

  /** dim_time_populate.sql — 1440-row minute dim with part-of-day buckets. */
  def dimTime(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.range(0, 1440)
      .select(
        $"id".as("time_id"),
        format_string("%02d:%02d", ($"id" / 60).cast("int"), ($"id" % 60).cast("int")).as("time"),
        ($"id" / 60).cast("long").as("hour"),
        ($"id" % 60).cast("long").as("minute"),
        when($"id" / 60 >= 6 && $"id" / 60 < 12, "morning")
          .when($"id" / 60 >= 12 && $"id" / 60 < 18, "afternoon")
          .when($"id" / 60 >= 18 && $"id" / 60 < 23, "evening")
          .otherwise("night").as("part_of_day"))
      .orderBy($"time_id")
  }

  val dimTimeSql: String =
    """SELECT t AS time_id,
      |  printf('%02d:%02d', t // 60, t % 60) AS time,
      |  t // 60 AS hour,
      |  t % 60 AS minute,
      |  CASE WHEN t // 60 >= 6 AND t // 60 < 12 THEN 'morning'
      |       WHEN t // 60 >= 12 AND t // 60 < 18 THEN 'afternoon'
      |       WHEN t // 60 >= 18 AND t // 60 < 23 THEN 'evening'
      |       ELSE 'night' END AS part_of_day
      |FROM generate_series(0, 1439) s(t)
      |ORDER BY time_id""".stripMargin

  /** transformer.py:351 populate_dim_reason — distinct reason values per group
    * via UNION ALL (the reference's re-runnable upsert source query).
    */
  def dimReason(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
    val start = ev.select($"event_type".as("reason_type")).distinct()
      .withColumn("reason_group", lit("start"))
    val end = ev.select($"event_type".as("reason_type")).distinct()
      .withColumn("reason_group", lit("end"))
    start.unionAll(end).orderBy($"reason_group", $"reason_type")
  }

  val dimReasonSql: String =
    """SELECT * FROM (
      |  SELECT DISTINCT event_type AS reason_type, 'start' AS reason_group FROM events
      |  UNION ALL
      |  SELECT DISTINCT event_type AS reason_type, 'end' AS reason_group FROM events
      |)
      |ORDER BY reason_group, reason_type""".stripMargin

  // ----------------------------------------------------------- transform

  /** Synthetic dirty release dates over documents: deterministic
    * (raw, precision) pairs covering every branch of the reference's
    * normalizer — including the `0000` bad-data case.
    */
  private def rawDates(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val y = lit(1990) + $"doc_id" % 40
    val m = lit(1) + $"doc_id" % 12
    val d = lit(1) + $"doc_id" % 28
    Tables.documents(spark, dir)
      .select($"doc_id",
        when($"doc_id" % 4 === 0, lit("0000"))
          .when($"doc_id" % 4 === 1, y.cast("string"))
          .when($"doc_id" % 4 === 2, format_string("%04d-%02d", y.cast("int"), m.cast("int")))
          .otherwise(format_string("%04d-%02d-%02d", y.cast("int"), m.cast("int"), d.cast("int")))
          .as("raw_release_date"),
        when($"doc_id" % 4 === 1, "year")
          .when($"doc_id" % 4 === 2, "month")
          .otherwise("day").as("precision"))
  }

  private val rawDatesCte: String =
    """WITH raw AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 4 = 0 THEN '0000'
      |         WHEN doc_id % 4 = 1 THEN printf('%04d', 1990 + doc_id % 40)
      |         WHEN doc_id % 4 = 2 THEN printf('%04d-%02d', 1990 + doc_id % 40, 1 + doc_id % 12)
      |         ELSE printf('%04d-%02d-%02d', 1990 + doc_id % 40, 1 + doc_id % 12, 1 + doc_id % 28)
      |    END AS raw_release_date,
      |    CASE WHEN doc_id % 4 = 1 THEN 'year'
      |         WHEN doc_id % 4 = 2 THEN 'month'
      |         ELSE 'day' END AS precision
      |  FROM documents
      |)""".stripMargin

  /** transformer.py:132 _normalise_date — precision-aware date normalization
    * with the `0000` → 1900-01-01 bad-data rule, as a single vectorized
    * CASE (vs the reference's per-row Python).
    */
  def cleanDates(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    rawDates(spark, dir)
      .withColumn("clean_release_date",
        when($"raw_release_date".startsWith("0000"), lit("1900-01-01"))
          .when($"precision" === "year", concat($"raw_release_date", lit("-01-01")))
          .when($"precision" === "month", concat($"raw_release_date", lit("-01")))
          .otherwise($"raw_release_date"))
      .withColumn("release_ts", to_timestamp($"clean_release_date", "yyyy-MM-dd"))
      .orderBy($"doc_id")
  }

  val cleanDatesSql: String =
    s"""$rawDatesCte
       |SELECT doc_id, raw_release_date, precision,
       |  CASE WHEN raw_release_date LIKE '0000%' THEN '1900-01-01'
       |       WHEN precision = 'year' THEN raw_release_date || '-01-01'
       |       WHEN precision = 'month' THEN raw_release_date || '-01'
       |       ELSE raw_release_date END AS clean_release_date,
       |  CAST(strptime(CASE WHEN raw_release_date LIKE '0000%' THEN '1900-01-01'
       |       WHEN precision = 'year' THEN raw_release_date || '-01-01'
       |       WHEN precision = 'month' THEN raw_release_date || '-01'
       |       ELSE raw_release_date END, '%Y-%m-%d') AS TIMESTAMP) AS release_ts
       |FROM raw
       |ORDER BY doc_id""".stripMargin

  /** extractor.py:143 _process_spotify_batch — metadata enrichment. The
    * reference fetches 50-URI batches from the API in a retry loop; here
    * the "API" is a deterministic generated dim and enrichment is one
    * broadcast join against the deduplicated key set.
    */
  def enrichMetadata(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val plays = Tables.events(spark, dir)
      .groupBy($"user_id")
      .agg(count(lit(1)).as("plays"), sum(dec($"value", 10, 2)).cast("double").as("total_value"))
    val api = plays.select($"user_id").distinct()
      .select($"user_id",
        concat(lit("user_"), $"user_id").as("display_name"),
        (($"user_id" + 1) * 30000).as("duration_ms"),
        ((($"user_id" + 1) * 30000) / 1000).cast("long").as("duration_sec"))
    plays.join(broadcast(api), Seq("user_id"))
      .select($"user_id", $"display_name", $"duration_ms", $"duration_sec", $"plays", $"total_value")
      .orderBy($"user_id")
  }

  val enrichMetadataSql: String =
    """WITH plays AS (
      |  SELECT user_id, COUNT(*) AS plays,
      |    CAST(SUM(CAST(value AS DECIMAL(10,2))) AS DOUBLE) AS total_value
      |  FROM events GROUP BY user_id
      |), api AS (
      |  SELECT DISTINCT user_id,
      |    'user_' || CAST(user_id AS VARCHAR) AS display_name,
      |    (user_id + 1) * 30000 AS duration_ms,
      |    (user_id + 1) * 30000 // 1000 AS duration_sec
      |  FROM plays
      |)
      |SELECT p.user_id, display_name, duration_ms, duration_sec, plays, total_value
      |FROM plays p JOIN api USING (user_id)
      |ORDER BY user_id""".stripMargin

  /** etl_internal.failed_uris — quarantine rows that fail cleaning rules,
    * with an error reason (the reference's failed-URI tracking).
    */
  def failedUris(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bad  = rawDates(spark, dir)
      .filter($"raw_release_date".startsWith("0000"))
      .select($"doc_id", lit("invalid release date: 0000").as("error_reason"))
    val short = Tables.documents(spark, dir)
      .filter($"n_chars" < 150)
      .select($"doc_id", lit("payload too short").as("error_reason"))
    bad.unionAll(short).orderBy($"doc_id", $"error_reason")
  }

  val failedUrisSql: String =
    s"""$rawDatesCte
       |SELECT * FROM (
       |  SELECT doc_id, 'invalid release date: 0000' AS error_reason
       |  FROM raw WHERE raw_release_date LIKE '0000%'
       |  UNION ALL
       |  SELECT doc_id, 'payload too short' AS error_reason
       |  FROM documents WHERE n_chars < 150
       |)
       |ORDER BY doc_id, error_reason""".stripMargin

  /** transformer.py:_clean_* — staged raw-JSON payload → typed columns,
    * then grouped (the staging jsonb unpack, vectorized).
    */
  def jsonExtract(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .select(get_json_object($"props", "$.k").cast("long").as("k"), dec($"value", 10, 2).as("v"))
      .groupBy($"k")
      .agg(count(lit(1)).as("n"), sum($"v").cast("double").as("total_value"))
      .orderBy($"k")
  }

  val jsonExtractSql: String =
    """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(10,2))) AS DOUBLE) AS total_value
      |FROM events
      |GROUP BY 1
      |ORDER BY k""".stripMargin

  /** transformer.py:13 _clean_track / :54 _clean_artist — the reference's
    * hardest JSON shape: the staged API payload is a nested object whose
    * `album.images` array holds cover-art candidates, and cleaning picks an
    * image URL from the array (`raw["images"][0]["url"]`; the Spotify API
    * orders images largest-first, so the pick is "the largest image").
    *
    * The stage step builds the raw payload deterministically from `part`
    * (no live API in this environment), exactly as it would sit in
    * staging.raw_json; the extract step then does the real work under
    * test: `from_json` with an explicit nested schema and a
    * largest-by-height array pick (first-in-array-order on ties — same
    * rule both engines). Fully map-side: parse + pick never shuffle.
    */
  def jsonNested(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    jsonNestedCore(spark, dir).orderBy($"p_partkey")
  }

  /** CSV INGEST with malformed-line quarantine — the delimited-text
    * source path beside the JSON one (the reference consumes JSON APIs;
    * a warehouse also swallows partner CSV drops, and the failure mode
    * there is the truncated/ragged line): the stage step renders each
    * event as a CSV line deterministically (ts formatted, value as the
    * 2-decimal string both engines print identically), PLANTS truncation
    * on every 97th event id (the retry-lattice device: corruption is
    * part of the fixture, not luck), and the ingest step under test is
    * Spark's REAL `from_csv` in PERMISSIVE mode with an explicit schema
    * — a ragged line parses to nulls in the missing tail fields and is
    * quarantined by a required-field check, never dropped silently
    * (transformer.py's validate-then-route contract on the CSV axis).
    * The oracle replays the same line logic with string splits: the
    * parser is what's being checked against it. Output: per-outcome
    * audit (parsed rows also re-aggregate by type to prove the payload
    * survived the round-trip, not just the row count). Fully map-side
    * until the bounded audit groupBy.
    */
  def csvIngest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val full = concat_ws(",",
      $"event_id",
      date_format($"ts", "yyyy-MM-dd HH:mm:ss"),
      $"user_id", $"event_type",
      $"value".cast("decimal(10,2)").cast("string"))
    val truncated = concat_ws(",",
      $"event_id", date_format($"ts", "yyyy-MM-dd HH:mm:ss"))
    val lines = Tables.events(spark, dir)
      .select(when($"event_id" % 97 === 0, truncated).otherwise(full).as("line"))
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType)))
    val parsed = lines.select(from_csv($"line",
      schema, Map("timestampFormat" -> "yyyy-MM-dd HH:mm:ss")).as("r"))
      .select($"r.*")
      .withColumn("ok",
        $"user_id".isNotNull && $"event_type".isNotNull && $"value".isNotNull)
    parsed
      .groupBy(when($"ok", $"event_type").otherwise("_quarantined").as("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        countDistinct($"user_id").as("n_users"),
        sum($"value".cast("decimal(10,2)")).cast("double").as("sum_value"))
      .orderBy($"bucket")
  }

  val csvIngestSql: String =
    """WITH lines AS (
      |  SELECT CASE WHEN event_id % 97 = 0
      |    THEN CAST(event_id AS VARCHAR) || ','
      |      || strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S')
      |    ELSE CAST(event_id AS VARCHAR) || ','
      |      || strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') || ','
      |      || CAST(user_id AS VARCHAR) || ',' || event_type || ','
      |      || CAST(CAST(value AS DECIMAL(10,2)) AS VARCHAR)
      |    END AS line
      |  FROM events
      |), parsed AS (
      |  SELECT string_split(line, ',') AS f FROM lines
      |), routed AS (
      |  SELECT
      |    CASE WHEN len(f) = 5 THEN f[4] ELSE '_quarantined' END AS bucket,
      |    CASE WHEN len(f) = 5 THEN CAST(f[3] AS BIGINT) END AS user_id,
      |    CASE WHEN len(f) = 5 THEN CAST(f[5] AS DECIMAL(10,2)) END AS v
      |  FROM parsed
      |)
      |SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
      |  CAST(SUM(v) AS DOUBLE) AS sum_value
      |FROM routed
      |GROUP BY bucket
      |ORDER BY bucket""".stripMargin

  /** [[jsonNested]] without the presentation sort — the join-side form
    * (MartQueries.topTracks broadcasts the (p_partkey, cover_art_url)
    * projection; a sort below a broadcast build is wasted work).
    */
  def jsonNestedCore(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pk = $"p_partkey".cast("string")
    val staged = Tables.part(spark, dir).select($"p_partkey",
      to_json(struct(
        concat(lit("track:"), pk).as("uri"),
        $"p_name".as("name"),
        struct(array(
          struct(concat(lit("img://"), pk, lit("/a")).as("url"),
            (pmod($"p_partkey", lit(400)) + 241).cast("long").as("height")),
          struct(concat(lit("img://"), pk, lit("/b")).as("url"), lit(300L).as("height")),
          struct(concat(lit("img://"), pk, lit("/c")).as("url"), lit(64L).as("height"))
        ).as("images")).as("album")
      )).as("raw_json"))
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "uri STRING, name STRING, album STRUCT<images: ARRAY<STRUCT<url: STRING, height: BIGINT>>>")
    staged
      .select($"p_partkey", from_json($"raw_json", schema).as("j"))
      .withColumn("images", $"j.album.images")
      .withColumn("max_height", array_max(transform($"images", i => i.getField("height"))))
      .select(
        $"p_partkey",
        $"j.uri".as("uri"),
        $"j.name".as("name"),
        element_at(filter($"images", i => i.getField("height") === $"max_height"), 1)
          .getField("url").as("cover_art_url"),
        size($"images").cast("long").as("n_images"),
        $"max_height")
  }

  val jsonNestedSql: String =
    """WITH staged AS (
      |  SELECT p_partkey, to_json(struct_pack(
      |    uri := 'track:' || p_partkey,
      |    name := p_name,
      |    album := struct_pack(images := [
      |      struct_pack(url := 'img://' || p_partkey || '/a', height := p_partkey % 400 + 241),
      |      struct_pack(url := 'img://' || p_partkey || '/b', height := 300),
      |      struct_pack(url := 'img://' || p_partkey || '/c', height := 64)])
      |  )) AS raw_json FROM part
      |), ext AS (
      |  SELECT p_partkey,
      |    json_extract_string(raw_json, '$.uri') AS uri,
      |    json_extract_string(raw_json, '$.name') AS name,
      |    CAST(json_transform(raw_json, '{"album":{"images":[{"url":"VARCHAR","height":"BIGINT"}]}}').album.images
      |      AS STRUCT(url VARCHAR, height BIGINT)[]) AS images
      |  FROM staged
      |)
      |SELECT p_partkey, uri, name,
      |  list_filter(images, x -> x.height = list_max(list_transform(images, y -> y.height)))[1].url AS cover_art_url,
      |  CAST(len(images) AS BIGINT) AS n_images,
      |  CAST(list_max(list_transform(images, y -> y.height)) AS BIGINT) AS max_height
      |FROM ext
      |ORDER BY p_partkey""".stripMargin

  /** ON CONFLICT DO NOTHING / re-runnable loads — keep the first row per
    * natural key (deterministic row_number pick, one shuffle on the key).
    */
  def dedupStaging(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select($"user_id", $"event_type", $"event_id", unix_timestamp($"ts").as("ts_sec"))
    val w = Window.partitionBy($"user_id", $"event_type").orderBy($"ts_sec", $"event_id")
    ev.withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .drop("rn")
      .orderBy($"user_id", $"event_type")
  }

  val dedupStagingSql: String =
    """SELECT user_id, event_type, event_id, ts_sec FROM (
      |  SELECT user_id, event_type, event_id,
      |    CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS ts_sec,
      |    row_number() OVER (PARTITION BY user_id, event_type
      |      ORDER BY CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT), event_id) AS rn
      |  FROM events
      |)
      |WHERE rn = 1
      |ORDER BY user_id, event_type""".stripMargin

  /** transformer.py:251 insert_core_facts — the full fact build: history rows
    * FK-resolved against the generated date/time dims (broadcast joins),
    * enriched with the metadata dim for percent_played, timezone-shifted
    * like the reference's UTC→MSK (fixed +3h here: no tzdata dependency).
    */
  def factBuild(spark: SparkSession, dir: String): DataFrame =
    // ORACLE GATE ONLY: the trailing global orderBy pins row order for the
    // driver's hash compare. Production is factBuildCore (ends at the
    // joins/project) — a corpus-sized total order is a full range
    // exchange no fact-landing job wants; see SURVEY §4 / PLANS.md.
    factBuildCore(spark, dir).orderBy(col("event_id"))

  /** Production shape of the full fact build: broadcast dim joins +
    * project, NO global sort. [[factBuild]] wraps it with the gate-only
    * ORDER BY.
    */
  def factBuildCore(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select($"event_id", $"user_id", $"event_type", $"value".as("sec_played"),
        ($"ts" + expr("INTERVAL 3 HOURS")).as("ts_msk"))
    val dd = dimDate(spark, dir).select($"date_id", $"date", $"day_name", $"is_weekend")
    val dt = dimTime(spark, dir).select($"time_id", $"part_of_day")
    val api = ev.select($"user_id").distinct()
      .select($"user_id", ((($"user_id" + 1) * 30000) / 1000).cast("long").as("duration_sec"))
    ev.join(broadcast(dd), date_trunc("day", $"ts_msk") === $"date")
      .join(broadcast(dt), (hour($"ts_msk") * 60 + minute($"ts_msk")) === $"time_id")
      .join(broadcast(api), Seq("user_id"))
      .select(
        $"event_id", $"ts_msk", $"date_id".as("date_fk"), $"time_id".as("time_fk"),
        $"user_id", $"event_type", $"sec_played",
        (floor($"sec_played" / nullif($"duration_sec", lit(0)).cast("double") * 100.0 * 10.0 + 0.5) / 10.0)
          .as("percent_played"),
        $"day_name", $"is_weekend", $"part_of_day")
  }

  val factBuildSql: String =
    """WITH dd AS (
      |  SELECT CAST(year(d) * 10000 + month(d) * 100 + day(d) AS BIGINT) AS date_id,
      |    CAST(d AS TIMESTAMP) AS date, dayname(d) AS day_name, isodow(d) IN (6,7) AS is_weekend
      |  FROM generate_series(DATE '2018-01-01', DATE '2030-12-31', INTERVAL 1 DAY) t(d)
      |), dt AS (
      |  SELECT t AS time_id,
      |    CASE WHEN t // 60 >= 6 AND t // 60 < 12 THEN 'morning'
      |         WHEN t // 60 >= 12 AND t // 60 < 18 THEN 'afternoon'
      |         WHEN t // 60 >= 18 AND t // 60 < 23 THEN 'evening'
      |         ELSE 'night' END AS part_of_day
      |  FROM generate_series(0, 1439) s(t)
      |), ev AS (
      |  SELECT event_id, user_id, event_type,
      |    value AS sec_played,
      |    CAST(ts AS TIMESTAMP) + INTERVAL 3 HOUR AS ts_msk
      |  FROM events
      |), api AS (
      |  SELECT DISTINCT user_id, (user_id + 1) * 30000 // 1000 AS duration_sec FROM events
      |)
      |SELECT event_id, ts_msk, date_id AS date_fk, time_id AS time_fk,
      |  ev.user_id, event_type, sec_played,
      |  floor(sec_played / CAST(nullif(duration_sec, 0) AS DOUBLE) * 100.0 * 10.0 + 0.5) / 10.0
      |    AS percent_played,
      |  day_name, is_weekend, part_of_day
      |FROM ev
      |JOIN dd ON date_trunc('day', ts_msk) = dd.date
      |JOIN dt ON hour(ts_msk) * 60 + minute(ts_msk) = dt.time_id
      |JOIN api ON ev.user_id = api.user_id
      |ORDER BY event_id""".stripMargin

  /** SCD2 dimension build — the history-PRESERVING alternative to the
    * reference's ON CONFLICT upsert family (ts_version_mapping rewrites a
    * mapping in place; an SCD2 dim would version it): per user, each CHANGE
    * of event_type closes the previous version and opens a new one with
    * HALF-OPEN [valid_from_sec, valid_to_sec) bounds (valid_to = the next
    * version's valid_from; null while current) and an is_current flag.
    * Half-open is the standard SCD2 convention precisely because a closed
    * `next−1` bound inverts when two changes land in the same second —
    * here a same-second change just yields an empty (zero-duration)
    * version, never an inverted one. Change detection (lag), versioning
    * (row_number) and interval close (lead) all share one (user_id)
    * partitioning — a single shuffle end to end, and at 100 TB the state
    * per window group is one user's rows.
    */
  def scd2History(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts_sec", $"event_id")
    val ev = Tables.events(spark, dir)
      .select($"user_id", $"event_id", $"event_type", unix_timestamp($"ts").as("ts_sec"))
    val changes = ev
      .withColumn("prev_type", lag($"event_type", 1).over(w))
      .filter($"prev_type".isNull || $"prev_type" =!= $"event_type")
    changes
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("valid_to_sec", lead($"ts_sec", 1).over(w))
      .withColumn("is_current", lead($"ts_sec", 1).over(w).isNull)
      .select($"user_id", $"version", $"event_type", $"ts_sec".as("valid_from_sec"),
        $"valid_to_sec", $"is_current")
      .orderBy($"user_id", $"version")
  }

  val scd2HistorySql: String =
    """WITH ev AS (
      |  SELECT user_id, event_id, event_type,
      |    CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS ts_sec
      |  FROM events
      |), ch AS (
      |  SELECT user_id, event_id, event_type, ts_sec,
      |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts_sec, event_id) AS prev_type
      |  FROM ev
      |), chg AS (
      |  SELECT user_id, event_id, event_type, ts_sec FROM ch
      |  WHERE prev_type IS NULL OR prev_type <> event_type
      |)
      |SELECT user_id,
      |  CAST(row_number() OVER w AS BIGINT) AS version,
      |  event_type,
      |  ts_sec AS valid_from_sec,
      |  lead(ts_sec) OVER w AS valid_to_sec,
      |  lead(ts_sec) OVER w IS NULL AS is_current
      |FROM chg
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec, event_id)
      |ORDER BY user_id, version""".stripMargin

  /** extractor.py:_process_spotify_batch — the per-item retry loop: an item
    * whose metadata fetch fails is retried up to 3 times; items that
    * exhaust their retries land in etl_internal.failed_uris. The
    * imperative loop becomes a declarative attempt lattice: explode each
    * item into its (bounded) attempt numbers map-side, mark each attempt's
    * outcome with a deterministic hash (standing in for the stubbed API,
    * same device as enrichMetadata), and keep the first success per item.
    *
    * Scale shape: explode ×3 is map-side; the min-attempt rollup is one
    * partial-agg groupBy on the item key; the left join back to the item
    * set shares that key. No driver loop, no collect — the retry policy
    * rides inside the plan. (Production ids beyond 2³¹ would switch the
    * outcome hash to xxhash64; the Knuth form is kept engine-portable, as
    * in sample_domain_mix.)
    */
  def retryQuarantine(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val items = Tables.events(spark, dir).select($"user_id".as("item_id")).distinct()
    val ok = items
      .select($"item_id", explode(sequence(lit(1), lit(3))).as("attempt"))
      .filter((($"item_id" * 31 + $"attempt") * lit(2654435761L))
        % lit(1000000007L) % 10 < 7)
      .groupBy($"item_id").agg(min($"attempt").cast("long").as("first_success"))
    items.join(ok, Seq("item_id"), "left")
      .select($"item_id",
        coalesce($"first_success", lit(3L)).as("attempts_used"),
        when($"first_success".isNotNull, "loaded")
          .otherwise("quarantined").as("status"))
      .orderBy($"item_id")
  }

  val retryQuarantineSql: String =
    """WITH items AS (
      |  SELECT DISTINCT user_id AS item_id FROM events
      |), attempts AS (
      |  SELECT item_id, u AS attempt
      |  FROM items, UNNEST(range(1, 4)) AS r(u)
      |  WHERE ((item_id * 31 + u) * 2654435761) % 1000000007 % 10 < 7
      |), ok AS (
      |  SELECT item_id, MIN(attempt) AS first_success FROM attempts GROUP BY item_id
      |)
      |SELECT i.item_id,
      |  COALESCE(ok.first_success, 3) AS attempts_used,
      |  CASE WHEN ok.first_success IS NOT NULL THEN 'loaded'
      |       ELSE 'quarantined' END AS status
      |FROM items i LEFT JOIN ok USING (item_id)
      |ORDER BY item_id""".stripMargin

  /** §2 `etl_schema_evolution`: SCHEMA-DRIFT-tolerant ingest — the
    * "upstream added a column mid-stream" case every long-lived staging
    * area hits (the reference hardcodes its staging DDL, so a drifted
    * extract would crash the load; this entry is the declarative
    * handling). Two landed batches are derived from orders at the 70%
    * order-key watermark (the delta_load device, broadcast scalar — no
    * collect): the OLD batch lacks `o_orderpriority` entirely, the NEW
    * batch carries an ADDED `load_channel` column. Both land as real
    * parquet files with genuinely different schemas; the read is
    * `mergeSchema=true` over both dirs — Spark's schema-union contract,
    * exercised for real, not simulated — followed by explicit backfill
    * (`o_orderpriority → 'UNKNOWN'`, `load_channel → 'legacy'`: absent
    * column ≠ NULL-in-schema, the report makes the default visible).
    * Output is the unified (priority, channel) census, hash-held to an
    * oracle that recomputes the same split/backfill from the source
    * table directly — so the parquet round-trip, the schema union, and
    * the defaulting must all be lossless for the gate to pass. Scale:
    * one scan per batch write, one merged scan, one bounded groupBy;
    * mergeSchema's footer-union cost is per-FILE metadata, not data.
    */
  /** Session-lifetime cache of the two-schema batch dirs, keyed by
    * (session, data dir) with LOCKED population — the persisted-index
    * entries' discipline. Before this, the path was keyed only by
    * pid + dir.hashCode, so two concurrent invocations for the same dir
    * in one JVM (parallel test threads) raced: one overwrote b1/b2 while
    * the other read the merged view. Now the first caller writes once
    * behind the lock, every later caller reads the same immutable dirs,
    * and a shutdown hook sweeps them when the JVM exits.
    */
  private val schemaEvoCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), String]

  private def schemaEvoBase(spark: SparkSession, dir: String): String =
    schemaEvoCache.synchronized {
      schemaEvoCache.getOrElseUpdate((spark, dir), {
        import spark.implicits._
        val ord = Tables.orders(spark, dir)
        val wm = ord.agg(max($"o_orderkey").as("max_key"))
        val tagged = ord.crossJoin(broadcast(wm))
          .withColumn("is_old", $"o_orderkey" * 10 <= $"max_key" * 7)
        val base = s"${System.getProperty("java.io.tmpdir")}/graft_schema_evo_" +
          ProcessHandle.current().pid() + "_" +
          java.util.UUID.randomUUID().toString.take(8)
        tagged.filter($"is_old")
          .select($"o_orderkey", $"o_custkey", $"o_totalprice", $"o_orderstatus")
          .write.mode("overwrite").parquet(s"$base/b1")
        tagged.filter(!$"is_old")
          .select($"o_orderkey", $"o_custkey", $"o_totalprice", $"o_orderstatus",
            $"o_orderpriority",
            when($"o_orderkey" % 2 === 0, "api").otherwise("batch").as("load_channel"))
          .write.mode("overwrite").parquet(s"$base/b2")
        val baseDir = new java.io.File(base)
        Runtime.getRuntime.addShutdownHook(new Thread(() => {
          def rm(f: java.io.File): Unit = {
            Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
          }
          rm(baseDir)
        }))
        base
      })
    }

  def schemaEvolution(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = schemaEvoBase(spark, dir)
    val merged = spark.read.option("mergeSchema", "true")
      .parquet(s"$base/b1", s"$base/b2")
    merged
      .withColumn("priority", coalesce($"o_orderpriority", lit("UNKNOWN")))
      .withColumn("channel", coalesce($"load_channel", lit("legacy")))
      .groupBy($"priority", $"channel")
      .agg(count(lit(1)).as("n_orders"),
        sum($"o_totalprice".cast("decimal(12,2)")).cast("double").as("sum_total"),
        min($"o_orderkey").as("min_key"),
        max($"o_orderkey").as("max_key"))
      .orderBy($"priority", $"channel")
  }

  val schemaEvolutionSql: String =
    """WITH m AS (
      |  SELECT MAX(o_orderkey) AS max_key FROM orders
      |), unified AS (
      |  SELECT o_orderkey, o_totalprice,
      |    CASE WHEN o_orderkey * 10 <= max_key * 7 THEN 'UNKNOWN'
      |         ELSE o_orderpriority END AS priority,
      |    CASE WHEN o_orderkey * 10 <= max_key * 7 THEN 'legacy'
      |         WHEN o_orderkey % 2 = 0 THEN 'api' ELSE 'batch' END AS channel
      |  FROM orders, m
      |)
      |SELECT priority, channel, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_total,
      |  MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key
      |FROM unified
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin

  /** §2 `etl_pit_join`: POINT-IN-TIME join against the SCD2 dimension —
    * the reason SCD2 history exists at all: each purchase is joined to
    * the dim VERSION that was valid at its event time (state-at-event,
    * never today's state — joining facts to a current-only dim silently
    * rewrites history). Implemented as the AS-OF join it mathematically
    * is: versions tile each user's timeline, so "the version whose
    * [valid_from, valid_to) contains ts" ≡ "the last version with
    * valid_from ≤ ts" — ONE shuffle via the shared
    * [[graft.ops.AsofJoin.asof]] union+window core instead of an
    * interval-predicate join that would multiply rows before filtering.
    * Boundary semantics: ts == valid_from matches the NEW version
    * (inclusive-from, exclusive-to), identical in the DuckDB ASOF
    * oracle. Dim rows come from [[scd2History]]'s logic verbatim so the
    * two entries can never disagree on version boundaries.
    */
  def pitJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select($"event_id", $"user_id", unix_timestamp($"ts").as("ts_sec"), $"event_type")
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts_sec")
    val dim = scd2History(spark, dir)
      .select($"user_id", $"valid_from_sec".as("ts_sec"),
        $"version", $"event_type".as("state"))
    graft.ops.AsofJoin.asof(purchases, dim, "user_id", "ts_sec", Seq("version", "state"))
      .select($"event_id", $"user_id", $"ts_sec".as("purchase_ts_sec"),
        $"asof_version".as("version"), $"asof_state".as("state"))
      .orderBy($"event_id")
  }

  val pitJoinSql: String =
    """WITH ev AS (
      |  SELECT event_id, user_id, event_type,
      |    CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS ts_sec
      |  FROM events
      |), ch AS (
      |  SELECT user_id, event_id, event_type, ts_sec,
      |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts_sec, event_id) AS prev_type
      |  FROM ev
      |), dim AS (
      |  SELECT user_id,
      |    CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts_sec, event_id) AS BIGINT) AS version,
      |    event_type AS state, ts_sec AS valid_from_sec
      |  FROM ch WHERE prev_type IS NULL OR prev_type <> event_type
      |), purchases AS (
      |  SELECT event_id, user_id, ts_sec FROM ev WHERE event_type = 'purchase'
      |)
      |SELECT p.event_id, p.user_id, p.ts_sec AS purchase_ts_sec,
      |  d.version, d.state
      |FROM purchases p
      |ASOF LEFT JOIN dim d
      |  ON p.user_id = d.user_id AND p.ts_sec >= d.valid_from_sec
      |ORDER BY p.event_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "etl_pit_join" -> (pitJoin _),
    "etl_schema_evolution" -> (schemaEvolution _),
    "etl_retry_quarantine" -> (retryQuarantine _),
    "etl_scd2_history"    -> (scd2History _),
    "etl_extract_history" -> (extractHistory _),
    "etl_delta_load"      -> (deltaLoad _),
    "etl_new_items"       -> (newItems _),
    "etl_dim_date"        -> (dimDate _),
    "etl_dim_time"        -> (dimTime _),
    "etl_dim_reason"      -> (dimReason _),
    "etl_clean_dates"     -> (cleanDates _),
    "etl_enrich_metadata" -> (enrichMetadata _),
    "etl_failed_uris"     -> (failedUris _),
    "etl_csv_ingest"      -> (csvIngest _),
    "etl_json_extract"    -> (jsonExtract _),
    "etl_json_nested"     -> (jsonNested _),
    "etl_dedup_staging"   -> (dedupStaging _),
    "etl_fact_build"      -> (factBuild _)
  )

  val oracleSql: Map[String, String] = Map(
    "etl_pit_join" -> pitJoinSql,
    "etl_schema_evolution" -> schemaEvolutionSql,
    "etl_retry_quarantine" -> retryQuarantineSql,
    "etl_scd2_history"    -> scd2HistorySql,
    "etl_extract_history" -> extractHistorySql,
    "etl_delta_load"      -> deltaLoadSql,
    "etl_new_items"       -> newItemsSql,
    "etl_dim_date"        -> dimDateSql,
    "etl_dim_time"        -> dimTimeSql,
    "etl_dim_reason"      -> dimReasonSql,
    "etl_clean_dates"     -> cleanDatesSql,
    "etl_enrich_metadata" -> enrichMetadataSql,
    "etl_failed_uris"     -> failedUrisSql,
    "etl_csv_ingest"      -> csvIngestSql,
    "etl_json_extract"    -> jsonExtractSql,
    "etl_json_nested"     -> jsonNestedSql,
    "etl_dedup_staging"   -> dedupStagingSql,
    "etl_fact_build"      -> factBuildSql
  )
}
