package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Raw streaming-history JSON ingest (reference:
  * scripts/etl/extractor.py:18 extract_streaming_history).
  *
  * The reference iterates local export files, json.load()s each, catches
  * JSONDecodeError per file, and filters rows newer than the loaded
  * watermark. Here the directory is one distributed scan with an explicit
  * schema (no sampling pass), PERMISSIVE corrupt-record capture instead of
  * per-file try/except, and the same delta-load watermark filter — all in
  * one plan. At 100 TB the scan parallelizes per file-split and the
  * malformed rows land in a quarantine output instead of a log line.
  */
object Extractor {

  /** The Spotify personal-export schema (extractor.py:40 column list). */
  val historySchema: StructType = StructType(Seq(
    StructField("ts", StringType),
    StructField("platform", StringType),
    StructField("ms_played", LongType),
    StructField("conn_country", StringType),
    StructField("ip_addr", StringType),
    StructField("master_metadata_track_name", StringType),
    StructField("master_metadata_album_artist_name", StringType),
    StructField("master_metadata_album_album_name", StringType),
    StructField("spotify_track_uri", StringType),
    StructField("episode_name", StringType),
    StructField("episode_show_name", StringType),
    StructField("spotify_episode_uri", StringType),
    StructField("reason_start", StringType),
    StructField("reason_end", StringType),
    StructField("shuffle", BooleanType),
    StructField("skipped", BooleanType),
    StructField("offline", BooleanType),
    StructField("offline_timestamp", LongType),
    StructField("incognito_mode", BooleanType),
    StructField("_corrupt_record", StringType)))

  /** Scan a directory of export JSON (one object per line) with corrupt
    * rows captured, not dropped.
    */
  def readHistoryJson(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(historySchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)

  /** Split into (clean, quarantine): clean rows get a parsed timestamp and
    * must satisfy the reference's implicit invariants (parseable ts,
    * non-negative play time); everything else carries an error reason.
    */
  def cleanHistory(raw: DataFrame): (DataFrame, DataFrame) = {
    import raw.sparkSession.implicits._
    val parsed = raw.withColumn("ts_utc",  // try_: ANSI mode must not abort the scan on bad rows
      try_to_timestamp($"ts", lit("yyyy-MM-dd'T'HH:mm:ss'Z'")))
    val clean = parsed
      .filter($"_corrupt_record".isNull && $"ts_utc".isNotNull && $"ms_played" >= 0)
      .drop("_corrupt_record")
    // exact complement of `clean` under null logic: a NULL ms_played fails
    // `>= 0` without satisfying `< 0`, so it must be quarantined explicitly
    // ("captured, not dropped")
    val quarantine = parsed
      .filter($"_corrupt_record".isNotNull || $"ts_utc".isNull ||
        $"ms_played".isNull || $"ms_played" < 0)
      .select($"ts", $"ms_played", $"_corrupt_record",
        when($"_corrupt_record".isNotNull, "malformed json")
          .when($"ts_utc".isNull, "unparseable ts")
          .when($"ms_played".isNull, "null ms_played")
          .otherwise("negative ms_played").as("error_reason"))
    (clean, quarantine)
  }

  /** Delta load: rows strictly newer than the watermark (max loaded ts),
    * computed in-plan (extractor.py:26 get_max_history_ts + ts filter).
    */
  def deltaLoad(clean: DataFrame, loaded: DataFrame): DataFrame = {
    import clean.sparkSession.implicits._
    val wm = loaded.agg(
      coalesce(max($"ts_utc"), lit("1900-01-01").cast("timestamp")).as("wm"))
    clean.join(broadcast(wm), $"ts_utc" > $"wm").drop("wm")
  }
}
