package graft.mart

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental view maintenance for the mart rollups — the continuous
  * warehouse the reference's nightly full rebuild implies but never built
  * (scripts/dm/data_mart_loader.py re-aggregates every run): the yearly
  * rollup is maintained as PERSISTED MERGEABLE STATE that appended fact
  * batches fold into, so refreshing the dashboard after a day's load costs
  * O(state + batch), never a fact-table re-scan.
  *
  * The catch is the two COUNT DISTINCT metrics: distinct sums/counts merge
  * trivially, distinct counts do not. The standard IVM answer is support
  * counts — auxiliary tables holding per-(year, track) and per-(year,
  * artist) row counts; a batch merges its own counts in, and the distinct
  * metric is the support table's per-year row count. Support state is
  * bounded by the number of DISTINCT keys (not facts), partitions on the
  * same year axis as the rollup, and — unlike a HLL sketch — stays EXACT
  * and delete-capable (a retraction batch with negative counts would
  * maintain it too, the classic incremental-view algebra).
  *
  * The derived metrics (rounded hours, estimated streams) are computed at
  * SERVE time from the exact decimal sums with the IDENTICAL expression
  * tree the one-shot rollup uses, so the incremental entry shares
  * `dm_yearly_agg`'s DuckDB oracle verbatim — the driver hash proves that
  * state-build + N appends + serve ≡ one full re-aggregation.
  *
  * Scale shape: a batch append is one partial agg of the batch per state
  * table (map-side combine, shuffle = distinct batch keys), one merge
  * groupBy bounded by |state| + |batch keys|, and an overwrite of state
  * that is ~years × keys rows — never the fact table. Serve reads state
  * only (plan-asserted in the spec: no lineitem/orders scan).
  */
object IncrementalMart {

  /** Fold a batch of [[MartQueries.listeningFacts]] rows into the state at
    * `path` (creating it when absent): exact decimal partial sums merge by
    * (year, year_start); support counts merge by (year, key). Idempotence
    * is the caller's contract (the streaming sinks' Bloom anti-join), as
    * with every append-family primitive.
    */
  def appendToYearlyState(batch: DataFrame, path: String): Unit =
    foldYearlyState(batch, path, 1)

  /** The delete side of the algebra: fold the SAME batch with negated
    * deltas — counts and sums subtract, support counts that reach zero
    * drop their key out of the distinct metrics (the serve-side `n > 0`
    * guard). append(B) then retract(B) is a state no-op, spec-pinned.
    */
  def retractFromYearlyState(batch: DataFrame, path: String): Unit =
    foldYearlyState(batch, path, -1)

  /** The three state tables' (delta, name, keys, summed-cols) quads for a
    * batch, sign = +1 append / −1 retract.
    */
  private def stateDeltas(batch: DataFrame, sign: Int): Seq[(DataFrame, String, Seq[String], Seq[String])] = {
    import batch.sparkSession.implicits._
    val b = batch.select($"ts_year".as("year"), $"ts_year_start".as("year_start"),
      $"l_partkey", $"l_suppkey", $"l_quantity", $"sec_played", $"percent_played")
      .localCheckpoint() // one batch materialization feeds all three folds
    val s = lit(sign.toLong)
    Seq(
      (b.groupBy($"year", $"year_start").agg(
          (sum($"sec_played") * s).cast("decimal(22,2)").as("sum_sec"),
          (count(lit(1)) * s).as("n_rows"),
          (count(when($"l_quantity" > 10, lit(1))) * s).as("n_nonskip"),
          (sum($"percent_played") * s).cast("decimal(15,1)").as("sum_pct")),
        "sums", Seq("year", "year_start"), Seq("sum_sec", "n_rows", "n_nonskip", "sum_pct")),
      (b.groupBy($"year", $"l_partkey").agg((count(lit(1)) * s).as("n")),
        "tracks", Seq("year", "l_partkey"), Seq("n")),
      // the artist support rows carry the per-(year, artist) metric sums
      // beside the distinct-count support n — ONE state tree serves BOTH
      // the yearly rollup and the ranked top-artists view, and every
      // column is sign-mergeable so the retraction algebra still holds
      (b.groupBy($"year", $"l_suppkey").agg(
          (count(lit(1)) * s).as("n"),
          (sum($"sec_played") * s).cast("decimal(22,2)").as("sum_sec"),
          (sum($"percent_played") * s).cast("decimal(15,1)").as("sum_pct"),
          (count(when($"percent_played" === lit(100.0), lit(1))) * s).as("n_full")),
        "artists", Seq("year", "l_suppkey"), Seq("n", "sum_sec", "sum_pct", "n_full")))
  }

  /** delta ∪ (srcTable if it exists) → re-aggregated, schema-fixpoint
    * (sum() widens decimal precision per merge; cast back to the delta's
    * types so any number of appends keeps one schema).
    */
  private def mergedTable(spark: SparkSession, delta: DataFrame, src: Option[String],
      keys: Seq[String], sums: Seq[String]): DataFrame = {
    val outType = sums.map(c => c -> delta.schema(c).dataType).toMap
    val unioned = src match {
      case Some(p) =>
        try delta.unionByName(spark.read.parquet(p))
        catch { case _: org.apache.spark.sql.AnalysisException => delta }
      case None => delta
    }
    unioned
      .groupBy(keys.map(col): _*)
      .agg(sum(col(sums.head)).as(sums.head),
        sums.tail.map(c => sum(col(c)).as(c)): _*)
      .select(keys.map(col) ++ sums.map(c => col(c).cast(outType(c)).as(c)): _*)
  }

  private def foldYearlyState(batch: DataFrame, path: String, sign: Int): Unit = {
    val spark = batch.sparkSession
    stateDeltas(batch, sign).foreach { case (delta, sub, keys, sums) =>
      mergedTable(spark, delta, Some(s"$path/$sub"), keys, sums)
        .localCheckpoint() // materialize before overwriting what it reads
        .write.mode("overwrite").parquet(s"$path/$sub")
    }
  }

  /** Versioned fold for the STREAMING sink ([[graft.streaming.MartStream]]):
    * state at `srcVersion` + batch → a NEW `v<dstVersion>` directory tree,
    * never in-place — source and destination differ, so no checkpoint is
    * needed and a crashed write never corrupts served state (the pointer
    * still names the old version). Deterministic given (src state, batch),
    * which is what makes a foreachBatch retry recompute the identical
    * version instead of double-counting.
    */
  private[graft] def foldVersioned(batch: DataFrame, root: String,
      srcVersion: Option[Long], dstVersion: Long): Unit = {
    val spark = batch.sparkSession
    stateDeltas(batch, 1).foreach { case (delta, sub, keys, sums) =>
      mergedTable(spark, delta, srcVersion.map(v => s"$root/v$v/$sub"), keys, sums)
        .write.mode("overwrite").parquet(s"$root/v$dstVersion/$sub")
    }
  }

  /** Serve the rollup from state alone — the fact table is never read.
    * Metric expressions are shared shapes with [[MartQueries.yearlyAgg]]
    * (same decimal-exact sums, same double rounding tree), so the result
    * is bit-identical to a full re-aggregation.
    */
  def serveYearlyAgg(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val sums = spark.read.parquet(s"$path/sums")
    // support > 0 guards the delete/retraction algebra: a key whose counts
    // cancelled out no longer exists
    val tracks = spark.read.parquet(s"$path/tracks").filter($"n" > 0)
      .groupBy($"year").agg(count(lit(1)).as("distinct_tracks"))
    val artists = spark.read.parquet(s"$path/artists").filter($"n" > 0)
      .groupBy($"year").agg(count(lit(1)).as("distinct_artists"))
    sums.join(tracks, Seq("year")).join(artists, Seq("year"))
      .select($"year", $"year_start",
        MartQueries.r1($"sum_sec".cast("double") / lit(3600.0)).as("hours_listened"),
        $"n_rows".as("total_streams_sessions"),
        $"n_nonskip".as("nonskip_sessions"),
        MartQueries.r0($"sum_pct".cast("double") / lit(100.0)).as("total_estimated_streams"),
        $"distinct_tracks", $"distinct_artists")
      .orderBy($"year".desc)
  }

  private val savedStates =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), String]

  /** Test hook mirroring the other persisted families. */
  private[graft] def persistedYearlyStatePath(spark: SparkSession, dir: String): Option[String] =
    savedStates.get((spark, dir))

  /** §2 entry `dm_yearly_agg_incremental`: once per (session, dir), build
    * the state from the landed facts (orderdate < 1996) and fold the
    * remainder in as two date-ranged append batches — the backfill-plus-
    * two-loads lifecycle; every call serves from state. Shares
    * `dm_yearly_agg`'s oracle SQL verbatim (with its own name), so the
    * driver hash proves incremental ≡ one-shot.
    */
  def dmYearlyAggIncremental(spark: SparkSession, dir: String): DataFrame =
    serveYearlyAgg(spark, yearlyStatePathFor(spark, dir))

  /** The build-once (session, dir) lifecycle shared by every entry served
    * from the mart state tree.
    */
  private def yearlyStatePathFor(spark: SparkSession, dir: String): String = {
    import spark.implicits._
    savedStates.synchronized {
      savedStates.getOrElseUpdate((spark, dir), {
        val p = s"${System.getProperty("java.io.tmpdir")}/graft_mart_state_" +
          graft.Tables.dirKey(dir) +
          "_" + ProcessHandle.current().pid() +
          "_" + Integer.toHexString(System.identityHashCode(spark))
        val facts = MartQueries.listeningFacts(spark, dir)
        appendToYearlyState(facts.filter($"ts" < "1996-01-01"), p)
        appendToYearlyState(
          facts.filter($"ts" >= "1996-01-01" && $"ts" < "1997-01-01"), p)
        appendToYearlyState(facts.filter($"ts" >= "1997-01-01"), p)
        p
      })
    }
  }

  /** §2 entry `dm_top_artists_incremental` — ONE STATE, MANY VIEWS: the
    * ranked 1997 top-artists view served from the SAME state tree as the
    * yearly rollup (the artist support table's metric sums), never the
    * fact table. The supplier dim joins at serve time (dims are not
    * state); the post-join re-aggregation by s_name merges exact decimal
    * sums, so the result is bit-identical to the one-shot ranking and the
    * entry carries its own DuckDB oracle (the cover-art column is the one
    * omission: a MAX is not sign-mergeable, so it does not belong in
    * retraction-capable state).
    */
  def dmTopArtistsIncremental(spark: SparkSession, dir: String): DataFrame =
    serveTopArtists(spark, yearlyStatePathFor(spark, dir), dir)

  /** Serve core over any state tree — shared with the STREAMED state
    * ([[graft.streaming.MartStream.serveTopArtists]]), so a backfilled
    * and a streamed mart cannot rank differently.
    */
  private[graft] def serveTopArtists(spark: SparkSession, path: String, dir: String): DataFrame = {
    import spark.implicits._
    val sup = graft.Tables.supplier(spark, dir).select($"s_suppkey", $"s_name")
    spark.read.parquet(s"$path/artists")
      .filter($"year" === 1997L && $"n" > 0)
      .join(broadcast(sup), $"l_suppkey" === $"s_suppkey")
      .groupBy($"s_name".as("artist"))
      .agg(sum($"sum_sec").as("sum_sec"), sum($"n").as("times_played"),
        sum($"sum_pct").as("sum_pct"), sum($"n_full").as("full_real_streams"))
      .select($"artist",
        MartQueries.r1($"sum_sec".cast("double") / lit(3600.0)).as("hours_played"),
        $"times_played",
        MartQueries.r0($"sum_pct".cast("double") / lit(100.0)).as("estimated_full_streams"),
        $"full_real_streams")
      .orderBy($"hours_played".desc, $"artist")
      .limit(10)
  }

  val dmTopArtistsIncrementalSql: String =
    s"""${MartQueries.fhCte}
       |SELECT s_name AS artist,
       |  floor(CAST(SUM(sec_played) AS DOUBLE) / 3600.0 * 10.0 + 0.5) / 10.0 AS hours_played,
       |  COUNT(*) AS times_played,
       |  floor(CAST(SUM(percent_played) AS DOUBLE) / 100.0 + 0.5) AS estimated_full_streams,
       |  CAST(COUNT(CASE WHEN percent_played = 100.0 THEN 1 END) AS BIGINT) AS full_real_streams
       |FROM fh JOIN supplier ON l_suppkey = s_suppkey
       |WHERE year(ts) = 1997
       |GROUP BY s_name
       |ORDER BY hours_played DESC, artist
       |LIMIT 10""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dm_yearly_agg_incremental" -> (dmYearlyAggIncremental _),
    "dm_top_artists_incremental" -> (dmTopArtistsIncremental _)
  )

  val oracleSql: Map[String, String] = Map(
    "dm_yearly_agg_incremental" -> MartQueries.yearlyAggSql,
    "dm_top_artists_incremental" -> dmTopArtistsIncrementalSql
  )
}
