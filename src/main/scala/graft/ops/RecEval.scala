package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** §2 entry `rec_eval_prk` — TEMPORAL-SPLIT evaluation of the item-item
  * CF recommender: precision@k / recall@k for k ∈ {1, 3, 5} against a
  * TIME-ordered holdout, the offline readout a recommender ships or
  * doesn't ship on. `rec_coverage_eval` measures catalog reach; this
  * measures whether the model predicts the FUTURE: train on the first
  * 80% of the order calendar, hold out the rest, count how many top-k
  * recommendations the user then actually played (new items only — a
  * "hit" on something they already knew predicts nothing). A random
  * split would leak future co-listens into training; the calendar split
  * is the honest protocol (Netflix-prize discipline).
  *
  * Scale shape: ONE fact scan builds the per-(user, item) profile with
  * BOTH train and test listen counts as conditional aggregates of the
  * same groupBy — the train profile, the novelty anti-join side, and
  * the holdout all project from it (the rec_user_topn one-scan
  * discipline extended across the split). The cutoff is a 2-number
  * scalar aggregate (min/max order date → min + ⌊4·span/5⌋ days, pure
  * integer date arithmetic). Everything downstream is the entry's own
  * machinery on the capped train profile: the co-listen self-join is
  * user-bounded, neighbor lists cut to k through PartialTopK before any
  * exchange, metrics are ≤ |recs| + |holdout| row aggregates folding to
  * ONE row, unioned to the 3 k-rows.
  *
  * Exactness (hash-gate): the CF chain is the already-gated
  * rec_user_topn chain (exact BIGINT votes, one IEEE cosine divide)
  * over the train `ui`; hits, rec-row counts, and holdout sizes are
  * pure BIGINTs (rank ≤ k on DENSE ranks makes Σ min(k, n_recs_u) a
  * conditional count); micro-precision/recall add one correctly-rounded
  * divide each, with the empty-side edges (no recs / no holdout)
  * emitting NULL in both engines.
  */
object RecEval {

  private val ks = Seq(1, 3, 5)

  def recEvalPrk(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    recEvalPrkOn(
      Tables.lineitem(spark, dir).select($"l_orderkey", $"l_partkey"),
      Tables.orders(spark, dir)
        .select($"o_orderkey", $"o_custkey", to_date($"o_orderdate").as("od")))
  }

  /** The evaluation over caller-supplied (l_orderkey, l_partkey) listens
    * and (o_orderkey, o_custkey, od) orders — split out for the planted
    * specs.
    */
  private[graft] def recEvalPrkOn(li: DataFrame, ord: DataFrame): DataFrame = {
    val spark = li.sparkSession
    import spark.implicits._
    // Calendar cutoff: min + floor(4·span/5) days — a scalar aggregate,
    // the one driver-side value in the entry.
    val b = ord.agg(min($"od").as("mn"), max($"od").as("mx")).head()
    val mn = b.getDate(0).toLocalDate
    val span = java.time.temporal.ChronoUnit.DAYS.between(mn, b.getDate(1).toLocalDate)
    val cutoff = java.sql.Date.valueOf(mn.plusDays(span * 4 / 5))
    // ONE fact scan: per-(user, item) listen counts on BOTH sides of the
    // cutoff; train profile, novelty side and holdout project from it.
    val prof = li.join(ord, $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_custkey".as("user_id"), $"l_partkey".as("item_id"))
      .agg(
        sum(when($"od" <= lit(cutoff), 1L).otherwise(0L)).as("train_n"),
        sum(when($"od" > lit(cutoff), 1L).otherwise(0L)).as("test_n"))
      .localCheckpoint()
    val trainLc = prof.filter($"train_n" > 0L)
      .select($"user_id", $"item_id", $"train_n".as("n_listens"))
    val listens = Recommend.cappedFrom(trainLc).localCheckpoint()
    val nb = Recommend.neighborsFrom(listens)
      .select($"item_id", $"rec_item_id", $"co_users")
    val votes = listens.join(nb, Seq("item_id"))
      .groupBy($"user_id", $"rec_item_id")
      .agg(sum($"co_users").as("score"), count(lit(1)).as("n_via"))
    val novel = votes.join(trainLc.select($"user_id", $"item_id".as("rec_item_id")),
      Seq("user_id", "rec_item_id"), "left_anti")
    val recs = Recommend.rankUserVotes(novel).select($"user_id", $"rec_item_id", $"rank")
    // Holdout: future listens to items the user had NOT played in train.
    val holdout = prof.filter($"test_n" > 0L && $"train_n" === 0L)
      .select($"user_id", $"item_id".as("rec_item_id"))
    val hits = recs.join(holdout, Seq("user_id", "rec_item_id"))
    def atK(rank: org.apache.spark.sql.Column, prefix: String) =
      ks.map(k => coalesce(sum(when(rank <= k.toLong, 1L).otherwise(0L)), lit(0L))
        .as(s"$prefix$k"))
    val tAgg = holdout.agg(
      coalesce(countDistinct($"user_id"), lit(0L)).as("n_users_test"),
      count(lit(1)).as("n_test_pairs"))
    val rAgg = recs.agg(atK($"rank", "nrec").head, atK($"rank", "nrec").tail: _*)
    val hAgg = hits.agg(atK($"rank", "nhit").head, atK($"rank", "nhit").tail: _*)
    // ONE row; checkpointed so the 3 k-projections below don't re-run
    // the CF chain (each union branch would otherwise re-derive the
    // aggregates from the last checkpoint up).
    val m = tAgg.crossJoin(rAgg).crossJoin(hAgg).localCheckpoint()
    ks.map { k =>
      m.select(lit(k.toLong).as("k"), $"n_users_test", $"n_test_pairs",
        col(s"nrec$k").as("n_recs"), col(s"nhit$k").as("n_hits"))
    }.reduce(_.union(_))
      .withColumn("precision_at_k",
        when($"n_recs" > 0L, $"n_hits".cast("double") / $"n_recs".cast("double")))
      .withColumn("recall_at_k",
        when($"n_test_pairs" > 0L, $"n_hits".cast("double") / $"n_test_pairs".cast("double")))
      .orderBy($"k")
  }

  val recEvalPrkSql: String = {
    val cut = "(SELECT cutoff FROM cut)"
    val recCases = ks.map(k =>
      s"    COALESCE(CAST(SUM(CASE WHEN rank <= $k THEN 1 ELSE 0 END) AS BIGINT), 0) AS nrec$k")
      .mkString(",\n")
    val hitCases = ks.map(k =>
      s"    COALESCE(CAST(SUM(CASE WHEN rank <= $k THEN 1 ELSE 0 END) AS BIGINT), 0) AS nhit$k")
      .mkString(",\n")
    val kRows = ks.map(k =>
      s"  SELECT $k AS k, n_users_test, n_test_pairs, nrec$k AS n_recs, nhit$k AS n_hits FROM m")
      .mkString("\n  UNION ALL\n")
    "WITH bounds AS (\n" +
      "  SELECT MIN(CAST(o_orderdate AS DATE)) AS mn, MAX(CAST(o_orderdate AS DATE)) AS mx\n" +
      "  FROM orders\n" +
      "), cut AS (\n" +
      "  SELECT mn + CAST((date_diff('day', mn, mx) * 4) // 5 AS INTEGER) AS cutoff FROM bounds\n" +
      "), prof AS (\n" +
      "  SELECT o_custkey AS user_id, l_partkey AS item_id,\n" +
      s"    CAST(SUM(CASE WHEN CAST(o_orderdate AS DATE) <= $cut THEN 1 ELSE 0 END) AS BIGINT) AS train_n,\n" +
      s"    CAST(SUM(CASE WHEN CAST(o_orderdate AS DATE) > $cut THEN 1 ELSE 0 END) AS BIGINT) AS test_n\n" +
      "  FROM lineitem JOIN orders ON l_orderkey = o_orderkey\n" +
      "  GROUP BY 1, 2\n" +
      "), " + Recommend.cfChainFrom(
        """ui AS (
          |  SELECT user_id, item_id, train_n AS n_listens FROM prof WHERE train_n > 0
          |)""".stripMargin) + s""", votes AS (
      |  SELECT c.user_id, n.rec_item_id,
      |    CAST(SUM(n.co_users) AS BIGINT) AS score
      |  FROM capped c JOIN nbr n ON c.item_id = n.item_id
      |  GROUP BY 1, 2
      |), novel AS (
      |  SELECT v.* FROM votes v
      |  WHERE NOT EXISTS (
      |    SELECT 1 FROM ui c
      |    WHERE c.user_id = v.user_id AND c.item_id = v.rec_item_id)
      |), recs AS (
      |  SELECT user_id, rec_item_id, rank FROM (
      |    SELECT user_id, rec_item_id,
      |      row_number() OVER (PARTITION BY user_id ORDER BY score DESC, rec_item_id) AS rank
      |    FROM novel
      |  ) WHERE rank <= ${Recommend.topNRecs}
      |), holdout AS (
      |  SELECT user_id, item_id AS rec_item_id FROM prof
      |  WHERE test_n > 0 AND train_n = 0
      |), hits AS (
      |  SELECT r.user_id, r.rank FROM recs r
      |  JOIN holdout h ON r.user_id = h.user_id AND r.rec_item_id = h.rec_item_id
      |), t_agg AS (
      |  SELECT COALESCE(CAST(COUNT(DISTINCT user_id) AS BIGINT), 0) AS n_users_test,
      |    CAST(COUNT(*) AS BIGINT) AS n_test_pairs
      |  FROM holdout
      |), r_agg AS (
      |  SELECT
      |$recCases
      |  FROM recs
      |), h_agg AS (
      |  SELECT
      |$hitCases
      |  FROM hits
      |), m AS (
      |  SELECT * FROM t_agg, r_agg, h_agg
      |), krows AS (
      |$kRows
      |)
      |SELECT k, n_users_test, n_test_pairs, n_recs, n_hits,
      |  CASE WHEN n_recs > 0
      |    THEN CAST(n_hits AS DOUBLE) / CAST(n_recs AS DOUBLE) END AS precision_at_k,
      |  CASE WHEN n_test_pairs > 0
      |    THEN CAST(n_hits AS DOUBLE) / CAST(n_test_pairs AS DOUBLE) END AS recall_at_k
      |FROM krows
      |ORDER BY k""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "rec_eval_prk" -> (recEvalPrk _)
  )

  val oracleSql: Map[String, String] = Map(
    "rec_eval_prk" -> recEvalPrkSql
  )
}
