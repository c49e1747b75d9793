package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** BM25 ranking — the production upgrade of [[LlmQueries.textSearch]]'s
  * idf-weighted tf: term-frequency SATURATION (k1) and document-LENGTH
  * normalization (b), the two effects plain tf·idf lacks (a 50-mention doc
  * shouldn't score 50× a 1-mention doc; a long doc shouldn't win just by
  * containing everything).
  *
  * The whole computation is EXACT INTEGER arithmetic, so the per-term sum
  * is order-independent under any partitioning and bit-identical across
  * engines (§5 policy — a float BM25 sum would drift with partial-agg
  * order, and log-idf is transcendental):
  *
  *   - k1 = 6/5, b = 3/4 (the standard 1.2 / 0.75) enter as RATIONALS:
  *     the tf component tf·(k1+1) / (tf + k1·(1−b + b·dl/avgdl)) is
  *     multiplied through by 20·total_len (avgdl = total_len/N), giving
  *       num = 44 · tf · total_len
  *       den = 20 · tf · total_len + 6 · total_len + 18 · dl · N
  *     — exact integers, den > 0 always;
  *   - idf is the non-negative Lucene form ln(1 + (N−df+½)/(df+½))'s
  *     rational core scaled to integers:
  *       idf_scaled = ((2N + 2) · 2²⁰) div (2·df + 1)
  *     (always positive, so integer division truncates identically in
  *     Spark `div` and DuckDB `//` — a signed Robertson idf would floor
  *     vs truncate differently on negatives);
  *   - per-term weight w = (idf_scaled · num) div den, summed as BIGINT.
  *     At gate scale the product is ≤ ~2⁵⁰; at extreme corpus sizes the
  *     2²⁰ idf scale shrinks to keep headroom — the scheme, not the
  *     constant, is the contract.
  *
  * Scale shape is textSearch's: the term filter pushes into the token
  * stream, df/N/total_len are broadcast tiny tables, ranking is a
  * TakeOrdered top-20. Document length (dl) rides the same single corpus
  * pass as the postings (computed before the explode, grouped with
  * doc_id); the corpus-wide (N, total_len) pair is one map-side
  * aggregation. The PERSISTED twin serves the identical scoring from the
  * bucketed posting index + its Lucene-style `norms/` doc-length ledger
  * and `meta/` (n_docs, total_len) ledger — the corpus text is never
  * read at query time — and shares this entry's oracle verbatim.
  * Reference anchor: the reference has no retrieval surface
  * (dashboard_queries.py ranks by exact aggregates); this extends the
  * engine's LLM-pipeline READ side.
  */
object Bm25 {

  /** Single-space split, matching the oracle's string_split exactly —
    * dl counts empty tokens from runs of spaces identically both sides.
    */
  private[graft] def toks(c: Column): Column = split(lower(trim(c)), " ")

  private[graft] val defaultTerms = Seq("data", "model", "training", "quality")

  /** Shared ranking core: postings must carry (doc_id, dl, term, tf);
    * stats is the 1-row (n_docs, total_len) corpus aggregate. Both serve
    * paths rank through this, so in-session and persisted results cannot
    * diverge.
    */
  private def bm25Rank(postings: DataFrame, stats: DataFrame): DataFrame = {
    import postings.sparkSession.implicits._
    val df = postings.groupBy($"term").agg(count(lit(1)).as("df"))
    postings.join(broadcast(df), Seq("term")).crossJoin(broadcast(stats))
      .withColumn("idf_scaled", expr("(2 * n_docs + 2) * 1048576 div (2 * df + 1)"))
      .withColumn("num", expr("44 * tf * total_len"))
      .withColumn("den", expr("20 * tf * total_len + 6 * total_len + 18 * dl * n_docs"))
      .withColumn("w", expr("idf_scaled * num div den"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_terms_hit"),
        sum($"tf").as("total_tf"),
        sum($"w").as("score_scaled"))
      .orderBy($"score_scaled".desc, $"doc_id")
      .limit(20)
      .select($"doc_id", $"n_terms_hit", $"total_tf", $"score_scaled")
  }

  def textSearchBm25(spark: SparkSession, dir: String,
      terms: Seq[String] = defaultTerms): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    val stats = docs.agg(
      count(lit(1)).as("n_docs"),
      sum(size(toks($"text")).cast("long")).as("total_len"))
    // one corpus pass: dl computed before the explode rides each posting
    val postings = docs
      .select($"doc_id", size(toks($"text")).cast("long").as("dl"),
        explode(toks($"text")).as("term"))
      .filter($"term".isInCollection(terms))
      .groupBy($"doc_id", $"dl", $"term").agg(count(lit(1)).as("tf"))
    bm25Rank(postings, stats)
  }

  /** BM25 served from the PERSISTED index: postings pruned to the query
    * terms' `tb=` bucket dirs ([[LlmQueries.textSearchFromIndex]]'s
    * listing-level pruning), dl joined from the `norms/` ledger (the
    * norms side is corpus-metadata-sized; the matched-postings side is
    * tiny, so the join broadcasts it), (N, total_len) summed from the
    * `meta/` batch ledger. The corpus text is never read, tokenized, or
    * counted at query time. NOTE: the index tokenizes postings with the
    * multi-space-collapsing split; the single-space dl ledger counts
    * empty tokens — both match their oracle sides exactly, and on this
    * corpus (no double spaces) the two splits agree.
    */
  def textSearchBm25FromIndex(spark: SparkSession, indexPath: String,
      terms: Seq[String]): DataFrame = {
    import spark.implicits._
    val tbs = spark.createDataset(terms).toDF("term")
      .select(LlmQueries.termBucket($"term").as("tb"))
      .distinct().collect().map(_.getLong(0))
    val postings = spark.read.parquet(s"$indexPath/postings")
      .filter($"tb".isin(tbs: _*))
      .filter($"term".isInCollection(terms))
      .select($"doc_id", $"term", $"tf")
    val norms = spark.read.parquet(s"$indexPath/norms")
    val stats = spark.read.parquet(s"$indexPath/meta")
      .agg(sum($"n_docs").cast("long").as("n_docs"),
        sum($"total_len").cast("long").as("total_len"))
    bm25Rank(postings.join(norms, Seq("doc_id")), stats)
  }

  /** §2 entry `text_search_bm25_persisted`: the save-once lifecycle
    * ([[LlmQueries.postingIndexPathFor]] — shared with the keyword and
    * hybrid persisted entries, ONE index serves all three), then BM25
    * from the loaded tables. Shares [[textSearchBm25Sql]]'s oracle.
    */
  def textSearchBm25Persisted(spark: SparkSession, dir: String,
      terms: Seq[String] = defaultTerms): DataFrame =
    textSearchBm25FromIndex(spark, LlmQueries.postingIndexPathFor(spark, dir), terms)

  val textSearchBm25Sql: String =
    """WITH lens AS (
      |  SELECT doc_id, CAST(len(string_split(lower(trim(text)), ' ')) AS BIGINT) AS dl
      |  FROM documents
      |), toks AS (
      |  SELECT doc_id, unnest(string_split(lower(trim(text)), ' ')) AS term
      |  FROM documents
      |), p AS (
      |  SELECT t.doc_id, l.dl, t.term, COUNT(*) AS tf
      |  FROM toks t JOIN lens l USING (doc_id)
      |  WHERE term IN ('data', 'model', 'training', 'quality')
      |  GROUP BY t.doc_id, l.dl, t.term
      |), d AS (
      |  SELECT term, COUNT(*) AS df FROM p GROUP BY term
      |), s AS (
      |  SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS BIGINT) AS total_len FROM lens
      |)
      |SELECT doc_id,
      |  COUNT(*) AS n_terms_hit,
      |  CAST(SUM(tf) AS BIGINT) AS total_tf,
      |  CAST(SUM(((2 * n_docs + 2) * 1048576 // (2 * df + 1))
      |    * (44 * tf * total_len)
      |    // (20 * tf * total_len + 6 * total_len + 18 * dl * n_docs)) AS BIGINT) AS score_scaled
      |FROM p JOIN d USING (term) CROSS JOIN s
      |GROUP BY doc_id
      |ORDER BY score_scaled DESC, doc_id
      |LIMIT 20""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_search_bm25" -> ((s: SparkSession, d: String) => textSearchBm25(s, d)),
    "text_search_bm25_persisted" -> ((s: SparkSession, d: String) => textSearchBm25Persisted(s, d))
  )

  val oracleSql: Map[String, String] = Map(
    "text_search_bm25" -> textSearchBm25Sql,
    "text_search_bm25_persisted" -> textSearchBm25Sql
  )
}
