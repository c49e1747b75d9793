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
  * aggregation — with the persisted posting index this is one more column
  * in the meta ledger. Reference anchor: the reference has no retrieval
  * surface (dashboard_queries.py ranks by exact aggregates); this extends
  * the engine's LLM-pipeline READ side.
  */
object Bm25 {

  /** Single-space split, matching the oracle's string_split exactly —
    * dl counts empty tokens from runs of spaces identically both sides.
    */
  private def toks(c: Column): Column = split(lower(trim(c)), " ")

  def textSearchBm25(spark: SparkSession, dir: String,
      terms: Seq[String] = Seq("data", "model", "training", "quality")): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    // 1-row corpus stats (broadcast): N and total token length
    val stats = docs.agg(
      count(lit(1)).as("n_docs"),
      sum(size(toks($"text")).cast("long")).as("total_len"))
    // one corpus pass: dl computed before the explode rides each posting
    val postings = docs
      .select($"doc_id", size(toks($"text")).cast("long").as("dl"),
        explode(toks($"text")).as("term"))
      .filter($"term".isInCollection(terms))
      .groupBy($"doc_id", $"dl", $"term").agg(count(lit(1)).as("tf"))
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
    "text_search_bm25" -> ((s: SparkSession, d: String) => textSearchBm25(s, d))
  )

  val oracleSql: Map[String, String] = Map(
    "text_search_bm25" -> textSearchBm25Sql
  )
}
