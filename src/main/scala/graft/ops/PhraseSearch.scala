package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Positional phrase search — the retrieval family's exact-adjacency
  * member (text_search ranks bag-of-words tf·idf; BM25 adds saturation;
  * this answers "the words IN THIS ORDER, adjacent"), i.e. Lucene's
  * PhraseQuery over positional postings.
  *
  * Matching semantics: an occurrence at start position p requires
  * `token[p+i] == phrase[i]` for every i — expressed as an equi-join of
  * the phrase terms' position streams on the ALIGNED start `(doc_id,
  * pos−i)`. That formulation is correct for repeated-word phrases too
  * (each stream filters its own term; a shared underlying token row can
  * satisfy two offsets only by joining two distinct occurrences), and
  * counts overlapping occurrences exactly.
  *
  * Scale shape: the phrase-term `isin` filter pushes into the token
  * stream, so only the phrase's posting rows survive the explode; the
  * alignment join is keyed on `(doc_id, start)` — fan-in bounded by the
  * per-doc term frequency, never the corpus; ranking is a TakeOrdered
  * top-20. The persisted twin serves from a POSITIONAL posting index
  * (`tb=` term-hash dirs, the [[LlmQueries.savePostingIndex]] layout with
  * a `pos` column): a query lists only its terms' buckets and reads
  * positions off disk — the corpus text is never touched at query time.
  */
object PhraseSearch {

  /** Fixed gate phrase (adjacent in the synthetic corpus ~50×/sf0.01). */
  val phrase: Seq[String] = Seq("table", "hash")

  private def words(c: Column): Column = split(lower(trim(c)), " +")

  /** Positional token stream (doc_id, pos, term) of a corpus slice —
    * 1-based positions to match the oracle's `generate_subscripts`.
    */
  private[graft] def positionalToks(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select($"doc_id", posexplode(words($"text")).as(Seq("pos0", "term")))
      .select($"doc_id", ($"pos0" + 1).cast("long").as("pos"), $"term")
  }

  /** Phrase-match core over any (doc_id, pos, term) stream: one aligned
    * equi-join per phrase term, exact integer phrase_tf, top-20
    * (phrase_tf desc, doc_id). Spec-fed with synthetic streams.
    */
  private[graft] def phraseMatches(toks: DataFrame, ph: Seq[String]): DataFrame = {
    import toks.sparkSession.implicits._
    require(ph.nonEmpty)
    val streams = ph.zipWithIndex.map { case (t, i) =>
      toks.filter($"term" === t).select($"doc_id", ($"pos" - i).as("start"))
    }
    streams.reduce((a, b) => a.join(b, Seq("doc_id", "start")))
      .groupBy($"doc_id").agg(count(lit(1)).as("phrase_tf"))
      .orderBy($"phrase_tf".desc, $"doc_id")
      .limit(20)
  }

  /** §2 `text_search_phrase`: exact-adjacency phrase retrieval in
    * session — tokenize, keep the phrase terms' positions, align, rank.
    */
  def textSearchPhrase(spark: SparkSession, dir: String,
      ph: Seq[String] = phrase): DataFrame = {
    import spark.implicits._
    val toks = positionalToks(Tables.documents(spark, dir))
      .filter($"term".isInCollection(ph))
    phraseMatches(toks, ph)
  }

  // ---- persisted positional index (save/serve lifecycle) ----

  /** Positional posting rows (doc_id, term, pos, tb), clustered by the
    * shared term-hash bucket so phrase queries prune to their terms'
    * `tb=` dirs exactly like the tf index.
    */
  private[graft] def positionalRows(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    positionalToks(docs)
      .withColumn("tb", LlmQueries.termBucket(col("term")))
      .repartition($"tb")
      .sortWithinPartitions($"tb", $"term", $"doc_id", $"pos")
  }

  private[graft] def savePositionalIndex(spark: SparkSession, dir: String,
      indexPath: String): Unit =
    savePositionalIndexOf(Tables.documents(spark, dir), indexPath)

  /** Frame-based core (injectable for the purge-stream parity spec). */
  private[graft] def savePositionalIndexOf(docs: DataFrame, indexPath: String): Unit =
    positionalRows(docs)
      .write.mode("overwrite").partitionBy("tb").parquet(s"$indexPath/positions")

  /** Grow the positional index with a LANDED batch — the shared
    * persisted-family append contract (O(batch) tokenize, appended files
    * land only in the touched `tb=` dirs, corpus never re-scanned; batch
    * doc_ids must be new to the index). Positional rows are pure facts
    * keyed by (doc, term, pos), so append == rebuild holds trivially by
    * set union — PhraseSearchSpec pins it on a 70/30 split through the
    * phrase-match core.
    */
  private[graft] def appendToPositionalIndex(batch: DataFrame, indexPath: String): Unit =
    positionalRows(batch)
      .write.mode("append").partitionBy("tb").parquet(s"$indexPath/positions")

  /** GDPR DELETE for the positional index — the shared bucketed-table
    * routine ([[LlmQueries.deleteDocsFromBucketedTable]]): only the
    * docs' touched `tb=` dirs rewrite, cold buckets stay byte-identical,
    * re-delete is a no-op probe. Positional rows are pure facts, so
    * delete == rebuild-without-docs by set difference — no ledger
    * corrections needed. Returns the affected bucket ids.
    */
  private[graft] def deleteFromPositionalIndex(spark: SparkSession,
      indexPath: String, docIds: Seq[Long]): Seq[Int] =
    LlmQueries.deleteDocsFromBucketedTable(spark, s"$indexPath/positions",
      docIds, Seq("tb", "term", "doc_id", "pos"))

  private val savedIndexes =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), String]

  private[graft] def positionalIndexPathFor(spark: SparkSession, dir: String): String =
    savedIndexes.synchronized {
      savedIndexes.getOrElseUpdate((spark, dir), {
        val p = s"${System.getProperty("java.io.tmpdir")}/graft_positional_index_" +
          graft.Tables.dirKey(dir) +
          "_" + ProcessHandle.current().pid() +
          "_" + Integer.toHexString(System.identityHashCode(spark))
        savePositionalIndex(spark, dir, p)
        p
      })
    }

  /** Serve a phrase from a saved positional index: list only the phrase
    * terms' buckets, filter to the terms, align. Corpus text untouched.
    */
  private[graft] def phraseFromIndex(spark: SparkSession, indexPath: String,
      ph: Seq[String]): DataFrame = {
    import spark.implicits._
    val tbs = spark.createDataset(ph).toDF("term")
      .select(LlmQueries.termBucket($"term").as("tb"))
      .distinct().collect().map(_.getLong(0))
    val toks = spark.read.parquet(s"$indexPath/positions")
      .filter($"tb".isin(tbs: _*))
      .filter($"term".isInCollection(ph))
      .select($"doc_id", $"pos", $"term")
    phraseMatches(toks, ph)
  }

  /** §2 `text_search_phrase_persisted`: build+save the positional index
    * once per (session, dir), then answer the fixed phrase from the
    * loaded lists — shares [[textSearchPhraseSql]]'s oracle (identical
    * alignment join over corpus-equivalent positions).
    */
  def textSearchPhrasePersisted(spark: SparkSession, dir: String,
      ph: Seq[String] = phrase): DataFrame =
    phraseFromIndex(spark, positionalIndexPathFor(spark, dir), ph)

  val textSearchPhraseSql: String = {
    val streams = phrase.zipWithIndex.map { case (t, i) =>
      s"t$i AS (SELECT doc_id, pos - $i AS start FROM toks WHERE term = '$t')"
    }.mkString(", ")
    val joins = (1 until phrase.length)
      .map(i => s"JOIN t$i ON t$i.doc_id = t0.doc_id AND t$i.start = t0.start")
      .mkString(" ")
    s"""WITH toks AS (
      |  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), ' +')) AS term,
      |    CAST(generate_subscripts(string_split_regex(lower(trim(text)), ' +'), 1) AS BIGINT) AS pos
      |  FROM documents
      |), $streams
      |SELECT t0.doc_id, COUNT(*) AS phrase_tf
      |FROM t0 $joins
      |GROUP BY t0.doc_id
      |ORDER BY phrase_tf DESC, t0.doc_id
      |LIMIT 20""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_search_phrase" -> ((s, d) => textSearchPhrase(s, d)),
    "text_search_phrase_persisted" -> ((s, d) => textSearchPhrasePersisted(s, d))
  )

  val oracleSql: Map[String, String] = Map(
    "text_search_phrase" -> textSearchPhraseSql,
    "text_search_phrase_persisted" -> textSearchPhraseSql
  )
}
