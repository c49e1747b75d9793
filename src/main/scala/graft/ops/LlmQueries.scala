package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** LLM-training-data pipeline operators over `documents` / `embeddings`:
  * deduplication, similarity search, text analysis — the large-scale data
  * curation surface (SURVEY §2), each designed so no comparison ever leaves
  * a blocking bucket (lang / length / label / LSH band), which is what keeps
  * them O(n·bucket) instead of O(n²) at 100 TB.
  *
  * Oracle-parity techniques:
  *  - similarity ratios are int/int divisions (set sizes, quantized dots) —
  *    a single double op, bit-identical across engines;
  *  - embeddings are quantized to integers (floor(x·1000+0.5)) so dot
  *    products and norms are exact integer arithmetic;
  *  - canonical fingerprints use md5 over sorted distinct token lists
  *    (identical in Spark and DuckDB).
  */
object LlmQueries {

  /** Normalized word array — the text family's shared tokenizer: maximal
    * space runs collapse to one delimiter (`split(_, " +")`). Every DuckDB
    * oracle over this grain mirrors it with
    * `string_split_regex(lower(trim(text)), ' +')` — NOT single-char
    * `string_split` — so consecutive-space text tokenizes identically in
    * both engines (r13 advice: the single-char form yields empty tokens
    * only in the oracle).
    */
  private def words(c: Column): Column = split(lower(trim(c)), " +")

  /** Distinct sorted unigram set (the n=1 shingle set). */
  private def wordSet(c: Column): Column = array_sort(array_distinct(words(c)))

  /** Distinct 3-gram word shingles; empty for docs under 3 words.
    * Built with zip_with over shifted slices (not per-index element_at in a
    * transform lambda) so the underlying split() is evaluated O(1) times per
    * row instead of O(len) — per-index lambdas defeat subexpression
    * elimination and turn shingling O(len²).
    */
  private def shingles3(c: Column): Column = {
    val w  = words(c)
    val s1 = slice(w, lit(2), greatest(size(w) - 1, lit(0)))
    val s2 = slice(w, lit(3), greatest(size(w) - 2, lit(0)))
    val tri = zip_with(zip_with(w, s1, (a, b) => concat(a, lit(" "), b)),
      s2, (ab, c2) => concat(ab, lit(" "), c2))
    when(size(w) >= 3, array_distinct(slice(tri, lit(1), size(w) - 2)))
      .otherwise(array().cast("array<string>"))
  }

  // ------------------------------------------------------------------ dedup

  /** Exact dedup: hash-groupBy on normalized text, keep min doc_id, report
    * duplicate groups. One shuffle on the 128-bit key; partial agg does the
    * heavy lifting map-side.
    */
  def dedupExact(spark: SparkSession, dir: String): DataFrame =
    dedupExactOn(Tables.documents(spark, dir))

  /** Core of [[dedupExact]] over any (doc_id, text) corpus — sf0.01 has no
    * exact duplicates, so the positive path is pinned by DedupExactSpec on
    * a synthetic duplicate corpus.
    */
  private[graft] def dedupExactOn(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs
      .select($"doc_id", md5(lower(trim($"text"))).as("text_key"))
      .groupBy($"text_key")
      .agg(
        min($"doc_id").as("keeper_doc_id"),
        count(lit(1)).as("n_docs"),
        array_join(sort_array(collect_set($"doc_id")), ",").as("doc_ids"))
      .filter($"n_docs" > 1)
      .orderBy($"text_key")
  }

  val dedupExactSql: String =
    """SELECT md5(lower(trim(text))) AS text_key,
      |  MIN(doc_id) AS keeper_doc_id,
      |  COUNT(*) AS n_docs,
      |  array_to_string(list_sort(list(DISTINCT doc_id)), ',') AS doc_ids
      |FROM documents
      |GROUP BY 1
      |HAVING COUNT(*) > 1
      |ORDER BY text_key""".stripMargin

  /** Exact dedup as an O(n) KEEPER MAPPING (doc → min-id doc with identical
    * normalized text): the scale-safe output shape of [[dedupExact]] — no
    * per-group id array, so a pathological million-doc duplicate cluster
    * still emits one bounded row per member. One shuffle on the 128-bit
    * key; the min is a window sharing that partitioning.
    */
  def dedupExactKeeper(spark: SparkSession, dir: String): DataFrame =
    dedupExactKeeperOn(Tables.documents(spark, dir))

  /** Core of [[dedupExactKeeper]] over any (doc_id, text) corpus (see
    * [[dedupExactOn]] for why the corpus is injectable).
    */
  private[graft] def dedupExactKeeperOn(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    val w = Window.partitionBy($"text_key")
    docs
      .select($"doc_id", md5(lower(trim($"text"))).as("text_key"))
      .withColumn("keeper_doc_id", min($"doc_id").over(w))
      .filter($"doc_id" =!= $"keeper_doc_id")
      .select($"doc_id", $"keeper_doc_id")
      .orderBy($"doc_id")
  }

  val dedupExactKeeperSql: String =
    """WITH keyed AS (
      |  SELECT doc_id, md5(lower(trim(text))) AS text_key FROM documents
      |), m AS (
      |  SELECT doc_id, MIN(doc_id) OVER (PARTITION BY text_key) AS keeper_doc_id
      |  FROM keyed
      |)
      |SELECT doc_id, keeper_doc_id FROM m
      |WHERE doc_id <> keeper_doc_id
      |ORDER BY doc_id""".stripMargin

  /** Unigram-set Jaccard near-dup pairs ≥ 0.9, blocked by lang (pairs never
    * cross a block). The exact counterpart of the MinHash-LSH scale path.
    */
  def dedupNgramJaccard(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val t = Tables.documents(spark, dir)
      .select($"doc_id", $"lang", wordSet($"text").as("w"))
    val a = t.select($"lang", $"doc_id".as("a"), $"w".as("wa"))
    val b = t.select($"lang", $"doc_id".as("b"), $"w".as("wb"))
    a.join(b, Seq("lang"))
      .filter($"a" < $"b")
      .withColumn("inter", size(array_intersect($"wa", $"wb")))
      .withColumn("uni", size(array_union($"wa", $"wb")))
      .withColumn("jaccard", $"inter".cast("double") / $"uni".cast("double"))
      .filter($"jaccard" >= 0.9)
      .select($"lang", $"a", $"b", $"inter", $"uni", $"jaccard")
      .orderBy($"lang", $"a", $"b")
  }

  val dedupNgramJaccardSql: String =
    """WITH t AS (
      |  SELECT doc_id, lang,
      |    list_sort(list_distinct(string_split_regex(lower(trim(text)), ' +'))) AS w
      |  FROM documents
      |)
      |SELECT a.lang, a.doc_id AS a, b.doc_id AS b,
      |  len(list_intersect(a.w, b.w)) AS inter,
      |  len(list_distinct(list_concat(a.w, b.w))) AS uni,
      |  CAST(len(list_intersect(a.w, b.w)) AS DOUBLE)
      |    / CAST(len(list_distinct(list_concat(a.w, b.w))) AS DOUBLE) AS jaccard
      |FROM t a JOIN t b ON a.lang = b.lang AND a.doc_id < b.doc_id
      |WHERE CAST(len(list_intersect(a.w, b.w)) AS DOUBLE)
      |    / CAST(len(list_distinct(list_concat(a.w, b.w))) AS DOUBLE) >= 0.9
      |ORDER BY 1, 2, 3""".stripMargin

  /** Incremental dedup — the shape every continuously-fed training corpus
    * needs: an incoming batch (doc_id > watermark) is checked against the
    * EXISTING corpus (doc_id ≤ watermark), never against itself; each
    * incoming doc that near-duplicates (unigram Jaccard ≥ 0.9, lang-
    * blocked) any corpus doc is reported once with its best match (highest
    * Jaccard, min corpus id on ties — Jaccard is an int/int division, so
    * the ordering is engine-exact). At 100 TB the corpus side is the
    * pre-computed fingerprint index and the batch side is small — the join
    * shuffles the batch to the index's lang/band partitioning, exactly like
    * the streaming upsert's anti-join.
    */
  def dedupIncremental(spark: SparkSession, dir: String, watermarkId: Long = 250L): DataFrame =
    dedupIncrementalOn(Tables.documents(spark, dir), watermarkId)

  /** Core of [[dedupIncremental]] over any (doc_id, lang, text) corpus —
    * injectable so the banded scale twin
    * ([[ScaleDedup.dedupIncrementalBandedOn]]) can be parity-tested against
    * it on a synthetic near-dup corpus.
    */
  private[graft] def dedupIncrementalOn(docs: DataFrame, watermarkId: Long): DataFrame = {
    import docs.sparkSession.implicits._
    val t = docs
      .select($"doc_id", $"lang", wordSet($"text").as("w"))
    val corpus = t.filter($"doc_id" <= watermarkId)
      .select($"lang", $"doc_id".as("corpus_doc_id"), $"w".as("wc"))
    val incoming = t.filter($"doc_id" > watermarkId)
    val m = incoming.join(corpus, Seq("lang"))
      .withColumn("inter", size(array_intersect($"w", $"wc")))
      .withColumn("uni", size(array_union($"w", $"wc")))
      .withColumn("jaccard", $"inter".cast("double") / $"uni".cast("double"))
      .filter($"jaccard" >= 0.9)
    val w = Window.partitionBy($"doc_id").orderBy($"jaccard".desc, $"corpus_doc_id")
    m.withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"lang", $"doc_id", $"corpus_doc_id", $"inter", $"uni", $"jaccard")
      .orderBy($"lang", $"doc_id")
  }

  val dedupIncrementalSql: String =
    """WITH t AS (
      |  SELECT doc_id, lang,
      |    list_sort(list_distinct(string_split_regex(lower(trim(text)), ' +'))) AS w
      |  FROM documents
      |), m AS (
      |  SELECT i.lang, i.doc_id, c.doc_id AS corpus_doc_id,
      |    len(list_intersect(i.w, c.w)) AS inter,
      |    len(list_distinct(list_concat(i.w, c.w))) AS uni,
      |    CAST(len(list_intersect(i.w, c.w)) AS DOUBLE)
      |      / CAST(len(list_distinct(list_concat(i.w, c.w))) AS DOUBLE) AS jaccard
      |  FROM t i JOIN t c ON i.lang = c.lang AND i.doc_id > 250 AND c.doc_id <= 250
      |  WHERE CAST(len(list_intersect(i.w, c.w)) AS DOUBLE)
      |      / CAST(len(list_distinct(list_concat(i.w, c.w))) AS DOUBLE) >= 0.9
      |), r AS (
      |  SELECT lang, doc_id, corpus_doc_id, inter, uni, jaccard,
      |    row_number() OVER (PARTITION BY doc_id ORDER BY jaccard DESC, corpus_doc_id) AS rn
      |  FROM m
      |)
      |SELECT lang, doc_id, corpus_doc_id, inter, uni, jaccard
      |FROM r WHERE rn = 1
      |ORDER BY lang, doc_id""".stripMargin

  /** Ranked 3-gram-shingle near-dup candidates: top 10 most similar pairs
    * per lang block (deterministic tie-breaks), the "review queue" flavor
    * of shingle dedup.
    */
  def dedupShingleTopk(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val t = Tables.documents(spark, dir)
      .select($"doc_id", $"lang", shingles3($"text").as("sh"))
    val a = t.select($"lang", $"doc_id".as("a"), $"sh".as("sa"))
    val b = t.select($"lang", $"doc_id".as("b"), $"sh".as("sb"))
    val pairs = a.join(b, Seq("lang"))
      .filter($"a" < $"b")
      .withColumn("inter", size(array_intersect($"sa", $"sb")))
      .filter($"inter" > 0)
      .withColumn("uni", size(array_union($"sa", $"sb")))
      .withColumn("jaccard", $"inter".cast("double") / $"uni".cast("double"))
    val w = Window.partitionBy($"lang").orderBy($"jaccard".desc, $"a", $"b")
    pairs.withColumn("rank", row_number().over(w))
      .filter($"rank" <= 10)
      .select($"lang", $"rank", $"a", $"b", $"inter", $"uni", $"jaccard")
      .orderBy($"lang", $"rank")
  }

  val dedupShingleTopkSql: String =
    """WITH t AS (
      |  SELECT doc_id, lang, w,
      |    list_distinct(list_transform(range(1, len(w) - 1),
      |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
      |  FROM (SELECT doc_id, lang, string_split_regex(lower(trim(text)), ' +') AS w FROM documents)
      |), pairs AS (
      |  SELECT a.lang, a.doc_id AS a, b.doc_id AS b,
      |    len(list_intersect(a.sh, b.sh)) AS inter,
      |    len(list_distinct(list_concat(a.sh, b.sh))) AS uni
      |  FROM t a JOIN t b ON a.lang = b.lang AND a.doc_id < b.doc_id
      |  WHERE len(list_intersect(a.sh, b.sh)) > 0
      |), ranked AS (
      |  SELECT lang, a, b, inter, uni,
      |    CAST(inter AS DOUBLE) / CAST(uni AS DOUBLE) AS jaccard,
      |    row_number() OVER (PARTITION BY lang
      |      ORDER BY CAST(inter AS DOUBLE) / CAST(uni AS DOUBLE) DESC, a, b) AS rank
      |  FROM pairs
      |)
      |SELECT lang, rank, a, b, inter, uni, jaccard
      |FROM ranked WHERE rank <= 10
      |ORDER BY lang, rank""".stripMargin

  // ------------------------------------------------- embeddings / similarity

  /** Embedding quantized to exact integers (floor(x·1000+0.5)): dot
    * products and norms become engine-exact integer arithmetic.
    */
  private[graft] def quantized(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.embeddings(spark, dir)
      .select($"vec_id", $"label",
        transform($"embedding", x => floor(x.cast("double") * 1000.0 + 0.5).cast("long")).as("v"))
      .withColumn("nrm", graft.functions.LongVectorDot.vector_dot($"v", $"v"))
  }

  private[graft] val quantizedCte: String =
    """WITH q AS (
      |  SELECT vec_id, label,
      |    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000.0 + 0.5) AS BIGINT)) AS v
      |  FROM embeddings
      |), n AS (
      |  SELECT vec_id, label, v,
      |    CAST(list_sum(list_transform(v, x -> x * x)) AS BIGINT) AS nrm
      |  FROM q
      |)""".stripMargin

  private def dotCol: Column =
    graft.functions.LongVectorDot.vector_dot(col("va"), col("vb"))

  /** Embedding-cosine near-dup pairs (cos ≥ 0.4), blocked by cluster label.
    * The threshold test dot² ≥ 0.16·‖a‖²·‖b‖² is pure integer arithmetic.
    */
  def dedupEmbedding(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val q = quantized(spark, dir)
    val a = q.select($"label", $"vec_id".as("a"), $"v".as("va"), $"nrm".as("na"))
    val b = q.select($"label", $"vec_id".as("b"), $"v".as("vb"), $"nrm".as("nb"))
    a.join(b, Seq("label"))
      .filter($"a" < $"b")
      .withColumn("dot", dotCol)
      .filter($"dot" > 0 && $"dot" * $"dot" * 100L >= $"na" * $"nb" * 16L)
      .withColumn("cosine", $"dot".cast("double") / sqrt(($"na" * $"nb").cast("double")))
      .select($"label", $"a", $"b", $"dot", $"na", $"nb", $"cosine")
      .orderBy($"label", $"a", $"b")
  }

  val dedupEmbeddingSql: String =
    s"""$quantizedCte
       |SELECT a.label, a.vec_id AS a, b.vec_id AS b,
       |  CAST(list_sum(list_transform(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i])) AS BIGINT) AS dot,
       |  a.nrm AS na, b.nrm AS nb,
       |  CAST(list_sum(list_transform(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i])) AS DOUBLE)
       |    / sqrt(CAST(a.nrm * b.nrm AS DOUBLE)) AS cosine
       |FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
       |WHERE list_sum(list_transform(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i])) > 0
       |  AND list_sum(list_transform(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i]))
       |    * list_sum(list_transform(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i])) * 100
       |    >= a.nrm * b.nrm * 16
""".stripMargin

  /** Brute-force exact top-k nearest neighbors (k=5) by quantized dot
    * product for query vectors (vec_id % 10 = 0) — the ANN correctness
    * baseline; the LSH-bucketed variant (ops.Similarity) is the scale path.
    */
  def annTopkExact(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val q = quantized(spark, dir)
    val queries = q.filter($"vec_id" % 10 === 0)
      .select($"vec_id".as("query_id"), $"v".as("va"))
    val cands = q.select($"vec_id".as("neighbor_id"), $"v".as("vb"))
    val scored = queries.join(cands, $"query_id" =!= $"neighbor_id")
      .withColumn("dot", dotCol)
    val w = Window.partitionBy($"query_id").orderBy($"dot".desc, $"neighbor_id")
    scored.withColumn("rank", row_number().over(w))
      .filter($"rank" <= 5)
      .select($"query_id", $"rank", $"neighbor_id", $"dot")
      .orderBy($"query_id", $"rank")
  }

  val annTopkExactSql: String =
    s"""$quantizedCte, scored AS (
       |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
       |    CAST(list_sum(list_transform(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i])) AS BIGINT) AS dot
       |  FROM n a JOIN n b ON a.vec_id % 10 = 0 AND a.vec_id <> b.vec_id
       |), ranked AS (
       |  SELECT query_id, neighbor_id, dot,
       |    row_number() OVER (PARTITION BY query_id ORDER BY dot DESC, neighbor_id) AS rank
       |  FROM scored
       |)
       |SELECT query_id, rank, neighbor_id, dot
       |FROM ranked WHERE rank <= 5
       |ORDER BY query_id, rank""".stripMargin

  /** [[annTopkExact]]'s semantics through the custom PARTIAL TOP-K
    * aggregate ([[graft.functions.PartialTopK]]) instead of a
    * window-rank: per-partition bounded heaps reduce each map task to ≤ k
    * rows per query BEFORE the exchange, where the window form shuffles
    * every scored candidate and sorts it query-side — the difference
    * between `candidates` and `queries × k` rows through the wire, the
    * shape that matters when candidates are a 100 TB corpus. `ORDER BY
    * dot DESC, neighbor_id` is encoded as the struct sort key
    * (−dot, neighbor_id); held to the SAME DuckDB oracle as the window
    * twin, so the equivalence is hash-checked. PlanSpec asserts the
    * partial (ObjectHashAggregate) mode below the exchange.
    */
  def annTopkAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val q = quantized(spark, dir)
    val queries = q.filter($"vec_id" % 10 === 0)
      .select($"vec_id".as("query_id"), $"v".as("va"))
    val cands = q.select($"vec_id".as("neighbor_id"), $"v".as("vb"))
    val scored = queries.join(cands, $"query_id" =!= $"neighbor_id")
      .withColumn("dot", dotCol)
    scored
      .groupBy($"query_id")
      .agg(graft.functions.PartialTopK.partial_topk(
        struct((-$"dot").as("neg_dot"), $"neighbor_id".as("neighbor_id"), $"dot".as("dot")),
        5).as("topk"))
      .select($"query_id", posexplode($"topk").as(Seq("pos", "s")))
      .select($"query_id", ($"pos" + 1).cast("int").as("rank"),
        $"s.neighbor_id".as("neighbor_id"), $"s.dot".as("dot"))
      .orderBy($"query_id", $"rank")
  }

  // ----------------------------------------------------------- text analysis

  private val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of"),
    "es" -> Seq("el", "la", "de"),
    "de" -> Seq("der", "das", "und"),
    "fr" -> Seq("le", "les", "et"),
    "zh" -> Seq("de5", "shi4", "le5"))

  /** Marker-token language ID: per-lang hit counts over the token stream,
    * argmax with a fixed preference order. A real n-gram profile model slots
    * into the same shape (scores are per-row, no shuffle at all).
    */
  def textLangid(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = words($"text")
    def score(ms: Seq[String]): Column =
      size(filter(w, x => ms.map(m => x === lit(m)).reduce(_ || _)))
    val langs = Seq("en", "es", "de", "fr", "zh")
    val scored = Tables.documents(spark, dir)
      .select($"doc_id" +: $"lang".as("labeled_lang") +:
        langs.map(l => score(langMarkers(l)).cast("long").as(s"score_$l")): _*)
    val best = greatest(langs.map(l => col(s"score_$l")): _*)
    scored
      .withColumn("predicted",
        langs.foldRight(lit("und")) { (l, acc) =>
          when(col(s"score_$l") === best && best > 0, lit(l)).otherwise(acc)
        })
      .orderBy($"doc_id")
  }

  val textLangidSql: String = {
    def score(l: String): String = {
      val in = langMarkers(l).map(m => s"x = '$m'").mkString(" OR ")
      s"CAST(len(list_filter(w, x -> $in)) AS BIGINT) AS score_$l"
    }
    val langs = Seq("en", "es", "de", "fr", "zh")
    val best = langs.map(l => s"score_$l").mkString("greatest(", ", ", ")")
    val pred = langs.reverse.foldLeft("'und'") { (acc, l) =>
      s"CASE WHEN score_$l = $best AND $best > 0 THEN '$l' ELSE $acc END"
    }
    s"""WITH t AS (
       |  SELECT doc_id, lang AS labeled_lang,
       |    string_split_regex(lower(trim(text)), ' +') AS w
       |  FROM documents
       |), scored AS (
       |  SELECT doc_id, labeled_lang, ${langs.map(score).mkString(", ")}
       |  FROM t
       |)
       |SELECT doc_id, labeled_lang, score_en, score_es, score_de, score_fr, score_zh,
       |  $pred AS predicted
       |FROM scored
       |ORDER BY doc_id""".stripMargin
  }

  /** Quality scoring: length / distinct-ratio / stopword-ratio heuristics
    * with a keep/drop verdict — the curation filter stage.
    */
  def textQuality(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = words($"text")
    val stop = Seq("the", "a", "of", "and", "to")
    Tables.documents(spark, dir)
      .select($"doc_id", $"n_chars",
        size(w).cast("long").as("n_words"),
        size(array_distinct(w)).cast("long").as("n_distinct_words"),
        size(filter(w, x => stop.map(m => x === lit(m)).reduce(_ || _))).cast("long").as("n_stopwords"))
      .withColumn("avg_word_len",
        ($"n_chars" - ($"n_words" - 1)).cast("double") / $"n_words".cast("double"))
      .withColumn("distinct_ratio", $"n_distinct_words".cast("double") / $"n_words".cast("double"))
      .withColumn("stopword_ratio", $"n_stopwords".cast("double") / $"n_words".cast("double"))
      .withColumn("quality_ok",
        $"n_words" >= 10 && $"avg_word_len" >= 2.0 && $"avg_word_len" <= 12.0 &&
          $"distinct_ratio" >= 0.2)
      .orderBy($"doc_id")
  }

  val textQualitySql: String =
    """WITH t AS (
      |  SELECT doc_id, n_chars, string_split_regex(lower(trim(text)), ' +') AS w
      |  FROM documents
      |), s AS (
      |  SELECT doc_id, n_chars,
      |    CAST(len(w) AS BIGINT) AS n_words,
      |    CAST(len(list_distinct(w)) AS BIGINT) AS n_distinct_words,
      |    CAST(len(list_filter(w, x -> x = 'the' OR x = 'a' OR x = 'of' OR x = 'and' OR x = 'to')) AS BIGINT) AS n_stopwords
      |  FROM t
      |)
      |SELECT doc_id, n_chars, n_words, n_distinct_words, n_stopwords,
      |  CAST(n_chars - (n_words - 1) AS DOUBLE) / CAST(n_words AS DOUBLE) AS avg_word_len,
      |  CAST(n_distinct_words AS DOUBLE) / CAST(n_words AS DOUBLE) AS distinct_ratio,
      |  CAST(n_stopwords AS DOUBLE) / CAST(n_words AS DOUBLE) AS stopword_ratio,
      |  (n_words >= 10 AND CAST(n_chars - (n_words - 1) AS DOUBLE) / CAST(n_words AS DOUBLE) >= 2.0
      |    AND CAST(n_chars - (n_words - 1) AS DOUBLE) / CAST(n_words AS DOUBLE) <= 12.0
      |    AND CAST(n_distinct_words AS DOUBLE) / CAST(n_words AS DOUBLE) >= 0.2) AS quality_ok
      |FROM s
      |ORDER BY doc_id""".stripMargin

  /** §2 entry `text_readability` — FLESCH–KINCAID grade level beside the
    * ratio-based quality screen: the classic readability score a corpus
    * curation pass buckets documents by (too-high grade = legalese /
    * machine-generated runs, negative = fragment soup). Syllables are the
    * standard APPROXIMATION — maximal vowel-group runs ([aeiouy]+) — and
    * sentences are terminator runs ([.!?]+, floored at 1), both counted
    * by the replace-run-then-diff length device: ONE regexp_replace to a
    * single char + one to empty, the difference IS the run count. No
    * tokenizer, no UDF — entirely map-side over the documents scan, two
    * correctly-rounded divides + one literal linear form per row.
    * Hash-gate: lengths are exact integers; DuckDB mirrors with the 'g'
    * flag (its regexp_replace is first-match by default — the one
    * engine-semantics trap here); the FK constants are shared literals.
    * Part of the LLM-curation surface the engine adds on top of the
    * reference (no text analytics exist there — the nearest analog is
    * track-name normalization, track_parent_select.py:1-28).
    */
  def textReadability(spark: SparkSession, dir: String): DataFrame =
    textReadabilityOn(Tables.documents(spark, dir))

  /** The FK scorer over any (doc_id, text) frame — split out for the
    * planted-punctuation specs (the corpus texts carry no terminators,
    * so the sentence axis is spec-covered).
    */
  private[graft] def textReadabilityOn(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    val low = lower(trim($"text"))
    val syl = (length(regexp_replace(low, "[aeiouy]+", "V")) -
      length(regexp_replace(low, "[aeiouy]+", ""))).cast("long")
    val sen = (length(regexp_replace(low, "[.!?]+", "S")) -
      length(regexp_replace(low, "[.!?]+", ""))).cast("long")
    docs.select($"doc_id",
        size(words($"text")).cast("long").as("n_words"),
        syl.as("n_syllables"),
        greatest(sen, lit(1L)).as("n_sentences"))
      .withColumn("words_per_sentence",
        $"n_words".cast("double") / $"n_sentences".cast("double"))
      .withColumn("syllables_per_word",
        when($"n_words" > 0L, $"n_syllables".cast("double") / $"n_words".cast("double")))
      .withColumn("fk_grade",
        lit(0.39) * $"words_per_sentence" + lit(11.8) * $"syllables_per_word"
          - lit(15.59))
      .withColumn("readable",
        when($"fk_grade".isNull, lit(null).cast("boolean"))
          .otherwise($"fk_grade" <= 12.0))
      .orderBy($"doc_id")
  }

  val textReadabilitySql: String =
    """WITH t AS (
      |  SELECT doc_id, lower(trim(text)) AS low,
      |    CAST(len(string_split_regex(lower(trim(text)), ' +')) AS BIGINT) AS n_words
      |  FROM documents
      |), c AS (
      |  SELECT doc_id, n_words,
      |    CAST(len(regexp_replace(low, '[aeiouy]+', 'V', 'g'))
      |      - len(regexp_replace(low, '[aeiouy]+', '', 'g')) AS BIGINT) AS n_syllables,
      |    GREATEST(CAST(len(regexp_replace(low, '[.!?]+', 'S', 'g'))
      |      - len(regexp_replace(low, '[.!?]+', '', 'g')) AS BIGINT), 1) AS n_sentences
      |  FROM t
      |), m AS (
      |  SELECT doc_id, n_words, n_syllables, n_sentences,
      |    CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE) AS words_per_sentence,
      |    CASE WHEN n_words > 0
      |      THEN CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE) END AS syllables_per_word
      |  FROM c
      |), g AS (
      |  SELECT doc_id, n_words, n_syllables, n_sentences, words_per_sentence,
      |    syllables_per_word,
      |    0.39 * words_per_sentence + 11.8 * syllables_per_word - 15.59 AS fk_grade
      |  FROM m
      |)
      |SELECT doc_id, n_words, n_syllables, n_sentences, words_per_sentence,
      |  syllables_per_word, fk_grade,
      |  CASE WHEN fk_grade IS NULL THEN NULL ELSE fk_grade <= 12.0 END AS readable
      |FROM g
      |ORDER BY doc_id""".stripMargin

  /** Curation filter chain — the keep/drop decision step of a training
    * pipeline: rules evaluated in PRIORITY order (first failure wins, like
    * a real filter cascade's short-circuit), each doc emits its verdict and
    * the first reject reason. Pure map-side CASE over the same integer/
    * double metrics as [[textQuality]] (hash-green precedent), so the
    * verdict is engine-exact.
    */
  def curationFilter(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = words($"text")
    val stop = Seq("the", "a", "of", "and", "to")
    Tables.documents(spark, dir)
      .select($"doc_id", $"lang", $"n_chars",
        size(w).cast("long").as("n_words"),
        size(array_distinct(w)).cast("long").as("n_distinct_words"),
        size(filter(w, x => stop.map(m => x === lit(m)).reduce(_ || _))).cast("long").as("n_stopwords"))
      .withColumn("avg_word_len",
        ($"n_chars" - ($"n_words" - 1)).cast("double") / $"n_words".cast("double"))
      .withColumn("distinct_ratio", $"n_distinct_words".cast("double") / $"n_words".cast("double"))
      .withColumn("reason",
        when($"n_words" < 10, "too_short")
          .when($"avg_word_len" < 2.0 || $"avg_word_len" > 12.0, "word_len_out_of_range")
          .when($"distinct_ratio" < 0.2, "low_diversity")
          .when($"n_stopwords" === 0, "no_stopwords")
          .otherwise("keep"))
      .select($"doc_id", $"lang", $"n_words", $"reason",
        ($"reason" === "keep").as("keep"))
      .orderBy($"doc_id")
  }

  val curationFilterSql: String =
    """WITH t AS (
      |  SELECT doc_id, lang, n_chars, string_split_regex(lower(trim(text)), ' +') AS w
      |  FROM documents
      |), s AS (
      |  SELECT doc_id, lang, n_chars,
      |    CAST(len(w) AS BIGINT) AS n_words,
      |    CAST(len(list_distinct(w)) AS BIGINT) AS n_distinct_words,
      |    CAST(len(list_filter(w, x -> x = 'the' OR x = 'a' OR x = 'of' OR x = 'and' OR x = 'to')) AS BIGINT) AS n_stopwords
      |  FROM t
      |), m AS (
      |  SELECT doc_id, lang, n_words, n_stopwords,
      |    CAST(n_chars - (n_words - 1) AS DOUBLE) / CAST(n_words AS DOUBLE) AS avg_word_len,
      |    CAST(n_distinct_words AS DOUBLE) / CAST(n_words AS DOUBLE) AS distinct_ratio
      |  FROM s
      |)
      |SELECT doc_id, lang, n_words,
      |  CASE
      |    WHEN n_words < 10 THEN 'too_short'
      |    WHEN avg_word_len < 2.0 OR avg_word_len > 12.0 THEN 'word_len_out_of_range'
      |    WHEN distinct_ratio < 0.2 THEN 'low_diversity'
      |    WHEN n_stopwords = 0 THEN 'no_stopwords'
      |    ELSE 'keep'
      |  END AS reason,
      |  (CASE
      |    WHEN n_words < 10 THEN 'too_short'
      |    WHEN avg_word_len < 2.0 OR avg_word_len > 12.0 THEN 'word_len_out_of_range'
      |    WHEN distinct_ratio < 0.2 THEN 'low_diversity'
      |    WHEN n_stopwords = 0 THEN 'no_stopwords'
      |    ELSE 'keep'
      |  END = 'keep') AS keep
      |FROM m
      |ORDER BY doc_id""".stripMargin

  /** Token counting: whitespace tokens + a bytes-per-token estimate (the
    * BPE-ish ~4 chars/token heuristic), per source rollup.
    */
  def textTokens(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"source", $"n_chars", size(words($"text")).cast("long").as("ws_tokens"))
      .withColumn("bpe_tokens", ceil($"n_chars".cast("double") / 4.0).cast("long"))
      .groupBy($"source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum($"ws_tokens").as("total_ws_tokens"),
        sum($"bpe_tokens").as("total_bpe_tokens"),
        sum($"n_chars").as("total_chars"),
        (sum($"n_chars").cast("double") / sum($"ws_tokens").cast("double")).as("chars_per_token"))
      .orderBy($"source")
  }

  val textTokensSql: String =
    """WITH t AS (
      |  SELECT source, n_chars,
      |    CAST(len(string_split_regex(lower(trim(text)), ' +')) AS BIGINT) AS ws_tokens,
      |    CAST(ceil(CAST(n_chars AS DOUBLE) / 4.0) AS BIGINT) AS bpe_tokens
      |  FROM documents
      |)
      |SELECT source, COUNT(*) AS n_docs,
      |  CAST(SUM(ws_tokens) AS BIGINT) AS total_ws_tokens,
      |  CAST(SUM(bpe_tokens) AS BIGINT) AS total_bpe_tokens,
      |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
      |  CAST(SUM(n_chars) AS DOUBLE) / CAST(SUM(ws_tokens) AS DOUBLE) AS chars_per_token
      |FROM t
      |GROUP BY source
      |ORDER BY source""".stripMargin

  /** §2 entry `text_ttr` — LEXICAL DIVERSITY per document: type-token
    * ratio and the hapax-legomena share, the two cheapest repetition /
    * templating signals in a curation stack (`text_repetition_filter`
    * hunts adjacent n-gram loops; TTR catches GLOBAL vocabulary
    * poverty — a doc that cycles 40 words through 1000 tokens — and a
    * high hapax share flags boilerplate-with-slot-filling and OCR
    * noise). Same whitespace token grain as `text_tokens`.
    *
    * Scale shape: explode → ONE (doc_id, word) partial-agg collapse
    * (map-side combined; the grain every within-doc frequency stat
    * shares) → a doc-grain re-agg on the already-collapsed frame.
    * Exactness: counts are BIGINTs; the two ratios are one
    * correctly-rounded divide each, mirrored token for token (token
    * counts are ≥ 1 by the split semantics — empty text yields the
    * single '' token in both engines, so no NULL edge exists).
    */
  def textTtr(spark: SparkSession, dir: String): DataFrame =
    ttrOn(Tables.documents(spark, dir))

  /** The TTR core over a caller-supplied (doc_id, text) frame — split
    * out for the planted specs.
    */
  private[graft] def ttrOn(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs
      .select($"doc_id", explode(words($"text")).as("w"))
      .groupBy($"doc_id", $"w").agg(count(lit(1)).as("c"))
      .groupBy($"doc_id").agg(
        sum($"c").as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when($"c" === 1L, 1L).otherwise(0L)).as("n_hapax"))
      .withColumn("ttr", $"n_types".cast("double") / $"n_tokens".cast("double"))
      .withColumn("hapax_ratio", $"n_hapax".cast("double") / $"n_types".cast("double"))
      .orderBy($"doc_id")
  }

  val textTtrSql: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), ' +')) AS w
      |  FROM documents
      |), wc AS (
      |  SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY 1, 2
      |), agg AS (
      |  SELECT doc_id,
      |    CAST(SUM(c) AS BIGINT) AS n_tokens,
      |    CAST(COUNT(*) AS BIGINT) AS n_types,
      |    CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax
      |  FROM wc GROUP BY 1
      |)
      |SELECT doc_id, n_tokens, n_types, n_hapax,
      |  CAST(n_types AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS ttr,
      |  CAST(n_hapax AS DOUBLE) / CAST(n_types AS DOUBLE) AS hapax_ratio
      |FROM agg
      |ORDER BY doc_id""".stripMargin

  /** Canonical document fingerprints: md5 over the sorted distinct unigram
    * and 3-gram shingle sets (the portable form; the rolling-hash Catalyst
    * expression in functions.RollingHash is the codegen'd streaming form).
    */
  def textFingerprint(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"doc_id",
        md5(concat_ws(" ", wordSet($"text"))).as("word_fingerprint"),
        md5(concat_ws("|", array_sort(shingles3($"text")))).as("shingle_fingerprint"))
      .orderBy($"doc_id")
  }

  val textFingerprintSql: String =
    """WITH t AS (
      |  SELECT doc_id, string_split_regex(lower(trim(text)), ' +') AS w FROM documents
      |)
      |SELECT doc_id,
      |  md5(array_to_string(list_sort(list_distinct(w)), ' ')) AS word_fingerprint,
      |  md5(array_to_string(list_sort(list_distinct(list_transform(range(1, len(w) - 1),
      |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))), '|')) AS shingle_fingerprint
      |FROM t
      |ORDER BY doc_id""".stripMargin

  /** Distinctive-term extraction — integer tf-idf: per document, the top-3
    * terms ranked by (tf DESC, df ASC, term ASC). The tf-idf ordering is
    * monotone in term frequency and inverse document frequency, so ranking
    * on the raw integers gives the tf-idf ranking without a transcendental
    * log — engine-portable and oracle-exact (doubles never appear).
    * Plan shape: two partial-agg shuffles (doc-term tf, term df), one
    * equi-join on term (vocabulary-sized — shuffle join, the right call at
    * 100 TB where the vocabulary itself is too big to broadcast), one
    * per-doc window.
    */
  def textTfidf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val toks = Tables.documents(spark, dir)
      .select($"doc_id", explode(words($"text")).as("term"))
    val tf = toks.groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
    val dfreq = toks.groupBy($"term").agg(countDistinct($"doc_id").as("df"))
    val w = Window.partitionBy($"doc_id").orderBy($"tf".desc, $"df".asc, $"term")
    tf.join(dfreq, Seq("term"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= 3)
      .select($"doc_id", $"rank", $"term", $"tf", $"df")
      .orderBy($"doc_id", $"rank")
  }

  val textTfidfSql: String =
    """WITH toks AS (
      |  SELECT doc_id, u AS term
      |  FROM (SELECT doc_id, string_split_regex(lower(trim(text)), ' +') AS w FROM documents),
      |    UNNEST(w) AS r(u)
      |), t AS (
      |  SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term
      |), d AS (
      |  SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY term
      |), ranked AS (
      |  SELECT t.doc_id, t.term, t.tf, d.df,
      |    CAST(row_number() OVER (PARTITION BY t.doc_id ORDER BY t.tf DESC, d.df ASC, t.term) AS BIGINT) AS rank
      |  FROM t JOIN d USING (term)
      |)
      |SELECT doc_id, rank, term, tf, df
      |FROM ranked WHERE rank <= 3
      |ORDER BY doc_id, rank""".stripMargin

  /** Model-based quality filtering (the FineWeb/fastText-classifier stage
    * that follows the heuristic rules): a linear classifier's dot product
    * over per-doc count features, applied as one map-side inference pass.
    * The weight vector is a fixed integer stand-in for trained
    * coefficients (diversity up, stopword evidence up, repetition down);
    * the decision normalizes by document length via cross-multiplication
    * — margin = 10·(w·f) − 25·n_words — so everything stays
    * integer-exact (no ratio, no sigmoid; monotone in the same decision,
    * the device that made text_tfidf oracle-exact).
    *
    * Scale shape: features come from the same split-once word array as
    * [[textQuality]]; inference is pure projection — no shuffle at all
    * before the output sort. At 100 TB this is the cheapest pass in the
    * pipeline, exactly as classifier inference should be.
    */
  def qualityClassifier(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    qualityClassifierOn(Tables.documents(spark, dir)).orderBy($"doc_id")
  }

  /** The inference core, shared with the streaming screen
    * ([[graft.streaming.CorpusStream.classifyStream]]) so batch and
    * streaming decisions can never diverge. Works on any (doc_id, text)
    * frame, batch or streaming (pure projection — stateless);
    * `passthrough` columns ride along so downstream stages (per-source
    * pruning) need no corpus re-scan or self-join to recover them.
    */
  private[graft] def qualityClassifierOn(docs: DataFrame, passthrough: Seq[String] = Nil): DataFrame = {
    import docs.sparkSession.implicits._
    val w = words($"text")
    val stop = Seq("the", "a", "of", "and", "to")
    docs
      .select(($"doc_id" +: passthrough.map(col)) ++ Seq(
        size(w).cast("long").as("n_words"),
        size(array_distinct(w)).cast("long").as("n_distinct"),
        size(filter(w, x => stop.map(m => x === lit(m)).reduce(_ || _))).cast("long").as("n_stopwords")): _*)
      .withColumn("score",
        lit(5L) * $"n_distinct" + lit(3L) * $"n_stopwords"
          - lit(2L) * ($"n_words" - $"n_distinct"))
      .withColumn("margin", lit(10L) * $"score" - lit(25L) * $"n_words")
      .withColumn("label", when($"margin" >= 0, "hq").otherwise("lq"))
  }

  val qualityClassifierSql: String =
    """WITH t AS (
      |  SELECT doc_id, string_split_regex(lower(trim(text)), ' +') AS w FROM documents
      |), f AS (
      |  SELECT doc_id,
      |    CAST(len(w) AS BIGINT) AS n_words,
      |    CAST(len(list_distinct(w)) AS BIGINT) AS n_distinct,
      |    CAST(len(list_filter(w, x -> x = 'the' OR x = 'a' OR x = 'of' OR x = 'and' OR x = 'to')) AS BIGINT) AS n_stopwords
      |  FROM t
      |), s AS (
      |  SELECT *, 5 * n_distinct + 3 * n_stopwords - 2 * (n_words - n_distinct) AS score
      |  FROM f
      |)
      |SELECT doc_id, n_words, n_distinct, n_stopwords,
      |  CAST(score AS BIGINT) AS score,
      |  CAST(10 * score - 25 * n_words AS BIGINT) AS margin,
      |  CASE WHEN 10 * score - 25 * n_words >= 0 THEN 'hq' ELSE 'lq' END AS label
      |FROM s
      |ORDER BY doc_id""".stripMargin

  /** Quality-pruned mixture (the FineWeb-style "keep the best 30% of each
    * source" stage): classifier margins ranked WITHIN each source via
    * percent_rank (deterministic doc_id tie-break), the top fraction kept,
    * reported as a per-source rollup. Pruning per source rather than
    * globally preserves the mixture — a weak source is thinned, not
    * deleted by stronger sources' scores.
    *
    * Scale shape: inference is the map-side classifier pass; the rank
    * window partitions on source (state bounded per partition by that
    * source's docs — at trillion-doc scale the same decision runs as a
    * per-source quantile threshold from sketch_percentile_kll, one
    * broadcast row per source, avoiding the within-source sort); rollup is
    * a partial agg on the same key. percent_rank's (rank−1)/(n−1) is the
    * identical double in both engines, so the keep set is oracle-exact.
    */
  def curationQualityPrune(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val keep = 0.3
    // source rides through the classifier core — no corpus re-scan or
    // doc_id self-join just to recover it
    val scored = qualityClassifierOn(Tables.documents(spark, dir), passthrough = Seq("source"))
    val pr = percent_rank().over(
      Window.partitionBy($"source").orderBy($"margin".desc, $"doc_id"))
    scored.withColumn("pr", pr)
      .groupBy($"source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when($"pr" <= keep, 1L).otherwise(0L)).as("n_kept"),
        min(when($"pr" <= keep, $"margin")).as("min_kept_margin"),
        max(when($"pr" > keep, $"margin")).as("max_dropped_margin"))
      .orderBy($"source")
  }

  val curationQualityPruneSql: String =
    """WITH t AS (
      |  SELECT doc_id, source, string_split_regex(lower(trim(text)), ' +') AS w FROM documents
      |), f AS (
      |  SELECT doc_id, source,
      |    CAST(len(w) AS BIGINT) AS n_words,
      |    CAST(len(list_distinct(w)) AS BIGINT) AS n_distinct,
      |    CAST(len(list_filter(w, x -> x = 'the' OR x = 'a' OR x = 'of' OR x = 'and' OR x = 'to')) AS BIGINT) AS n_stopwords
      |  FROM t
      |), m AS (
      |  SELECT doc_id, source,
      |    10 * (5 * n_distinct + 3 * n_stopwords - 2 * (n_words - n_distinct)) - 25 * n_words AS margin
      |  FROM f
      |), r AS (
      |  SELECT *, percent_rank() OVER (
      |    PARTITION BY source ORDER BY margin DESC, doc_id) AS pr
      |  FROM m
      |)
      |SELECT source, COUNT(*) AS n_docs,
      |  CAST(SUM(CASE WHEN pr <= 0.3 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |  CAST(MIN(CASE WHEN pr <= 0.3 THEN margin END) AS BIGINT) AS min_kept_margin,
      |  CAST(MAX(CASE WHEN pr > 0.3 THEN margin END) AS BIGINT) AS max_dropped_margin
      |FROM r
      |GROUP BY source
      |ORDER BY source""".stripMargin

  /** Unicode-script character profile — the multilingual-routing signal
    * next to [[textLangid]]'s marker-word heuristic: langid needs WORDS it
    * recognizes, the script histogram works on any text (and catches
    * mixed-script spam / mojibake that wordlists can't). Per-script counts
    * via length-difference under a codepoint-range strip — one map-side
    * pass, no tokenization, no shuffle before the output sort. Explicit
    * `\x{...}` ranges (not `\p{...}` script classes) because Java regex
    * and DuckDB's RE2 agree on the former verbatim — that's what makes the
    * entry oracle hash-exact.
    */
  def textScriptProfile(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    textScriptProfileOn(Tables.documents(spark, dir)).orderBy($"doc_id")
  }

  /** The profiling core over any (doc_id, text) frame — injectable for the
    * planted-script spec; sort-free (streamable).
    */
  private[graft] def textScriptProfileOn(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    val scripts = TextScripts.ranges
    def count(cls: String): Column =
      (length($"text") - length(regexp_replace($"text", cls, ""))).cast("long")
    val counted = docs
      .select($"doc_id" +: length($"text").cast("long").as("n_chars") +:
        scripts.map { case (name, cls) => count(cls).as(s"n_$name") }: _*)
    val best = greatest(scripts.map { case (n, _) => col(s"n_$n") }: _*)
    counted
      .withColumn("dominant_script",
        scripts.foldRight(lit("none")) { case ((n, _), acc) =>
          when(col(s"n_$n") === best && best > 0, lit(n)).otherwise(acc)
        })
  }

  val textScriptProfileSql: String = {
    val counts = TextScripts.ranges.map { case (name, cls) =>
      s"CAST(length(text) - length(regexp_replace(text, '$cls', '', 'g')) AS BIGINT) AS n_$name"
    }.mkString(",\n      |    ")
    val greatestExpr = TextScripts.ranges.map { case (n, _) => s"n_$n" }.mkString("greatest(", ", ", ")")
    val dominant = TextScripts.ranges.foldRight("'none'") { case ((n, _), acc) =>
      s"CASE WHEN n_$n = $greatestExpr AND $greatestExpr > 0 THEN '$n' ELSE $acc END"
    }
    s"""WITH c AS (
       |  SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
       |    $counts
       |  FROM documents
       |)
       |SELECT c.*, $dominant AS dominant_script
       |FROM c
       |ORDER BY doc_id""".stripMargin
  }

  /** Keyword retrieval over the corpus — the inverted-index search shape
    * (the missing READ side of the text family: tf-idf profiles documents,
    * decontamination probes grams; this ANSWERS A QUERY). Fixed query
    * terms → per-(doc, term) tf from one explode+groupBy (the posting
    * lists, partial-agged), df per term over the matched docs' table, rank
    * by Σ (tf·N·2²⁰ div df) — idf-weighted tf in PURE INTEGER arithmetic
    * (scaled integer division, order-independent under any partitioning
    * and bit-identical across engines; a float Σ tf·N/df would drift with
    * partial-agg summation order, and log-idf BM25 is the production
    * upgrade avoided per §5's no-transcendentals oracle policy),
    * deterministic (score desc, doc_id) tie-break.
    *
    * Scale shape: query terms are an isin filter pushed into the
    * token stream (only matching postings survive the explode), the df/N
    * sides are broadcast one-row/`q`-row tables, ranking is a TakeOrdered
    * top-20 — no corpus-wide shuffle beyond the posting groupBy. At 100 TB
    * the posting lists are the PERSISTED index (the band-index lifecycle)
    * and queries touch only their terms' lists.
    */
  def textSearch(spark: SparkSession, dir: String,
      terms: Seq[String] = Seq("data", "model", "training", "quality")): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    val n = docs.agg(count(lit(1)).as("n_docs")) // 1-row broadcast
    val postings = docs
      .select($"doc_id", explode(words($"text")).as("term"))
      .filter($"term".isInCollection(terms))
      .groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
    val df = postings.groupBy($"term").agg(count(lit(1)).as("df")) // ≤ |terms| rows
    postings.join(broadcast(df), Seq("term")).crossJoin(broadcast(n))
      .withColumn("w", expr("tf * n_docs * 1048576 div df"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_terms_hit"),
        sum($"tf").as("total_tf"),
        sum($"w").as("score_scaled"))
      .orderBy($"score_scaled".desc, $"doc_id")
      .limit(20)
      .select($"doc_id", $"n_terms_hit", $"total_tf", $"score_scaled")
  }

  /** Persist the FULL inverted index (every term's posting list + the
    * 1-row corpus meta): the write-once artifact [[textSearchFromIndex]]
    * serves from. One corpus pass; postings are partial-agged on
    * (doc, term) then laid out clustered by term, which is what lets a
    * query read only its terms' row groups.
    */
  def savePostingIndex(spark: SparkSession, dir: String, indexPath: String): Unit =
    savePostingIndexOf(Tables.documents(spark, dir), indexPath)

  /** The posting layout's directory axis: terms hash into `postingBuckets`
    * `tb=<n>` partition dirs, so (a) a query's file listing prunes to its
    * terms' buckets — at 100 TB the index is huge but a 4-term query
    * lists 4/64ths of it — and (b) compaction after streamed appends
    * rewrites oversized buckets independently ([[compactPostingBuckets]]).
    */
  private[graft] val postingBuckets = 64
  private[graft] def termBucket(term: Column): Column =
    pmod(xxhash64(term), lit(postingBuckets.toLong))

  /** Frame-based core of [[savePostingIndex]] (injectable for the
    * append-equals-rebuild parity spec). Meta is an APPENDABLE ledger —
    * one `n_docs` row per landed batch; the serve path sums it, so
    * [[appendToPostingIndex]] never read-modify-writes shared state.
    */
  private[graft] def savePostingIndexOf(docs: DataFrame, indexPath: String): Unit = {
    import docs.sparkSession.implicits._
    postingRows(docs)
      .write.mode("overwrite").partitionBy("tb").parquet(s"$indexPath/postings")
    normRows(docs)
      .write.mode("overwrite").parquet(s"$indexPath/norms")
    metaRow(docs)
      .coalesce(1).write.mode("overwrite").parquet(s"$indexPath/meta")
  }

  /** Lucene-style norms ledger: one (doc_id, dl) row per doc, where dl is
    * the single-space token length [[Bm25.toks]] — the per-doc constant
    * BM25's length normalization needs at serve time without touching the
    * corpus text. Written beside the postings at save AND append (same
    * batch granularity); at 100 TB this table is corpus-METADATA-sized
    * (16 bytes/doc) and would bucket by doc_id for a co-located join.
    */
  private def normRows(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select($"doc_id", size(Bm25.toks($"text")).cast("long").as("dl"))
  }

  /** Meta ledger row for one landed batch: doc count + total token length
    * (the BM25 avgdl numerator) — serve sums the ledger, appends never
    * read-modify-write.
    */
  private def metaRow(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.agg(count(lit(1)).as("n_docs"),
      sum(size(Bm25.toks($"text")).cast("long")).as("total_len"))
  }

  /** (doc_id, term, tf, tb) posting rows of a corpus slice, clustered for
    * the bucketed layout: exchange on the bucket, (term, doc_id)-sorted
    * within, so each bucket file's row groups stay term-contiguous.
    */
  private def postingRows(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select($"doc_id", explode(words($"text")).as("term"))
      .groupBy($"term", $"doc_id").agg(count(lit(1)).as("tf"))
      .withColumn("tb", termBucket($"term"))
      .repartition($"tb")
      .sortWithinPartitions($"tb", $"term", $"doc_id")
  }

  /** Grow the persisted inverted index with a LANDED batch — the
    * [[ScaleDedup.appendToBandIndex]] contract, closing the posting
    * index's save/serve/append lifecycle: only the batch is tokenized and
    * partial-agged (I/O and compute O(batch), the corpus is never
    * re-scanned), its term postings land as appended files in only the
    * touched term-bucket dirs (the FAISS add() model; oversized buckets
    * fold back via [[compactPostingBuckets]]), and the corpus meta ledger
    * gains one batch-count row. Batch doc_ids must be new to the index
    * (the append-only discipline every persisted family shares); the
    * idempotent ingest guard for replayed batches is the streaming sinks'
    * Bloom anti-join ([[graft.streaming.CorpusStream.postingIndexSink]]).
    */
  def appendToPostingIndex(batch: DataFrame, indexPath: String): Unit = {
    postingRows(batch)
      .write.mode("append").partitionBy("tb").parquet(s"$indexPath/postings")
    normRows(batch)
      .write.mode("append").parquet(s"$indexPath/norms")
    metaRow(batch)
      .coalesce(1).write.mode("append").parquet(s"$indexPath/meta")
  }

  /** OPTIMIZE cadence for the streamed posting index — the
    * [[ZorderLayout.compactCells]] discipline on the term-bucket axis:
    * buckets whose file count grew past `maxFiles` (each appended batch
    * lands one file per touched bucket) are rewritten as ONE
    * (term, doc_id)-sorted file each; census is listing metadata only,
    * I/O is O(oversized buckets), untouched buckets keep their files
    * byte-identical (dynamic partition overwrite), idempotent. Returns the
    * compacted bucket ids.
    */
  def compactPostingBuckets(spark: SparkSession, indexPath: String, maxFiles: Int = 4): Seq[Int] = {
    import org.apache.hadoop.fs.Path
    val root = new Path(s"$indexPath/postings")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Seq.empty
    val oversized = fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("tb="))
      .filter(d => fs.listStatus(d.getPath)
        .count(_.getPath.getName.endsWith(".parquet")) > maxFiles)
      .map(_.getPath.getName.stripPrefix("tb=").toInt)
      .sorted
    if (oversized.nonEmpty) {
      spark.read.parquet(s"$indexPath/postings")
        .filter(col("tb").isin(oversized: _*)) // partition-pruned scan
        .repartition(oversized.length, col("tb"))
        .sortWithinPartitions(col("tb"), col("term"), col("doc_id"))
        .localCheckpoint() // materialize before overwriting the cells being read
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("tb")
        .parquet(s"$indexPath/postings")
    }
    oversized
  }

  /** Drop every row of the given doc_ids from a `tb=`-bucketed posting
    * table — the shared routine of the tf/BM25 index's DELETE and the
    * positional index's ([[graft.ops.PhraseSearch]]). The purge's bucket
    * discipline: ONE column-pruned probe finds the ≤ `postingBuckets`
    * affected bucket ids, only those rewrite (dynamic partition
    * overwrite; buckets left EMPTY by the delete have no rows for the
    * dynamic overwrite to land, so their dirs are removed explicitly),
    * and untouched buckets keep their files byte-identical. Returns the
    * affected bucket ids; empty (and zero I/O beyond the probe) when
    * none of the docs are present — which is what makes a re-delete
    * idempotent and mtime-stable.
    */
  private[graft] def deleteDocsFromBucketedTable(spark: SparkSession,
      tablePath: String, docIds: Seq[Long], sortCols: Seq[String]): Seq[Int] =
    deleteKeysFromPartitionedTable(spark, tablePath, "doc_id", "tb", docIds, sortCols)

  /** The general form: drop every row whose `keyCol` is in `keys` from a
    * `partCol=`-partitioned table — shared by the tf/BM25 and positional
    * posting indexes (doc_id / tb) and the z-order layout's user purge
    * (user_id / cell, where z-ordering itself is what keeps one user's
    * rows clustered into few cells).
    */
  private[graft] def deleteKeysFromPartitionedTable(spark: SparkSession,
      tablePath: String, keyCol: String, partCol: String, keys: Seq[Long],
      sortCols: Seq[String]): Seq[Int] = {
    import org.apache.hadoop.fs.Path
    val root = new Path(tablePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Seq.empty
    val tbl = spark.read.parquet(tablePath)
    val affected = tbl.filter(col(keyCol).isin(keys: _*))
      .select(col(partCol).cast("int")).distinct()
      .collect().map(_.getInt(0)).toSeq.sorted
    if (affected.nonEmpty) {
      val remaining = tbl.filter(col(partCol).isin(affected: _*))
        .filter(!col(keyCol).isin(keys: _*))
        .localCheckpoint() // materialize before overwriting the dirs being read
      val kept = remaining.select(col(partCol).cast("int")).distinct()
        .collect().map(_.getInt(0)).toSet
      if (kept.nonEmpty)
        remaining.repartition(kept.size, col(partCol))
          .sortWithinPartitions(sortCols.map(col): _*)
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy(partCol)
          .parquet(tablePath)
      affected.filterNot(kept)
        .foreach(b => fs.delete(new Path(s"$tablePath/$partCol=$b"), true))
    }
    affected
  }

  /** GDPR DELETE through the persisted inverted index — the
    * [[graft.etl.UserPurge]] bucket discipline applied to the document
    * store: the docs' postings vanish from only their ≤ 64 touched
    * `tb=` buckets ([[deleteDocsFromBucketedTable]]), the norms ledger
    * rewrites without their rows (corpus-METADATA-sized — 16 bytes/doc),
    * and the meta ledger gains ONE NEGATIVE correction row (−n_docs,
    * −total_len): serve already SUMS the ledger, so no
    * read-modify-write — the CF ledgers' negated-delta device on the
    * corpus-stats axis. Serve-after-delete is EXACTLY
    * rebuild-without-docs (same postings, same norms, same ledger
    * sums → identical BM25/tf scores), spec-pinned; a re-delete finds
    * no norm rows and no postings and touches nothing.
    */
  def deleteFromPostingIndex(spark: SparkSession, indexPath: String,
      docIds: Seq[Long]): Seq[Int] = {
    import spark.implicits._
    val norms = spark.read.parquet(s"$indexPath/norms")
    if (!norms.filter($"doc_id".isin(docIds: _*)).isEmpty) {
      AtomicRewrite.overwrite(
        norms.filter(!$"doc_id".isin(docIds: _*))
          .localCheckpoint(), // pin before replacing the dir being read
        s"$indexPath/norms")
    }
    // meta correction by RECONCILIATION, not by a pre-rewrite delta: the
    // appended row is (norms truth − ledger sums), so it is correct from
    // ANY starting state — a crash between the norms rewrite and this
    // append just leaves drift that the retry (or the next delete)
    // measures and closes, where a delta computed before the rewrite
    // was lost forever once the retry's probe saw no matching norm rows.
    // After a clean run drift is zero and nothing is appended.
    val truth = spark.read.parquet(s"$indexPath/norms")
      .agg(count(lit(1)).as("n"), coalesce(sum($"dl"), lit(0L)).as("len")).head()
    val ledger = spark.read.parquet(s"$indexPath/meta")
      .agg(coalesce(sum($"n_docs"), lit(0L)).as("n"),
        coalesce(sum($"total_len"), lit(0L)).as("len")).head()
    val (dn, dl) = (truth.getLong(0) - ledger.getLong(0),
      truth.getLong(1) - ledger.getLong(1))
    if (dn != 0L || dl != 0L)
      Seq((dn, dl)).toDF("n_docs", "total_len")
        .coalesce(1).write.mode("append").parquet(s"$indexPath/meta")
    deleteDocsFromBucketedTable(spark, s"$indexPath/postings", docIds,
      Seq("tb", "term", "doc_id"))
  }

  /** Serve a query from the LOADED posting lists — the corpus text is
    * never read, tokenized, or counted at query time; identical scoring to
    * [[textSearch]], so the persisted entry shares its DuckDB oracle
    * verbatim.
    */
  def textSearchFromIndex(spark: SparkSession, indexPath: String,
      terms: Seq[String]): DataFrame = {
    import spark.implicits._
    // the query terms' bucket ids, computed with the SAME hash the layout
    // used (one tiny local-relation job, |terms| rows) — a literal isin on
    // the tb partition column, so the file listing itself prunes to the
    // matching bucket dirs before any row is read
    val tbs = spark.createDataset(terms).toDF("term")
      .select(termBucket($"term").as("tb"))
      .distinct().collect().map(_.getLong(0))
    val postings = spark.read.parquet(s"$indexPath/postings")
      .filter($"tb".isin(tbs: _*))
      .filter($"term".isInCollection(terms))
    // meta is a per-batch ledger (one row per save/append): total = sum
    val n = spark.read.parquet(s"$indexPath/meta")
      .agg(sum($"n_docs").cast("long").as("n_docs"))
    val df = postings.groupBy($"term").agg(count(lit(1)).as("df"))
    postings.join(broadcast(df), Seq("term")).crossJoin(broadcast(n))
      .withColumn("w", expr("tf * n_docs * 1048576 div df"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_terms_hit"),
        sum($"tf").as("total_tf"),
        sum($"w").as("score_scaled"))
      .orderBy($"score_scaled".desc, $"doc_id")
      .limit(20)
      .select($"doc_id", $"n_terms_hit", $"total_tf", $"score_scaled")
  }

  /** Hybrid retrieval by Reciprocal Rank Fusion — the modern RAG-stack
    * shape: the keyword ranking ([[textSearch]]'s integer scoring) and an
    * exact-dot vector ranking against a query embedding are fused by
    * rrf = Σ 1/(60+rank) — RANK-based fusion, so the two scores'
    * incomparable units never meet (the reason RRF is the default hybrid
    * everywhere). Both ranks come from the vocab-top pattern: TakeOrdered
    * top-100 survivors, then row_number over a constant non-foldable
    * partition key — no global window (repo guard applies). The RRF sum is
    * two exact-input IEEE divisions added in fixed expression order —
    * deterministic, so the entry is oracle hash-exact (DuckDB casts to
    * DOUBLE explicitly; its bare 1.0 literal is DECIMAL).
    */
  def hybridSearchRrf(spark: SparkSession, dir: String,
      terms: Seq[String] = Seq("data", "model", "training", "quality")): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val postings = docs.select($"doc_id", explode(words($"text")).as("term"))
      .filter($"term".isInCollection(terms))
      .groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
    hybridSearchRrfOn(spark, dir, postings, nDocs)
  }

  /** Fusion core shared by the in-session and persisted-index hybrid
    * entries: `postings` is the matched (doc_id, term, tf) set and
    * `nDocs` the 1-row corpus size — from a corpus scan or from the
    * loaded index, the scoring is identical, so both entries share
    * [[hybridSearchRrfSql]]'s oracle verbatim.
    */
  private def hybridSearchRrfOn(spark: SparkSession, dir: String,
      postings: DataFrame, nDocs: DataFrame): DataFrame = {
    import spark.implicits._
    import graft.functions.LongVectorDot.vector_dot
    val dfT = postings.groupBy($"term").agg(count(lit(1)).as("df"))
    val kwTop = postings.join(broadcast(dfT), Seq("term")).crossJoin(broadcast(nDocs))
      .withColumn("w", expr("tf * n_docs * 1048576 div df"))
      .groupBy($"doc_id").agg(sum($"w").as("s"))
      .orderBy($"s".desc, $"doc_id").limit(100)
    val wk = Window.partitionBy(pmod($"s", lit(1))).orderBy($"s".desc, $"doc_id")
    val kwRank = kwTop.withColumn("rank_kw", row_number().over(wk).cast("long"))
      .select($"doc_id", $"rank_kw")
    val emb = Tables.embeddings(spark, dir)
      .select($"vec_id",
        transform($"embedding", x => floor(x.cast("double") * 1000.0 + 0.5).cast("long")).as("v"))
    val qv = emb.filter($"vec_id" === 0L).select($"v".as("qvec"))
    val vecTop = emb.filter($"vec_id" =!= 0L).crossJoin(broadcast(qv))
      .withColumn("dot", vector_dot($"v", $"qvec"))
      .orderBy($"dot".desc, $"vec_id").limit(100)
    val wv = Window.partitionBy(pmod($"dot", lit(1))).orderBy($"dot".desc, $"vec_id")
    val vecRank = vecTop.withColumn("rank_vec", row_number().over(wv).cast("long"))
      .select($"vec_id".as("doc_id"), $"rank_vec")
    kwRank.join(vecRank, Seq("doc_id"), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(60.0) + $"rank_kw"), lit(0.0)) +
          coalesce(lit(1.0) / (lit(60.0) + $"rank_vec"), lit(0.0)))
      .orderBy($"rrf".desc, $"doc_id").limit(20)
      .select($"doc_id",
        coalesce($"rank_kw", lit(-1L)).as("rank_kw"),
        coalesce($"rank_vec", lit(-1L)).as("rank_vec"), $"rrf")
  }

  /** §2 entry `hybrid_search_rrf_persisted`: the hybrid entry with its
    * keyword leg SERVED from the persisted posting index (bucket-pruned
    * listing, corpus text never read — the [[textSearchPersisted]]
    * lifecycle; first call per (session, dir) saves) and n_docs from the
    * index's meta ledger; the vector leg reads the embeddings table it
    * always read (the embedding store IS that leg's index). Identical
    * scoring both legs → shares [[hybridSearchRrfSql]]'s oracle.
    */
  def hybridSearchRrfPersisted(spark: SparkSession, dir: String,
      terms: Seq[String] = Seq("data", "model", "training", "quality")): DataFrame = {
    import spark.implicits._
    val indexPath = postingIndexPathFor(spark, dir)
    val tbs = spark.createDataset(terms).toDF("term")
      .select(termBucket($"term").as("tb"))
      .distinct().collect().map(_.getLong(0))
    val postings = spark.read.parquet(s"$indexPath/postings")
      .filter($"tb".isin(tbs: _*))
      .filter($"term".isInCollection(terms))
      .select($"doc_id", $"term", $"tf")
    val nDocs = spark.read.parquet(s"$indexPath/meta")
      .agg(sum($"n_docs").cast("long").as("n_docs"))
    hybridSearchRrfOn(spark, dir, postings, nDocs)
  }

  val hybridSearchRrfSql: String =
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), ' +')) AS term
      |  FROM documents
      |), p AS (
      |  SELECT doc_id, term, COUNT(*) AS tf FROM toks
      |  WHERE term IN ('data', 'model', 'training', 'quality')
      |  GROUP BY doc_id, term
      |), d AS (
      |  SELECT term, COUNT(*) AS df FROM p GROUP BY term
      |), nn AS (
      |  SELECT COUNT(*) AS n_docs FROM documents
      |), kw AS (
      |  SELECT doc_id, SUM(tf * n_docs * 1048576 // df) AS s
      |  FROM p JOIN d USING (term) CROSS JOIN nn GROUP BY doc_id
      |), kwtop AS (
      |  SELECT doc_id, s FROM kw ORDER BY s DESC, doc_id LIMIT 100
      |), kwr AS (
      |  SELECT doc_id,
      |    CAST(row_number() OVER (ORDER BY s DESC, doc_id) AS BIGINT) AS rank_kw
      |  FROM kwtop
      |), q AS (
      |  SELECT vec_id,
      |    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000.0 + 0.5) AS BIGINT)) AS v
      |  FROM embeddings
      |), qv AS (
      |  SELECT v AS qvec FROM q WHERE vec_id = 0
      |), vs AS (
      |  SELECT q.vec_id,
      |    CAST(list_sum(list_transform(range(1, len(q.v) + 1), i -> q.v[i] * qv.qvec[i])) AS BIGINT) AS dot
      |  FROM q CROSS JOIN qv WHERE q.vec_id <> 0
      |), vtop AS (
      |  SELECT vec_id, dot FROM vs ORDER BY dot DESC, vec_id LIMIT 100
      |), vr AS (
      |  SELECT vec_id AS doc_id,
      |    CAST(row_number() OVER (ORDER BY dot DESC, vec_id) AS BIGINT) AS rank_vec
      |  FROM vtop
      |)
      |SELECT doc_id,
      |  coalesce(rank_kw, -1) AS rank_kw,
      |  coalesce(rank_vec, -1) AS rank_vec,
      |  coalesce(CAST(1 AS DOUBLE) / (CAST(60 AS DOUBLE) + rank_kw), CAST(0 AS DOUBLE))
      |    + coalesce(CAST(1 AS DOUBLE) / (CAST(60 AS DOUBLE) + rank_vec), CAST(0 AS DOUBLE)) AS rrf
      |FROM kwr FULL OUTER JOIN vr USING (doc_id)
      |ORDER BY rrf DESC, doc_id LIMIT 20""".stripMargin

  private val savedPostingIndexes =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), String]

  /** Test hook mirroring the other persisted-index families. */
  private[graft] def persistedPostingIndexPath(spark: SparkSession, dir: String): Option[String] =
    savedPostingIndexes.get((spark, dir))

  /** §2 entry `text_search_persisted`: build+save the inverted index once
    * per (session, dir) — the savedIndexes lifecycle — then answer the
    * fixed query from the loaded lists. Shares [[textSearchSql]]'s oracle
    * (same terms, same integer scoring, corpus-equivalent postings).
    */
  def textSearchPersisted(spark: SparkSession, dir: String,
      terms: Seq[String] = Seq("data", "model", "training", "quality")): DataFrame =
    textSearchFromIndex(spark, postingIndexPathFor(spark, dir), terms)

  /** Save-once lifecycle shared by every entry that serves the posting
    * index: first call per (session, dir) builds+saves under a lock,
    * every later call returns the path.
    */
  private[graft] def postingIndexPathFor(spark: SparkSession, dir: String): String =
    savedPostingIndexes.synchronized {
      savedPostingIndexes.getOrElseUpdate((spark, dir), {
        val p = s"${System.getProperty("java.io.tmpdir")}/graft_posting_index_" +
          graft.Tables.dirKey(dir) +
          "_" + ProcessHandle.current().pid() +
          "_" + Integer.toHexString(System.identityHashCode(spark))
        savePostingIndex(spark, dir, p)
        p
      })
    }

  /** The fixed query batch for [[textSearchMulti]]: (query_id, term) rows
    * — queries are DATA, not plan constants, which is the whole point.
    */
  private val multiQueryTerms: Seq[(Long, String)] = Seq(
    1L -> "data", 1L -> "spark",
    2L -> "batch", 2L -> "window",
    3L -> "stream", 3L -> "data")

  /** §2 entry `text_search_multi`: BATCH retrieval — a TABLE of queries
    * ranked in one pass, the production serving shape ([[textSearch]]
    * answers one query with its terms baked into the plan; a retrieval
    * tier answers thousands per batch, and looping the single-query plan
    * would re-scan the postings per query). The query table broadcast-
    * joins the token stream once (the isin filter generalized to a join —
    * matched postings carry their query_id), term df is computed ONCE per
    * term (not per query — shared across queries that reuse a term, as
    * "data" here does), scoring is the same integer arithmetic, and
    * per-query top-5 ranking is a query_id-PARTITIONED window (bounded
    * groups, never global). At 100 TB: one postings pass serves the whole
    * query batch; with the persisted index the join prunes to the batch's
    * term buckets. Oracle hash-exact — df/scores/tie-breaks identical.
    */
  def textSearchMulti(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    val queries = multiQueryTerms.toDF("query_id", "term")
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    // per-(doc, term) tf over only the terms ANY query uses — one pass
    val termSet = multiQueryTerms.map(_._2).distinct
    val postings = docs.select($"doc_id", explode(words($"text")).as("term"))
      .filter($"term".isInCollection(termSet))
      .groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
    val dfT = postings.groupBy($"term").agg(count(lit(1)).as("df"))
    val scored = postings
      .join(broadcast(queries), Seq("term"))
      .join(broadcast(dfT), Seq("term")).crossJoin(broadcast(nDocs))
      .withColumn("w", expr("tf * n_docs * 1048576 div df"))
      .groupBy($"query_id", $"doc_id")
      .agg(count(lit(1)).as("n_terms_hit"),
        sum($"tf").as("total_tf"),
        sum($"w").as("score_scaled"))
    val wq = Window.partitionBy($"query_id").orderBy($"score_scaled".desc, $"doc_id")
    scored.withColumn("rank", row_number().over(wq).cast("long"))
      .filter($"rank" <= 5)
      .select($"query_id", $"rank", $"doc_id", $"n_terms_hit", $"total_tf", $"score_scaled")
      .orderBy($"query_id", $"rank")
  }

  val textSearchMultiSql: String = {
    val values = multiQueryTerms.map { case (q, t) => s"($q, '$t')" }.mkString(", ")
    s"""WITH q(query_id, term) AS (VALUES $values),
       |toks AS (
       |  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), ' +')) AS term
       |  FROM documents
       |), p AS (
       |  SELECT doc_id, term, COUNT(*) AS tf FROM toks
       |  WHERE term IN (SELECT DISTINCT term FROM q)
       |  GROUP BY doc_id, term
       |), d AS (
       |  SELECT term, COUNT(*) AS df FROM p GROUP BY term
       |), nn AS (
       |  SELECT COUNT(*) AS n_docs FROM documents
       |), s AS (
       |  SELECT q.query_id, p.doc_id,
       |    COUNT(*) AS n_terms_hit,
       |    CAST(SUM(tf) AS BIGINT) AS total_tf,
       |    CAST(SUM(tf * n_docs * 1048576 // df) AS BIGINT) AS score_scaled
       |  FROM p JOIN q USING (term) JOIN d USING (term) CROSS JOIN nn
       |  GROUP BY q.query_id, p.doc_id
       |), r AS (
       |  SELECT query_id, doc_id, n_terms_hit, total_tf, score_scaled,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY score_scaled DESC, doc_id) AS BIGINT) AS rank
       |  FROM s
       |)
       |SELECT query_id, rank, doc_id, n_terms_hit, total_tf, score_scaled
       |FROM r WHERE rank <= 5
       |ORDER BY query_id, rank""".stripMargin
  }

  val textSearchSql: String =
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), ' +')) AS term
      |  FROM documents
      |), p AS (
      |  SELECT doc_id, term, COUNT(*) AS tf FROM toks
      |  WHERE term IN ('data', 'model', 'training', 'quality')
      |  GROUP BY doc_id, term
      |), d AS (
      |  SELECT term, COUNT(*) AS df FROM p GROUP BY term
      |), n AS (
      |  SELECT COUNT(*) AS n_docs FROM documents
      |)
      |SELECT doc_id,
      |  COUNT(*) AS n_terms_hit,
      |  CAST(SUM(tf) AS BIGINT) AS total_tf,
      |  CAST(SUM(tf * n_docs * 1048576 // df) AS BIGINT) AS score_scaled
      |FROM p JOIN d USING (term) CROSS JOIN n
      |GROUP BY doc_id
      |ORDER BY score_scaled DESC, doc_id
      |LIMIT 20""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "curation_quality_prune" -> (curationQualityPrune _),
    "quality_classifier"  -> (qualityClassifier _),
    "text_tfidf"          -> (textTfidf _),
    "dedup_exact"         -> (dedupExact _),
    "dedup_exact_keeper"  -> (dedupExactKeeper _),
    "dedup_ngram_jaccard" -> (dedupNgramJaccard _),
    "dedup_incremental"   -> ((s, d) => dedupIncremental(s, d)),
    "dedup_shingle_topk"  -> (dedupShingleTopk _),
    "dedup_embedding"     -> (dedupEmbedding _),
    "ann_topk_exact"      -> (annTopkExact _),
    "ann_topk_agg"        -> (annTopkAgg _),
    "text_langid"         -> (textLangid _),
    "text_script_profile" -> (textScriptProfile _),
    "text_search"         -> ((s, d) => textSearch(s, d)),
    "text_search_persisted" -> ((s, d) => textSearchPersisted(s, d)),
    "hybrid_search_rrf"   -> ((s, d) => hybridSearchRrf(s, d)),
    "hybrid_search_rrf_persisted" -> ((s, d) => hybridSearchRrfPersisted(s, d)),
    "text_search_multi"   -> (textSearchMulti _),
    "text_quality"        -> (textQuality _),
    "text_readability"    -> (textReadability _),
    "curation_filter"     -> (curationFilter _),
    "text_tokens"         -> (textTokens _),
    "text_ttr"            -> (textTtr _),
    "text_fingerprint"    -> (textFingerprint _)
  )

  val oracleSql: Map[String, String] = Map(
    "curation_quality_prune" -> curationQualityPruneSql,
    "quality_classifier"  -> qualityClassifierSql,
    "text_tfidf"          -> textTfidfSql,
    "dedup_exact"         -> dedupExactSql,
    "dedup_exact_keeper"  -> dedupExactKeeperSql,
    "dedup_ngram_jaccard" -> dedupNgramJaccardSql,
    "dedup_incremental"   -> dedupIncrementalSql,
    "dedup_shingle_topk"  -> dedupShingleTopkSql,
    "dedup_embedding"     -> dedupEmbeddingSql,
    "ann_topk_exact"      -> annTopkExactSql,
    // the aggregate form is exact, so it is held to the SAME oracle
    "ann_topk_agg"        -> annTopkExactSql,
    "text_langid"         -> textLangidSql,
    "text_script_profile" -> textScriptProfileSql,
    "text_search"         -> textSearchSql,
    "text_search_persisted" -> textSearchSql,
    "hybrid_search_rrf"   -> hybridSearchRrfSql,
    "hybrid_search_rrf_persisted" -> hybridSearchRrfSql,
    "text_search_multi"   -> textSearchMultiSql,
    "text_quality"        -> textQualitySql,
    "text_readability"    -> textReadabilitySql,
    "curation_filter"     -> curationFilterSql,
    "text_tokens"         -> textTokensSql,
    "text_ttr"            -> textTtrSql,
    "text_fingerprint"    -> textFingerprintSql
  )
}

/** The script → codepoint-range classes shared by the Spark expression and
  * the generated DuckDB oracle SQL (ONE definition, zero drift). Explicit
  * `\x{...}` ranges — the syntax Java regex and RE2 parse identically.
  * Order matters: it is the deterministic dominant-script tie-break.
  */
private[graft] object TextScripts {
  val ranges: Seq[(String, String)] = Seq(
    "latin"    -> "[A-Za-z\\x{00C0}-\\x{024F}]",
    "cyrillic" -> "[\\x{0400}-\\x{04FF}]",
    "greek"    -> "[\\x{0370}-\\x{03FF}]",
    "arabic"   -> "[\\x{0600}-\\x{06FF}]",
    "cjk"      -> "[\\x{4E00}-\\x{9FFF}\\x{3040}-\\x{30FF}\\x{AC00}-\\x{D7AF}]",
    "digit"    -> "[0-9]")
}
