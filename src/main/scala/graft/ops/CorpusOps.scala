package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Corpus-level training-data operators: benchmark decontamination,
  * n-gram LM quality scoring, and temperature-based domain mixing.
  *
  * These are the corpus-hygiene passes an LLM pretraining pipeline runs
  * after dedup and before packing (the same surface family as
  * [[LlmQueries]]/[[Curation]]; reference anchor: the cleaning/quarantine
  * stages of scripts/etl/transformer.py re-expressed for document corpora).
  * All three are oracle-hash-exact: pure string/integer arithmetic, plus
  * IEEE-exact sqrt (correctly rounded in both engines) for the mixing
  * thresholds.
  */
object CorpusOps {

  // ------------------------------------------ benchmark decontamination

  private val ngramN = 8
  /** Deterministic "benchmark" slice: doc_id ≡ 0 (mod 37). In production
    * the benchmark set is an external table (MMLU/GSM8K/… test splits);
    * here a fixed residue class plays that role so the oracle sees the
    * same split.
    */
  private val benchResidue = 37

  /** Test-set decontamination (GPT-3 appendix-C style): flag every training
    * document sharing a verbatim 8-gram with the benchmark set.
    *
    * Scale shape: the benchmark n-gram set is tiny relative to the corpus
    * (benchmarks are MBs; the corpus is TBs) → it is the BROADCAST side of
    * the membership probe, so the training side never shuffles for the
    * join. The per-doc rollup groups on doc_id right after a map-side
    * explode, so partial aggregation collapses each doc's grams to one row
    * before the only shuffle. At 100 TB this is one pass over the corpus +
    * a broadcast of the benchmark grams — the same shape as the Bloom
    * pre-filter in the streaming upsert sink (a Bloom over bench grams is
    * the drop-in refinement when even the exact gram set outgrows a
    * broadcast).
    */
  def decontaminateNgram(spark: SparkSession, dir: String): DataFrame =
    decontaminateNgramOn(Tables.documents(spark, dir))

  private[graft] def decontaminateNgramOn(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    import graft.functions.WordNgrams.word_ngrams
    // one codegen pass over the bytes; docs under n tokens yield an empty
    // array that explode drops — same row set as the old size(w) filter
    val grams = docs
      .select($"doc_id", explode(word_ngrams(lower(trim($"text")), ngramN)).as("ng"))
    val bench = grams.filter($"doc_id" % benchResidue === 0)
      .select($"ng").distinct()
      .withColumn("hit", lit(1L))
    grams.filter($"doc_id" % benchResidue =!= 0)
      .join(broadcast(bench), Seq("ng"), "left")
      .groupBy($"doc_id")
      .agg(
        count(lit(1)).as("n_ngrams"),
        sum(coalesce($"hit", lit(0L))).as("n_hits"),
        countDistinct(when($"hit".isNotNull, $"ng")).as("n_distinct_hits"))
      .withColumn("verdict", when($"n_hits" > 0, "drop_contaminated").otherwise("keep"))
      .orderBy($"doc_id")
  }

  val decontaminateNgramSql: String =
    s"""WITH t AS (
       |  SELECT doc_id, string_split_regex(lower(trim(text)), ' +') AS w FROM documents
       |), g AS (
       |  SELECT doc_id,
       |    array_to_string(list_slice(w, u, u + ${ngramN - 1}), ' ') AS ng
       |  FROM t, UNNEST(range(1, len(w) - ${ngramN - 1} + 1)) AS r(u)
       |  WHERE len(w) >= $ngramN
       |), bench AS (
       |  SELECT DISTINCT ng FROM g WHERE doc_id % $benchResidue = 0
       |)
       |SELECT g.doc_id, CAST(COUNT(*) AS BIGINT) AS n_ngrams,
       |  CAST(SUM(CASE WHEN b.ng IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
       |  CAST(COUNT(DISTINCT CASE WHEN b.ng IS NOT NULL THEN g.ng END) AS BIGINT) AS n_distinct_hits,
       |  CASE WHEN SUM(CASE WHEN b.ng IS NOT NULL THEN 1 ELSE 0 END) > 0
       |       THEN 'drop_contaminated' ELSE 'keep' END AS verdict
       |FROM g LEFT JOIN bench b ON g.ng = b.ng
       |WHERE g.doc_id % $benchResidue <> 0
       |GROUP BY g.doc_id
       |ORDER BY g.doc_id""".stripMargin

  // ------------------------------------------- n-gram LM quality scoring

  /** n-gram LM quality scoring, integer-exact: the KenLM-filter analog
    * with corpus bigram frequency standing in for log-probability (both
    * rank "how typical is this text of the corpus"; frequency needs no
    * transcendentals, so the score is oracle-hash-exact).
    *
    * Per doc: bigram count, total/min corpus frequency, count of
    * corpus-unique bigrams (frequency 1 — the doc's "OOV mass"), average
    * frequency, and a verdict flagging docs carrying any corpus-unique
    * bigram.
    *
    * Scale shape: bigram extraction is the codegen'd
    * [[graft.functions.AdjacentBigrams]] (one pass over UTF-8 bytes);
    * corpus counts are a partial-agg-friendly groupBy (shuffle carries
    * distinct bigrams only); the score join is a shuffle equi-join on
    * bigram — both sides partition on the same key, and AQE handles the
    * skew of stop-word bigrams. Per-doc rollup again collapses map-side.
    * The LM "model" (bigram→freq) is exactly the persisted count table a
    * production filter would train once and reuse.
    */
  def textLmQuality(spark: SparkSession, dir: String): DataFrame =
    textLmQualityOn(Tables.documents(spark, dir))

  private[graft] def textLmQualityOn(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    val bi = docs.select($"doc_id",
      explode(graft.functions.AdjacentBigrams.adjacent_bigrams(lower(trim($"text")))).as("bigram"))
    val counts = bi.groupBy($"bigram").agg(count(lit(1)).as("freq"))
    bi.join(counts, Seq("bigram"))
      .groupBy($"doc_id")
      .agg(
        count(lit(1)).as("n_bigrams"),
        sum($"freq").as("sum_freq"),
        min($"freq").as("min_freq"),
        sum(when($"freq" === 1, 1L).otherwise(0L)).as("oov_bigrams"))
      .withColumn("avg_freq", $"sum_freq".cast("double") / $"n_bigrams")
      .withColumn("verdict", when($"oov_bigrams" > 0, "flag_rare").otherwise("keep"))
      .orderBy($"doc_id")
  }

  val textLmQualitySql: String =
    """WITH t AS (
      |  SELECT doc_id, string_split_regex(lower(trim(text)), ' +') AS w FROM documents
      |), bi AS (
      |  SELECT doc_id, w[u] || ' ' || w[u+1] AS bigram
      |  FROM t, UNNEST(range(1, len(w))) AS r(u)
      |), c AS (
      |  SELECT bigram, COUNT(*) AS freq FROM bi GROUP BY bigram
      |)
      |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
      |  CAST(SUM(freq) AS BIGINT) AS sum_freq,
      |  CAST(MIN(freq) AS BIGINT) AS min_freq,
      |  CAST(SUM(CASE WHEN freq = 1 THEN 1 ELSE 0 END) AS BIGINT) AS oov_bigrams,
      |  CAST(CAST(SUM(freq) AS BIGINT) AS DOUBLE) / COUNT(*) AS avg_freq,
      |  CASE WHEN SUM(CASE WHEN freq = 1 THEN 1 ELSE 0 END) > 0
      |       THEN 'flag_rare' ELSE 'keep' END AS verdict
      |FROM bi JOIN c USING (bigram)
      |GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin

  // --------------------------------------------- temperature domain mix

  /** Temperature-based domain mixing (the multilingual-pretraining
    * resampling rule, α = 0.5): target sampling weight per source ∝
    * sqrt(n_source), realized as keep-probability sqrt(n_min / n_source) —
    * the smallest source keeps everything, larger sources are flattened
    * toward it. Selection is the same deterministic Knuth multiplicative
    * hash as [[Curation.sampleStratified]] (reproducible, no RNG):
    * keep ⇔ bucket(doc_id) < floor(10⁶·sqrt(n_min/n_source) + 0.5).
    *
    * Oracle-exactness: sqrt is correctly rounded in IEEE 754 (identical
    * bits in both engines on the identical double n_min/n_source), and the
    * floor(x + 0.5) quantization is the repo-wide portable-rounding rule.
    *
    * Scale shape: source counts are a partial-agg groupBy over a
    * low-cardinality key; thresholds (one row per source) broadcast back;
    * the keep decision is map-side per row. One corpus pass, one
    * bounded-size broadcast — the production shape for trillion-token
    * mixture rebalancing. (Production ids exceeding 2³¹ would switch the
    * bucket hash to xxhash64 to avoid 64-bit overflow; the Knuth form is
    * kept engine-portable here, as in sample_stratified.)
    */
  def sampleDomainMix(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir).select($"doc_id", $"source", $"n_chars")
    docs
      .withColumn("bucket", domainMixBucket(docs("doc_id")))
      .join(broadcast(domainMixThresholds(docs)), Seq("source"))
      .groupBy($"source", $"n_docs", $"threshold")
      .agg(
        sum(when($"bucket" < $"threshold", 1L).otherwise(0L)).as("n_sampled"),
        sum(when($"bucket" < $"threshold", $"n_chars").otherwise(0L)).as("sampled_chars"))
      .orderBy($"source")
  }

  /** The per-source (source, n_docs, threshold) table from the STATIC
    * corpus's source counts — one bounded groupBy, broadcastable.
    * Shared by the batch rollup above and the stream-static screen
    * [[graft.streaming.CorpusStream.sampleDomainMixStream]], so the two
    * cannot diverge on the keep rule.
    */
  private[graft] def domainMixThresholds(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    val counts = docs.groupBy($"source").agg(count(lit(1)).as("n_docs"))
    val nmin = counts.agg(min($"n_docs").as("n_min"))
    counts.crossJoin(broadcast(nmin))
      .withColumn("threshold",
        floor(lit(1000000.0) * sqrt($"n_min".cast("double") / $"n_docs") + lit(0.5)))
      .select($"source", $"n_docs", $"threshold")
  }

  /** The deterministic Knuth-hash selection bucket (shared batch/stream). */
  private[graft] def domainMixBucket(docId: Column): Column =
    pmod(docId * 2654435761L % 1000000007L, lit(1000000))

  val sampleDomainMixSql: String =
    """WITH c AS (
      |  SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source
      |), m AS (
      |  SELECT MIN(n_docs) AS n_min FROM c
      |), thr AS (
      |  SELECT source, n_docs,
      |    CAST(FLOOR(1000000.0 * SQRT(CAST(n_min AS DOUBLE) / n_docs) + 0.5) AS BIGINT) AS threshold
      |  FROM c, m
      |), b AS (
      |  SELECT source, n_chars,
      |    ((doc_id * 2654435761) % 1000000007 % 1000000 + 1000000) % 1000000 AS bucket
      |  FROM documents
      |)
      |SELECT t.source, CAST(t.n_docs AS BIGINT) AS n_docs, t.threshold,
      |  CAST(SUM(CASE WHEN b.bucket < t.threshold THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
      |  CAST(SUM(CASE WHEN b.bucket < t.threshold THEN b.n_chars ELSE 0 END) AS BIGINT) AS sampled_chars
      |FROM b JOIN thr t ON b.source = t.source
      |GROUP BY t.source, t.n_docs, t.threshold
      |ORDER BY t.source""".stripMargin

  // ------------------------------------------ exact substring-span dedup

  private val spanN = 15

  /** Exact duplicated-substring detection (the Lee-et-al. "Deduplicating
    * Training Data" repeated-span operator): every token position covered
    * by a 15-gram that occurs more than once in the corpus (across docs OR
    * within one) is duplicated text; per doc we report the interval-union
    * coverage of those spans and flag docs that are mostly duplication.
    *
    * The interval union is gaps-and-islands arithmetic: spans sorted by
    * start position, a new island opens where a span starts past the
    * running max end, and coverage sums (max_end − min_start + 1) per
    * island — all in windows PARTITIONED BY doc_id (never global, bounded
    * by doc length).
    *
    * Scale shape: gram extraction is map-side; the frequency table is
    * corpus-sized (unlike decontamination's benchmark set) so the
    * count-join is a shuffle equi-join on the gram — both sides partition
    * on the same key, AQE splits hot boilerplate grams; per-doc windows
    * and rollups shuffle once on doc_id. The production form persists the
    * gram-count table and trims [min_start, max_end] ranges instead of
    * flagging — same plan, different final projection.
    */
  def dedupSubstringSpans(spark: SparkSession, dir: String): DataFrame =
    dedupSubstringSpansOn(Tables.documents(spark, dir))

  /** The 100 TB form of [[dedupSubstringSpans]]: grams are fingerprinted
    * to xxhash64 BEFORE the frequency groupBy and count-join, so the two
    * corpus-sized shuffles carry 8-byte longs instead of ~100-byte
    * 15-gram strings (>10× less shuffle volume on real text). The trade
    * is a 2⁻⁶⁴ per-pair collision probability — a colliding pair would
    * mark a unique span as duplicated (one-sided error, toward
    * over-trimming), the standard trade hash-based substring dedup makes
    * at scale. Rows-only; OpsSpec pins output parity with the exact twin
    * on the test corpus (where collisions are impossible in practice).
    */
  def dedupSubstringSpansHashed(spark: SparkSession, dir: String): DataFrame =
    dedupSubstringSpansOn(Tables.documents(spark, dir), hashGrams = true)

  private[graft] def dedupSubstringSpansOn(docsRaw: DataFrame, hashGrams: Boolean = false): DataFrame = {
    import docsRaw.sparkSession.implicits._
    import org.apache.spark.sql.expressions.Window
    import graft.functions.WordNgrams.word_ngrams
    // gram extraction is one codegen byte pass; n_tokens/n_spans recover
    // from the gram count (n_tokens = grams + spanN − 1), and posexplode's
    // 0-based index is the old 1-based start position − 1
    val docs = docsRaw
      .select($"doc_id", word_ngrams(lower(trim($"text")), spanN).as("gs"))
      .filter(size($"gs") >= 1)
      .select($"doc_id",
        (size($"gs") + lit(spanN - 1)).cast("long").as("n_tokens"),
        size($"gs").cast("long").as("n_spans"), $"gs")
    val gramsRaw = docs
      .select($"doc_id", $"n_tokens", posexplode($"gs").as(Seq("pos0", "ng")))
      .select($"doc_id", $"n_tokens", ($"pos0" + 1).cast("long").as("pos"), $"ng")
    // the hashed form drops the gram text before anything shuffles
    val grams = if (hashGrams) gramsRaw.withColumn("ng", xxhash64($"ng")) else gramsRaw
    val counts = grams.groupBy($"ng").agg(count(lit(1)).as("cnt"))
    val dup = grams.join(counts, Seq("ng")).filter($"cnt" > 1)

    val byPos = Window.partitionBy($"doc_id").orderBy($"pos")
    val prevEnd = max($"pos" + lit(spanN - 1))
      .over(byPos.rowsBetween(Window.unboundedPreceding, -1))
    val islands = dup
      .withColumn("new_island",
        when($"pos" > coalesce(prevEnd, lit(-1L)), 1L).otherwise(0L))
      .withColumn("island",
        sum($"new_island").over(byPos.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy($"doc_id", $"island")
      .agg((max($"pos") + lit(spanN - 1) - min($"pos") + lit(1)).as("cov"),
        count(lit(1)).as("n_span"))
      .groupBy($"doc_id")
      .agg(sum($"cov").as("dup_coverage"), sum($"n_span").as("n_dup_spans"))

    docs.select($"doc_id", $"n_tokens", $"n_spans")
      .join(islands, Seq("doc_id"), "left")
      .select($"doc_id", $"n_tokens", $"n_spans",
        coalesce($"n_dup_spans", lit(0L)).as("n_dup_spans"),
        coalesce($"dup_coverage", lit(0L)).as("dup_coverage"))
      .withColumn("verdict",
        when($"dup_coverage" * 5 > $"n_tokens", "trim").otherwise("keep"))
      .orderBy($"doc_id")
  }

  val dedupSubstringSpansSql: String =
    s"""WITH t AS (
       |  SELECT doc_id, string_split_regex(lower(trim(text)), ' +') AS w FROM documents
       |), d AS (
       |  SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens, w FROM t WHERE len(w) >= $spanN
       |), g AS (
       |  SELECT doc_id, n_tokens, CAST(u AS BIGINT) AS pos,
       |    array_to_string(list_slice(w, u, u + ${spanN - 1}), ' ') AS ng
       |  FROM d, UNNEST(range(1, len(w) - ${spanN - 1} + 1)) AS r(u)
       |), c AS (
       |  SELECT ng, COUNT(*) AS cnt FROM g GROUP BY ng
       |), dup AS (
       |  SELECT g.* FROM g JOIN c USING (ng) WHERE c.cnt > 1
       |), isl AS (
       |  SELECT doc_id, pos,
       |    CASE WHEN pos > COALESCE(max(pos + ${spanN - 1}) OVER (
       |        PARTITION BY doc_id ORDER BY pos
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
       |      THEN 1 ELSE 0 END AS new_island
       |  FROM dup
       |), isl2 AS (
       |  SELECT doc_id, pos,
       |    SUM(new_island) OVER (PARTITION BY doc_id ORDER BY pos
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
       |  FROM isl
       |), cov AS (
       |  SELECT doc_id, island,
       |    MAX(pos) + ${spanN - 1} - MIN(pos) + 1 AS cov, COUNT(*) AS n_span
       |  FROM isl2 GROUP BY doc_id, island
       |), per_doc AS (
       |  SELECT doc_id, CAST(SUM(cov) AS BIGINT) AS dup_coverage,
       |    CAST(SUM(n_span) AS BIGINT) AS n_dup_spans
       |  FROM cov GROUP BY doc_id
       |)
       |SELECT d.doc_id, d.n_tokens,
       |  CAST(len(d.w) - ${spanN - 1} AS BIGINT) AS n_spans,
       |  COALESCE(p.n_dup_spans, 0) AS n_dup_spans,
       |  COALESCE(p.dup_coverage, 0) AS dup_coverage,
       |  CASE WHEN COALESCE(p.dup_coverage, 0) * 5 > d.n_tokens
       |       THEN 'trim' ELSE 'keep' END AS verdict
       |FROM d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
       |ORDER BY d.doc_id""".stripMargin

  /** PII redaction — the corpus-hygiene step every published training set
    * runs before release: emails, IPv4 addresses, and phone-shaped digit
    * runs are replaced with typed placeholders, and per-doc match counts
    * are kept for audit. Purely map-side (regexp over each row — zero
    * shuffles beyond the output ordering), which is the whole scale story:
    * at 100 TB this is a single pass bounded by regex throughput.
    *
    * The patterns are deliberately engine-portable (same semantics in
    * Java regex and RE2): character classes, bounded repetition, \b —
    * no lookaround, no backrefs. Order matters and is fixed:
    * emails first (they contain dots and digits), then IPs (dotted digit
    * runs), then phones (leftover digit runs).
    *
    * The synthetic corpus contains no digits at all — the DuckDB oracle
    * therefore proves the negative side cross-engine (both engines agree
    * the regexes match nothing on all 500 real texts, hash-exact on the
    * full scrubbed text); the positive side is pinned by OpsSpec on an
    * injected-PII corpus through the same [[textPiiScrubOn]] core — the
    * dedupExactOn pattern.
    */
  def textPiiScrub(spark: SparkSession, dir: String): DataFrame =
    textPiiScrubOn(Tables.documents(spark, dir))

  private val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val ipRe    = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
  private val phoneRe = "\\+?[0-9][0-9() -]{6,}[0-9]"

  /** Sort-free scrub core — shared verbatim with the streaming screen
    * ([[graft.streaming.CorpusStream.piiScrubStream]]), so a doc is
    * scrubbed identically in a backfill and on the stream.
    *
    * Each count runs over the text AS THE PREVIOUS STAGE LEFT IT —
    * emails on the raw text, IPs after emails were replaced, phones after
    * IPs were replaced — so n_* is exactly the number of placeholders of
    * that type in `scrubbed`. Counting everything on the raw text would
    * double-count overlaps (a digit run of 8+ inside
    * user12345678@x.co is an email AND phone-shaped; only <EMAIL> is
    * emitted). The placeholders themselves contain no digits, so a later
    * pattern can never match inside an earlier replacement.
    */
  private[graft] def textPiiScrubCore(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs
      .withColumn("after_email", regexp_replace($"text", emailRe, "<EMAIL>"))
      .withColumn("after_ip", regexp_replace($"after_email", ipRe, "<IP>"))
      .select($"doc_id",
        size(regexp_extract_all($"text", lit(emailRe), lit(0))).cast("long").as("n_emails"),
        size(regexp_extract_all($"after_email", lit(ipRe), lit(0))).cast("long").as("n_ips"),
        size(regexp_extract_all($"after_ip", lit(phoneRe), lit(0))).cast("long").as("n_phones"),
        regexp_replace($"after_ip", phoneRe, "<PHONE>").as("scrubbed"))
  }

  private[graft] def textPiiScrubOn(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    textPiiScrubCore(docs).orderBy($"doc_id")
  }

  val textPiiScrubSql: String =
    """WITH staged AS (
      |  SELECT doc_id, text,
      |    regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS after_email
      |  FROM documents
      |), staged2 AS (
      |  SELECT doc_id, text, after_email,
      |    regexp_replace(after_email, '\b([0-9]{1,3}\.){3}[0-9]{1,3}\b', '<IP>', 'g') AS after_ip
      |  FROM staged
      |)
      |SELECT doc_id,
      |  len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
      |  len(regexp_extract_all(after_email, '\b([0-9]{1,3}\.){3}[0-9]{1,3}\b')) AS n_ips,
      |  len(regexp_extract_all(after_ip, '\+?[0-9][0-9() -]{6,}[0-9]')) AS n_phones,
      |  regexp_replace(after_ip, '\+?[0-9][0-9() -]{6,}[0-9]', '<PHONE>', 'g') AS scrubbed
      |FROM staged2
      |ORDER BY doc_id""".stripMargin

  // --------------------------------------------- fuzzy decontamination

  /** Near-duplicate test-set decontamination — the fuzzy companion to
    * [[decontaminateNgram]]: verbatim-8-gram screens miss benchmark items
    * that reached the training set lightly paraphrased or reformatted,
    * so production decontamination (GPT-3 appendix C's fuzzy pass, and
    * its descendants) ALSO flags training docs whose token-set Jaccard
    * against any benchmark item clears a looser bar (0.8 here vs the
    * dedup pipeline's 0.9).
    *
    * Same machinery as the dedup lifecycle, pointed across corpora:
    * both sides run through the fused MinHash banding
    * ([[ScaleDedup.bandRows]]), candidates meet in a (band, band_key)
    * equi-join — candidate work is bucket occupancy, benchmark side is
    * tiny — and every candidate is verified with the EXACT integer
    * Jaccard test (inter·10 ≥ union·8) before anything is flagged.
    * Output is the verified audit log (train doc × benchmark item with
    * exact overlap counts), the decontaminate_ngram contract. Rows-only
    * (banding is probabilistic below ~0.9 similarity); OpsSpec pins
    * precision exactly (every emitted pair's Jaccard re-derived
    * driver-side) and recall 1 on identical word sets, plus a planted
    * paraphrase through the shared core.
    */
  def decontaminateFuzzy(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir).select($"doc_id", $"text")
    decontaminateFuzzyOn(
      docs.filter($"doc_id" % 37 =!= 0),
      docs.filter($"doc_id" % 37 === 0))
  }

  private[graft] def decontaminateFuzzyOn(train: DataFrame, bench: DataFrame): DataFrame = {
    import train.sparkSession.implicits._
    val tw = train.select($"doc_id", ScaleDedup.wordSet($"text").as("tset"))
      .withColumn("tsz", size($"tset"))
      .localCheckpoint() // feeds the band-carry join AND the verify join
    val bw = bench.select($"doc_id".as("bench_id"), ScaleDedup.wordSet($"text").as("bset"))
      .withColumn("bsz", size($"bset"))
      .localCheckpoint()
    // r16 (guide §2.3, the r15 minhash-core pattern): carry each side's
    // distinct-word-set size onto its band rows (one ids-grain join
    // each), so the LOSSLESS size-ratio prune runs INSIDE the candidate
    // join, before the pair-keyed distinct exchange and the verify
    // joins. Losslessness at τ = 0.8: |A∩B| ≤ min(|A|,|B|) and
    // |A∪B| ≥ max(|A|,|B|), so J ≥ 0.8 requires 10·min ≥ 8·max — a
    // necessary condition on two ints, checkable join-local. The lang
    // prune of the dedup family does NOT apply here (this entry's
    // verify is Jaccard-only — cross-language contamination must flag).
    val tb = ScaleDedup.bandRows(train)
      .join(tw.select($"doc_id", $"tsz"), Seq("doc_id"))
    val bb = ScaleDedup.bandRows(bench)
      .select($"doc_id".as("bench_id"), $"band", $"band_key")
      .join(bw.select($"bench_id", $"bsz"), Seq("bench_id"))
    val cands = tb.join(bb, Seq("band", "band_key"))
      .filter(least($"tsz", $"bsz") * 10 >= greatest($"tsz", $"bsz") * 8)
      .select($"doc_id", $"bench_id").distinct()
    cands.join(tw, Seq("doc_id")).join(bw, Seq("bench_id"))
      // fused two-pointer |A∩B| over the sorted distinct word sets plus
      // the distinct-set union identity — same integers as the
      // array_intersect build, none of the allocations (the r15
      // SortedIntersectCount device; both inputs are wordSet output)
      .withColumn("inter",
        graft.functions.SortedIntersectCount.sorted_intersect_count(
          $"tset", $"bset").cast("long"))
      .withColumn("uni", ($"tsz" + $"bsz").cast("long") - $"inter")
      // exact integer test — no float compare on the 0.8 boundary
      .filter($"inter" * 10 >= $"uni" * 8)
      .withColumn("jaccard", $"inter".cast("double") / $"uni".cast("double"))
      .select($"doc_id", $"bench_id", $"inter", $"uni", $"jaccard")
      .orderBy($"doc_id", $"bench_id")
  }

  // --------------------------------------------- bigram-LM perplexity

  /** True perplexity filtering (the CCNet/KenLM-style quality screen):
    * a bigram LM with add-½ smoothing is trained on the corpus itself —
    * P(w₂|w₁) = (c(w₁w₂) + ½) / (c(w₁) + ½·V) — and every document is
    * scored by the mean negative log-probability of its bigrams;
    * ppl = exp(−mean log P). High perplexity = text the corpus LM finds
    * surprising (gibberish, boilerplate soup, wrong-language) — the
    * CCNet head/middle/tail criterion with the corpus as its own LM.
    *
    * [[textLmQuality]] is the integer-exact oracle-gated twin (raw
    * frequency stand-in); this entry reports the real transcendental
    * scores, so it is rows-only by design (log/exp are not
    * bit-reproducible across engines and float sums are order-sensitive
    * across partitionings) and OpsSpec pins it against a driver-side
    * reference implementation of the same formula to 1e-9 relative.
    *
    * Scale shape: bigram extraction map-side (adjacent zip, no UDF);
    * counts are partial-agg groupBys shuffling distinct bigrams/words
    * only; scoring joins the bigram stream to the two count tables on
    * their own keys (AQE splits stop-word skew); V is a 1-row broadcast;
    * per-doc rollup collapses map-side. The count tables ARE the LM —
    * production persists them once and scores every shard against them.
    */
  def textPerplexity(spark: SparkSession, dir: String): DataFrame =
    textPerplexityOn(Tables.documents(spark, dir))

  private[graft] def textPerplexityOn(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    val toks = docs.select($"doc_id", split(lower(trim($"text")), "\\s+").as("w"))
    val bi = toks
      .select($"doc_id", explode(when(size($"w") >= 2,
          expr("transform(sequence(0, size(w) - 2), i -> struct(w[i] AS w1, w[i + 1] AS w2))"))
        .otherwise(array())).as("b"))
      .select($"doc_id", $"b.w1", $"b.w2")
    val uniCounts = toks.select(explode($"w").as("w1"))
      .groupBy($"w1").agg(count(lit(1)).as("c1"))
    val biCounts = bi.groupBy($"w1", $"w2").agg(count(lit(1)).as("c12"))
    val vocab = uniCounts.agg(count(lit(1)).as("v"))
    val scored = bi
      .join(biCounts, Seq("w1", "w2"))
      .join(uniCounts, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .withColumn("logp",
        log(($"c12" + lit(0.5)) / ($"c1" + lit(0.5) * $"v")))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum($"logp").as("sum_logp"))
      .withColumn("avg_logp", $"sum_logp" / $"n_bigrams")
      .withColumn("ppl", exp(-$"avg_logp"))
    docs.select($"doc_id")
      .join(scored, Seq("doc_id"), "left")
      .select($"doc_id",
        coalesce($"n_bigrams", lit(0L)).as("n_bigrams"),
        $"avg_logp", $"ppl",
        when($"ppl".isNull, "too_short")
          .when($"ppl" > 32.0, "flag_high_ppl")
          .otherwise("keep").as("verdict"))
      .orderBy($"doc_id")
  }

  /** Corpus text normalization — the pass that runs BEFORE any hashing /
    * dedup / tokenization so byte-different spellings of the same visible
    * string (decomposed accents, stray control chars, whitespace runs)
    * can't split what should collapse: Unicode NFC (the native
    * [[graft.functions.NfcNormalize]] expression, ASCII fast path), C0/DEL
    * control-character strip, whitespace-run collapse, trim. Entirely
    * map-side — no shuffle before the output sort. Oracle hash-exact:
    * DuckDB's `nfc_normalize` implements the same Unicode algorithm and
    * the regex classes are engine-portable (the textPiiScrub discipline).
    */
  def textNormalize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    textNormalizeOn(Tables.documents(spark, dir)).orderBy($"doc_id")
  }

  /** The normalization core, shared with the streaming screen
    * ([[graft.streaming.CorpusStream.normalizeStream]]) — sort-free so it
    * works on unbounded frames; the batch entry adds the oracle ORDER BY.
    */
  private[graft] def textNormalizeOn(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    import graft.functions.NfcNormalize.nfc_normalize
    docs
      .withColumn("nfc", nfc_normalize($"text"))
      .withColumn("norm_text",
        trim(regexp_replace(
          regexp_replace($"nfc", "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]", ""),
          "\\s+", " ")))
      .select($"doc_id", $"norm_text",
        when($"norm_text" === $"text", 0L).otherwise(1L).as("changed"),
        length($"text").as("n_chars_before"),
        length($"norm_text").as("n_chars_after"))
  }

  val textNormalizeSql: String =
    """WITH n AS (
      |  SELECT doc_id, text,
      |    trim(regexp_replace(regexp_replace(nfc_normalize(text),
      |      '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', '', 'g'), '\s+', ' ', 'g')) AS norm_text
      |  FROM documents
      |)
      |SELECT doc_id, norm_text,
      |  CAST(CASE WHEN norm_text = text THEN 0 ELSE 1 END AS BIGINT) AS changed,
      |  CAST(length(text) AS BIGINT) AS n_chars_before,
      |  CAST(length(norm_text) AS BIGINT) AS n_chars_after
      |FROM n
      |ORDER BY doc_id""".stripMargin

  /** §2 `text_novelty`: per-document MARGINAL NOVELTY — the fraction of
    * a doc's 3-gram shingles first seen in IT (first-seen = minimum
    * doc_id over the corpus's landing order), the redundancy-growth
    * curve a crawl pipeline watches to decide when more of a source
    * stops adding information (dedup asks "is this a copy of ONE other
    * doc"; novelty asks "how much of this doc is new against EVERYTHING
    * landed before it" — a doc can be 0.2-novel without any single
    * near-duplicate). Occurrence-weighted: each gram occurrence counts,
    * novel iff its gram's first-seen doc is this doc — so a doc that
    * repeats its own novel gram still scores it, matching token-level
    * training value. One gram→min(doc) aggregate (map-side combine,
    * vocab-bounded shuffle) + one gram-keyed join back (the tf-idf
    * shape) + one per-doc aggregate; ratio is ONE IEEE divide.
    */
  def textNovelty(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.functions.WordNgrams.word_ngrams
    val grams = Tables.documents(spark, dir)
      .select($"doc_id", explode(word_ngrams(lower(trim($"text")), 3)).as("ng"))
    val firstSeen = grams.groupBy($"ng").agg(min($"doc_id").as("first_doc"))
    grams.join(firstSeen, Seq("ng"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when($"first_doc" === $"doc_id", 1L).otherwise(0L)).as("n_novel"))
      .withColumn("novelty", $"n_novel".cast("double") / $"n_grams".cast("double"))
      .select($"doc_id", $"n_grams", $"n_novel", $"novelty")
      .orderBy($"doc_id")
  }

  val textNoveltySql: String =
    """WITH t AS (
      |  SELECT doc_id, string_split_regex(lower(trim(text)), ' +') AS w FROM documents
      |), g AS (
      |  SELECT doc_id, array_to_string(list_slice(w, u, u + 2), ' ') AS ng
      |  FROM t, UNNEST(range(1, len(w) - 2 + 1)) AS r(u)
      |  WHERE len(w) >= 3
      |), fs AS (
      |  SELECT ng, MIN(doc_id) AS first_doc FROM g GROUP BY ng
      |)
      |SELECT g.doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
      |  CAST(SUM(CASE WHEN fs.first_doc = g.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
      |  CAST(SUM(CASE WHEN fs.first_doc = g.doc_id THEN 1 ELSE 0 END) AS DOUBLE)
      |    / CAST(COUNT(*) AS DOUBLE) AS novelty
      |FROM g JOIN fs ON g.ng = fs.ng
      |GROUP BY g.doc_id
      |ORDER BY g.doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_novelty"          -> (textNovelty _),
    "text_normalize"        -> (textNormalize _),
    "text_pii_scrub"        -> (textPiiScrub _),
    "decontaminate_ngram"   -> (decontaminateNgram _),
    "decontaminate_fuzzy"   -> (decontaminateFuzzy _),
    "text_lm_quality"       -> (textLmQuality _),
    "text_perplexity"       -> (textPerplexity _),
    "sample_domain_mix"     -> (sampleDomainMix _),
    "dedup_substring_spans" -> (dedupSubstringSpans _),
    "dedup_substring_spans_hashed" -> (dedupSubstringSpansHashed _)
  )

  val oracleSql: Map[String, String] = Map(
    "text_novelty"          -> textNoveltySql,
    "text_normalize"        -> textNormalizeSql,
    "text_pii_scrub"        -> textPiiScrubSql,
    "decontaminate_ngram"   -> decontaminateNgramSql,
    "text_lm_quality"       -> textLmQualitySql,
    "sample_domain_mix"     -> sampleDomainMixSql,
    "dedup_substring_spans" -> dedupSubstringSpansSql
  )
}
