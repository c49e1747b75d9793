package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** RAKE keyphrase extraction (Rose et al., "Automatic Keyword Extraction
  * from Individual Documents") — the multi-word keyphrase miner beside
  * the PMI collocations: PMI finds statistically sticky PAIRS anywhere;
  * RAKE finds content phrases as maximal stopword-free runs and ranks
  * them by their words' degree/frequency profile (words that mostly
  * appear inside long content runs score high).
  *
  * Exactness: the classic per-word score Σ deg(w)/freq(w) is a sum of
  * unrelated rationals (never hash-stable); this implementation uses the
  * POOLED ratio — score(phrase) = Σdeg(w) / Σfreq(w) — which is ONE IEEE
  * division of exact BIGINT sums (the collocation-lift device), ranking
  * preserved in spirit and engine-stable in fact. Degree is the standard
  * RAKE co-occurrence count: each occurrence of w inside a phrase of
  * length L contributes L (self included).
  *
  * Shape: one corpus explode; phrase segmentation is gaps-and-islands
  * (pos − row_number, windowed PER DOCUMENT — bounded partitions);
  * word stats one vocabulary-sized groupBy; phrase scores via a
  * vocab-keyed equi-join back onto the run rows; floors (len ≥ 2,
  * ≥ 3 occurrences) mirrored in both engines before the top-30 cut.
  */
object Rake {

  private val stop = Seq("the", "a", "of", "and", "to")

  def textKeyphrasesRake(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val toks = Tables.documents(spark, dir)
      .select($"doc_id", posexplode(split(lower(trim($"text")), " ")).as(Seq("pos", "w")))
    val wd = Window.partitionBy($"doc_id").orderBy($"pos")
    val ns = toks.filter(!$"w".isin(stop: _*))
      .withColumn("island", $"pos" - row_number().over(wd))
    val lens = ns.groupBy($"doc_id", $"island").agg(count(lit(1)).as("len"))
    val wordStats = ns.join(lens, Seq("doc_id", "island"))
      .groupBy($"w")
      .agg(count(lit(1)).as("freq"), sum($"len").as("deg"))
    val occ = ns.join(wordStats, Seq("w"))
      .groupBy($"doc_id", $"island")
      .agg(
        array_join(transform(array_sort(collect_list(struct($"pos", $"w"))),
          x => x.getField("w")), " ").as("phrase"),
        sum($"deg").as("sd"), sum($"freq").as("sf"), count(lit(1)).as("len"))
    val ph = occ.filter($"len" >= 2)
      .groupBy($"phrase")
      .agg(count(lit(1)).as("n_occurrences"),
        max($"sd").as("sum_deg"), max($"sf").as("sum_freq"))
      .filter($"n_occurrences" >= 3)
      .withColumn("rake_score", $"sum_deg".cast("double") / $"sum_freq".cast("double"))
    ph.orderBy($"rake_score".desc, $"phrase").limit(30)
      .withColumn("rank", row_number().over(
        Window.partitionBy(pmod(length($"phrase"), lit(1)))
          .orderBy($"rake_score".desc, $"phrase")).cast("long"))
      .select($"phrase", $"n_occurrences", $"sum_deg", $"sum_freq", $"rake_score", $"rank")
      .orderBy($"rank")
  }

  val textKeyphrasesRakeSql: String =
    """WITH t AS (
      |  SELECT doc_id, string_split(lower(trim(text)), ' ') AS w FROM documents
      |), toks AS (
      |  SELECT doc_id, u AS pos, w[u] AS w
      |  FROM t, UNNEST(range(1, len(w) + 1)) AS r(u)
      |), ns AS (
      |  SELECT doc_id, pos, w,
      |    pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS island
      |  FROM toks WHERE w NOT IN ('the', 'a', 'of', 'and', 'to')
      |), lens AS (
      |  SELECT doc_id, island, COUNT(*) AS len FROM ns GROUP BY 1, 2
      |), ws AS (
      |  SELECT w, CAST(COUNT(*) AS BIGINT) AS freq, CAST(SUM(len) AS BIGINT) AS deg
      |  FROM ns JOIN lens USING (doc_id, island) GROUP BY w
      |), occ AS (
      |  SELECT ns.doc_id, ns.island,
      |    string_agg(ns.w, ' ' ORDER BY ns.pos) AS phrase,
      |    CAST(SUM(ws.deg) AS BIGINT) AS sd, CAST(SUM(ws.freq) AS BIGINT) AS sf,
      |    COUNT(*) AS len
      |  FROM ns JOIN ws USING (w)
      |  GROUP BY 1, 2
      |), ph AS (
      |  SELECT phrase, CAST(COUNT(*) AS BIGINT) AS n_occurrences,
      |    MAX(sd) AS sum_deg, MAX(sf) AS sum_freq
      |  FROM occ WHERE len >= 2
      |  GROUP BY phrase HAVING COUNT(*) >= 3
      |)
      |SELECT phrase, n_occurrences, sum_deg, sum_freq,
      |  CAST(sum_deg AS DOUBLE) / sum_freq AS rake_score,
      |  row_number() OVER (ORDER BY CAST(sum_deg AS DOUBLE) / sum_freq DESC, phrase) AS rank
      |FROM ph
      |ORDER BY rake_score DESC, phrase
      |LIMIT 30""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_keyphrases_rake" -> (textKeyphrasesRake _)
  )

  val oracleSql: Map[String, String] = Map(
    "text_keyphrases_rake" -> textKeyphrasesRakeSql
  )
}
