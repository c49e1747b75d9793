package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** §2 entry `dq_classifier_agreement` — Cohen's κ between the corpus's
  * two RULE-BASED quality screens: the linear classifier's keep
  * (quality_classifier: margin ≥ 0) and the threshold filter's keep
  * (text_quality: length / word-length / distinct-ratio bounds). The
  * eval-harness number the curation family was missing: raw agreement
  * (p_o) overstates alignment when both screens mostly keep — κ corrects
  * for chance agreement (p_e), the standard inter-rater statistic. Two
  * screens with κ ≈ 0 are redundant-looking but actually independent;
  * κ ≈ 1 means the cheaper one can stand in for the dearer.
  *
  * One corpus pass: both rules are projections over the SAME word
  * statistics (the quality_classifier featurization with n_chars riding
  * along), so the confusion matrix is one map-side CASE + one 5-number
  * aggregate — no join of two screen outputs, no second scan. Both rule
  * expressions mirror their source entries' oracles token for token
  * (spec-pinned label-for-label against the entries themselves, so the
  * inlining cannot drift). All counts exact BIGINTs; p_o, p_e, κ are a
  * few correctly-rounded divides → hash-exact.
  */
object AgreementEval {

  def dqClassifierAgreement(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val stats = LlmQueries.qualityClassifierOn(
      Tables.documents(spark, dir), passthrough = Seq("n_chars"))
    // text_quality's keep rule over the same stats (n_distinct here is
    // textQuality's n_distinct_words)
    val awl = ($"n_chars" - ($"n_words" - 1)).cast("double") / $"n_words".cast("double")
    val dr = $"n_distinct".cast("double") / $"n_words".cast("double")
    val keepB = $"n_words" >= 10 && awl >= 2.0 && awl <= 12.0 && dr >= 0.2
    val conf = stats
      .select(($"label" === "hq").as("ka"), keepB.as("kb"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when($"ka" && $"kb", 1L).otherwise(0L)).as("n_both_keep"),
        sum(when(!$"ka" && !$"kb", 1L).otherwise(0L)).as("n_both_drop"),
        sum(when($"ka" && !$"kb", 1L).otherwise(0L)).as("n_a_only"),
        sum(when(!$"ka" && $"kb", 1L).otherwise(0L)).as("n_b_only"))
    val nD = $"n_docs".cast("double")
    val po = ($"n_both_keep" + $"n_both_drop").cast("double") / nD
    val pa = ($"n_both_keep" + $"n_a_only").cast("double") / nD
    val pb = ($"n_both_keep" + $"n_b_only").cast("double") / nD
    val pe = pa * pb + (lit(1.0) - pa) * (lit(1.0) - pb)
    conf.select($"n_docs", $"n_both_keep", $"n_both_drop", $"n_a_only",
      $"n_b_only", po.as("p_observed"), pe.as("p_expected"),
      when(lit(1.0) - pe === 0.0, lit(null).cast("double"))
        .otherwise((po - pe) / (lit(1.0) - pe)).as("kappa"))
  }

  val dqClassifierAgreementSql: String =
    """WITH t AS (
      |  SELECT doc_id, n_chars, string_split_regex(lower(trim(text)), ' +') AS w
      |  FROM documents
      |), s AS (
      |  SELECT doc_id, n_chars,
      |    CAST(len(w) AS BIGINT) AS n_words,
      |    CAST(len(list_distinct(w)) AS BIGINT) AS n_distinct,
      |    CAST(len(list_filter(w, x -> x = 'the' OR x = 'a' OR x = 'of' OR x = 'and' OR x = 'to')) AS BIGINT) AS n_stopwords
      |  FROM t
      |), lab AS (
      |  SELECT
      |    (10 * (5 * n_distinct + 3 * n_stopwords - 2 * (n_words - n_distinct))
      |      - 25 * n_words) >= 0 AS ka,
      |    (n_words >= 10
      |      AND CAST(n_chars - (n_words - 1) AS DOUBLE) / CAST(n_words AS DOUBLE) >= 2.0
      |      AND CAST(n_chars - (n_words - 1) AS DOUBLE) / CAST(n_words AS DOUBLE) <= 12.0
      |      AND CAST(n_distinct AS DOUBLE) / CAST(n_words AS DOUBLE) >= 0.2) AS kb
      |  FROM s
      |), conf AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
      |    CAST(SUM(CASE WHEN ka AND kb THEN 1 ELSE 0 END) AS BIGINT) AS n_both_keep,
      |    CAST(SUM(CASE WHEN NOT ka AND NOT kb THEN 1 ELSE 0 END) AS BIGINT) AS n_both_drop,
      |    CAST(SUM(CASE WHEN ka AND NOT kb THEN 1 ELSE 0 END) AS BIGINT) AS n_a_only,
      |    CAST(SUM(CASE WHEN NOT ka AND kb THEN 1 ELSE 0 END) AS BIGINT) AS n_b_only
      |  FROM lab
      |), p AS (
      |  SELECT *,
      |    CAST(n_both_keep + n_both_drop AS DOUBLE) / CAST(n_docs AS DOUBLE) AS po,
      |    CAST(n_both_keep + n_a_only AS DOUBLE) / CAST(n_docs AS DOUBLE) AS pa,
      |    CAST(n_both_keep + n_b_only AS DOUBLE) / CAST(n_docs AS DOUBLE) AS pb
      |  FROM conf
      |)
      |SELECT n_docs, n_both_keep, n_both_drop, n_a_only, n_b_only,
      |  po AS p_observed,
      |  pa * pb + (1.0 - pa) * (1.0 - pb) AS p_expected,
      |  CASE WHEN 1.0 - (pa * pb + (1.0 - pa) * (1.0 - pb)) = 0.0 THEN NULL
      |       ELSE (po - (pa * pb + (1.0 - pa) * (1.0 - pb)))
      |            / (1.0 - (pa * pb + (1.0 - pa) * (1.0 - pb))) END AS kappa
      |FROM p""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dq_classifier_agreement" -> (dqClassifierAgreement _))

  val oracleSql: Map[String, String] = Map(
    "dq_classifier_agreement" -> dqClassifierAgreementSql)
}
