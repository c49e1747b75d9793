package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Collocation extraction by pointwise mutual information — the
  * phrase-mining step a corpus pipeline runs before tokenizer training
  * (multi-word expressions worth single tokens) and beside tf-idf
  * (tf-idf finds distinctive UNIGRAMS; PMI finds sticky PAIRS).
  *
  * Exactness: PMI's log is monotone, so ranking needs only the LIFT
  * ratio c_xy·N / (c_x·c_y) — numerator and denominator are exact
  * BIGINT products (far under 2^53), the lift is ONE IEEE division, and
  * the rank ORDER BY is therefore engine-stable and the whole output
  * hash-checkable: the log would be libm-dependent, the ratio is not
  * (the events_markov_transitions discipline applied to collocations).
  *
  * Shape: two explode→partial-agg passes over the corpus (bigrams via
  * the fused [[graft.functions.AdjacentBigrams]] expression, unigrams
  * via one split), the tiny unigram side broadcast back onto the
  * bigram table twice (first/second word), token total as a broadcast
  * 1-row cross. Min-count floor of 5 before ranking (the standard
  * collocation noise gate — hapax pairs have unreliable lift).
  */
object Collocations {

  def textCollocationPmi(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    val bigrams = docs
      .select(explode(
        graft.functions.AdjacentBigrams.adjacent_bigrams(lower(trim($"text")))).as("bigram"))
      .groupBy($"bigram").agg(count(lit(1)).as("c_xy"))
      .withColumn("w1", substring_index($"bigram", " ", 1))
      .withColumn("w2", substring_index($"bigram", " ", -1))
    val unigrams = docs
      .select(explode(split(lower(trim($"text")), " ")).as("w"))
      .groupBy($"w").agg(count(lit(1)).as("c"))
    val total = unigrams.agg(sum($"c").as("n_tokens"))
    val u1 = unigrams.select($"w".as("w1"), $"c".as("c_x"))
    val u2 = unigrams.select($"w".as("w2"), $"c".as("c_y"))
    bigrams.filter($"c_xy" >= 5)
      .join(broadcast(u1), Seq("w1"))
      .join(broadcast(u2), Seq("w2"))
      .crossJoin(broadcast(total))
      .withColumn("lift",
        ($"c_xy" * $"n_tokens").cast("double") / ($"c_x" * $"c_y").cast("double"))
      .select($"bigram", $"c_xy", $"c_x", $"c_y", $"n_tokens", $"lift")
      .orderBy($"lift".desc, $"bigram")
      .limit(50)
      .withColumn("rank", row_number().over(
        Window.partitionBy(pmod($"c_xy", lit(1))).orderBy($"lift".desc, $"bigram")))
      .orderBy($"rank")
  }

  val textCollocationPmiSql: String =
    """WITH t AS (
      |  SELECT string_split(lower(trim(text)), ' ') AS w FROM documents
      |), bi AS (
      |  SELECT w[u] || ' ' || w[u+1] AS bigram, w[u] AS w1, w[u+1] AS w2
      |  FROM t, UNNEST(range(1, len(w))) AS r(u)
      |), bc AS (
      |  SELECT bigram, ANY_VALUE(w1) AS w1, ANY_VALUE(w2) AS w2, COUNT(*) AS c_xy
      |  FROM bi GROUP BY bigram
      |), uni AS (
      |  SELECT unnest(w) AS word FROM t
      |), uc AS (
      |  SELECT word, COUNT(*) AS c FROM uni GROUP BY word
      |), tot AS (
      |  SELECT CAST(SUM(c) AS BIGINT) AS n_tokens FROM uc
      |), scored AS (
      |  SELECT bigram, c_xy, u1.c AS c_x, u2.c AS c_y, n_tokens,
      |    CAST(c_xy * n_tokens AS DOUBLE) / CAST(u1.c * u2.c AS DOUBLE) AS lift
      |  FROM bc
      |  JOIN uc u1 ON bc.w1 = u1.word
      |  JOIN uc u2 ON bc.w2 = u2.word
      |  CROSS JOIN tot
      |  WHERE c_xy >= 5
      |)
      |SELECT bigram, CAST(c_xy AS BIGINT) AS c_xy, CAST(c_x AS BIGINT) AS c_x,
      |  CAST(c_y AS BIGINT) AS c_y, n_tokens, lift,
      |  row_number() OVER (ORDER BY lift DESC, bigram) AS rank
      |FROM scored
      |ORDER BY rank
      |LIMIT 50""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_collocation_pmi" -> (textCollocationPmi _)
  )

  val oracleSql: Map[String, String] = Map(
    "text_collocation_pmi" -> textCollocationPmiSql
  )
}
