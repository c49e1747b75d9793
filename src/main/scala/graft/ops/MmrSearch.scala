package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{LongVectorDot, PartialTopK}

/** Retrieval-quality operators over the embedding corpus: metadata-
  * FILTERED vector search, and MMR (maximal-marginal-relevance)
  * DIVERSIFIED re-ranking — the two post-ANN stages every production
  * retrieval pipeline runs between the index and the consumer.
  *
  * Both follow the repo's ANN discipline: integer-exact quantized dot
  * products ([[LlmQueries.quantized]]) so scores are engine-stable and
  * order-independent under partitioning, bounded map-side heaps
  * ([[PartialTopK]]) so exchanges carry k rows per query, and zero UDFs
  * — the MMR greedy loop itself is pure Catalyst higher-order-function
  * expressions over the bounded shortlist array.
  */
object MmrSearch {

  /** Metadata-filtered exact top-k (k=5): neighbors restricted to a
    * metadata predicate (even label — the stand-in for any attribute
    * filter: source, language, license). The predicate sits on the
    * CANDIDATE SCAN — Catalyst pushes it into the parquet read, so
    * distance computation touches only the qualifying fraction of the
    * corpus ("pre-filtered" vector search, the semantics vector stores
    * call strict filtering — no post-filter recall loss). Ranking runs
    * through the PartialTopK bounded heap: ≤ k rows per (query,
    * partition) reach the exchange.
    */
  def annTopkFiltered(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val q = LlmQueries.quantized(spark, dir)
    val queries = q.filter($"vec_id" % 10 === 0)
      .select($"vec_id".as("query_id"), $"v".as("va"))
    val cands = q.filter($"label" % 2 === 0)
      .select($"vec_id".as("neighbor_id"), $"v".as("vb"))
    queries.join(cands, $"query_id" =!= $"neighbor_id")
      .withColumn("dot", LongVectorDot.vector_dot($"va", $"vb"))
      .groupBy($"query_id")
      .agg(PartialTopK.partial_topk(
        struct((-$"dot").as("neg_dot"), $"neighbor_id".as("neighbor_id"), $"dot".as("dot")),
        5).as("topk"))
      .select($"query_id", posexplode($"topk").as(Seq("pos", "s")))
      .select($"query_id", ($"pos" + 1).cast("int").as("rank"),
        $"s.neighbor_id".as("neighbor_id"), $"s.dot".as("dot"))
      .orderBy($"query_id", $"rank")
  }

  val annTopkFilteredSql: String =
    s"""${LlmQueries.quantizedCte}, scored AS (
       |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
       |    CAST(list_sum(list_transform(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i])) AS BIGINT) AS dot
       |  FROM n a JOIN n b ON a.vec_id % 10 = 0 AND a.vec_id <> b.vec_id AND b.label % 2 = 0
       |), ranked AS (
       |  SELECT query_id, neighbor_id, dot,
       |    row_number() OVER (PARTITION BY query_id ORDER BY dot DESC, neighbor_id) AS rank
       |  FROM scored
       |)
       |SELECT query_id, rank, neighbor_id, dot
       |FROM ranked WHERE rank <= 5
       |ORDER BY query_id, rank""".stripMargin

  /** Cosine between two shortlist entries (struct<…, vb, nb, …>), from
    * the integer dot and integer norms — ONE IEEE division, engine- and
    * order-stable.
    */
  private def simC(c: Column, s: Column): Column =
    LongVectorDot.vector_dot(c.getField("vb"), s.getField("vb")).cast("double") /
      sqrt((c.getField("nb") * s.getField("nb")).cast("double"))

  /** MMR score of candidate `c` against the already-selected set:
    * λ·rel(c) − (1−λ)·max_{s∈sel} sim(c, s). Empty sel folds to a −1
    * floor (cosine's minimum), so round 1 degenerates to pure relevance
    * — the MMR definition's base case, with no special-cased branch.
    */
  private def mmrScore(c: Column, sel: Column, lam: Double): Column =
    lit(lam) * c.getField("rel") -
      lit(1.0 - lam) * aggregate(sel, lit(-1.0), (m, s) => greatest(m, simC(c, s)))

  /** Greedy argmax over the remaining shortlist: seed with the head
    * (shortlist is (−dot, id)-sorted, so ties resolve to the more
    * relevant, then lower id), fold the tail with a STRICT greater-than
    * — deterministic with no float tie ambiguity beyond the seed order.
    */
  private def pick(rem: Column, sel: Column, lam: Double): Column =
    aggregate(slice(rem, lit(2), greatest(size(rem) - 1, lit(0))), element_at(rem, 1),
      (acc, c) => when(mmrScore(c, sel, lam) > mmrScore(acc, sel, lam), c).otherwise(acc))

  /** MMR re-rank core over any quantized embedding frame: per query, a
    * relevance shortlist of `shortlist` neighbors (PartialTopK — the
    * distributed heavy stage), then `k` rounds of greedy
    * diversity-aware selection run ENTIRELY as Catalyst array
    * expressions over that bounded shortlist — one map-side projection
    * per query row, no UDF, no driver loop, no extra shuffle. At 100 TB
    * the shortlist stage is the ANN index serve; the re-rank cost is
    * O(queries · shortlist² · k · d) spread across executors.
    */
  private[graft] def searchMmrOn(q: DataFrame, lam: Double, shortlist: Int, k: Int): DataFrame = {
    require(k <= shortlist, s"k=$k must not exceed shortlist=$shortlist")
    import q.sparkSession.implicits._
    val queries = q.filter($"vec_id" % 10 === 0)
      .select($"vec_id".as("query_id"), $"v".as("va"), $"nrm".as("nq"))
    val cands = q.select($"vec_id".as("neighbor_id"), $"v".as("vb"), $"nrm".as("nb"))
    // relevance = cosine (ONE IEEE division over exact integer dot/norms)
    // — the shortlist is ranked by the SAME key MMR's relevance term
    // uses, so λ=1 degenerates exactly to the shortlist prefix.
    val short = queries.join(cands, $"query_id" =!= $"neighbor_id")
      .withColumn("rel",
        LongVectorDot.vector_dot($"va", $"vb").cast("double") /
          sqrt(($"nq" * $"nb").cast("double")))
      .groupBy($"query_id")
      .agg(PartialTopK.partial_topk(
        struct((-$"rel").as("neg_rel"), $"neighbor_id".as("neighbor_id"),
          $"vb".as("vb"), $"nb".as("nb"), $"rel".as("rel")),
        shortlist).as("topk"))
      .withColumn("rem0", transform($"topk", c => struct(
        c.getField("neighbor_id").as("neighbor_id"),
        c.getField("vb").as("vb"), c.getField("nb").as("nb"),
        c.getField("rel").as("rel"))))

    // k unrolled greedy rounds: (sel, scores, rem) -> (sel+best, scores+s, rem-best)
    val init = short
      .withColumn("sel", slice($"rem0", 1, 0)) // typed empty array
      .withColumn("scores", slice(array(lit(0.0d)), 1, 0))
      .withColumn("rem", $"rem0")
    val done = (1 to k).foldLeft(init) { (df, _) =>
      df.withColumn("best", pick($"rem", $"sel", lam))
        .withColumn("scores", concat($"scores", array(mmrScore($"best", $"sel", lam))))
        .withColumn("sel", concat($"sel", array($"best")))
        .withColumn("rem", filter($"rem",
          c => c.getField("neighbor_id") =!= $"best".getField("neighbor_id")))
        .drop("best")
    }
    done.select($"query_id", posexplode(arrays_zip($"sel", $"scores")).as(Seq("pos", "z")))
      .select($"query_id", ($"pos" + 1).cast("int").as("rank"),
        $"z.sel.neighbor_id".as("neighbor_id"),
        $"z.sel.rel".as("rel_cos"), $"z.scores".as("mmr_score"))
      .orderBy($"query_id", $"rank")
  }

  /** §2 entry — MMR diversified top-5 from a 20-deep relevance
    * shortlist at λ=0.5. Not SQL-expressible (greedy sequential
    * selection) → rows-only; MmrSpec pins the semantics: λ=1 collapses
    * to the relevance ranking, rank 1 is always the max-relevance
    * neighbor, the selection is measurably more diverse than top-k, and
    * repeated runs are bit-identical.
    */
  def searchMmr(spark: SparkSession, dir: String): DataFrame =
    searchMmrOn(LlmQueries.quantized(spark, dir), lam = 0.5, shortlist = 20, k = 5)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_topk_filtered" -> (annTopkFiltered _),
    "search_mmr"        -> (searchMmr _)
  )

  /** Oracle for `search_mmr` (PROMOTED r11-cont) — the greedy is
    * sequential but every quantity in it is cross-engine bit-exact:
    * integer dots and norms, and only correctly-rounded IEEE ops on top
    * (÷, ×, −, sqrt, max — unlike ln/exp, these are exact by the
    * standard), so the 5 rounds unroll like the k-center oracle. Per
    * round: candidates = shortlist minus picked, score = 0.5·rel −
    * 0.5·max(−1, max sim-to-picked) (max over a set is
    * comparison-exact, so the Spark fold and the SQL MAX agree
    * bit-for-bit), argmax by (score DESC, shortlist position) — the
    * strict-> fold's earliest-position tie rule.
    */
  val searchMmrSql: String = {
    val rounds = (1 to 5).map { r =>
      val p = r - 1
      s"""
         |, cand$r AS (
         |  SELECT c.* FROM sl c
         |  LEFT JOIN picked$p x ON x.query_id = c.query_id AND x.neighbor_id = c.neighbor_id
         |  WHERE x.neighbor_id IS NULL
         |), sc$r AS (
         |  SELECT c.query_id, c.sl_pos, c.neighbor_id, c.vb, c.nb, c.rel,
         |    0.5 * c.rel - 0.5 * GREATEST(-1.0, COALESCE(MAX(
         |      CAST(list_sum(list_transform(range(1, len(c.vb) + 1), i -> c.vb[i] * s.vb[i])) AS DOUBLE)
         |        / sqrt(CAST(c.nb * s.nb AS DOUBLE))), -1.0)) AS score
         |  FROM cand$r c
         |  LEFT JOIN picked$p s ON s.query_id = c.query_id
         |  GROUP BY c.query_id, c.sl_pos, c.neighbor_id, c.vb, c.nb, c.rel
         |), picked$r AS MATERIALIZED (
         |  SELECT query_id, sl_pos, neighbor_id, vb, nb, rel, score, $r AS round FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, sl_pos) AS rn
         |    FROM sc$r) WHERE rn = 1
         |  UNION ALL SELECT * FROM picked$p
         |)""".stripMargin
    }.mkString
    s"""${LlmQueries.quantizedCte}
       |, scored AS (
       |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, b.v AS vb, b.nrm AS nb,
       |    CAST(list_sum(list_transform(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i])) AS DOUBLE)
       |      / sqrt(CAST(a.nrm * b.nrm AS DOUBLE)) AS rel
       |  FROM n a JOIN n b ON a.vec_id % 10 = 0 AND a.vec_id <> b.vec_id
       |), sl AS MATERIALIZED (
       |  SELECT query_id, neighbor_id, vb, nb, rel,
       |    row_number() OVER (PARTITION BY query_id ORDER BY rel DESC, neighbor_id) AS sl_pos
       |  FROM scored
       |  QUALIFY sl_pos <= 20
       |), picked0 AS (
       |  SELECT query_id, sl_pos, neighbor_id, vb, nb, rel,
       |    CAST(NULL AS DOUBLE) AS score, 0 AS round
       |  FROM sl WHERE FALSE
       |)$rounds
       |SELECT query_id, CAST(round AS INT) AS rank, neighbor_id,
       |  rel AS rel_cos, score AS mmr_score
       |FROM picked5 WHERE round >= 1
       |ORDER BY query_id, rank""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    "ann_topk_filtered" -> annTopkFilteredSql,
    "search_mmr"        -> searchMmrSql
  )
}
