package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Approximate nearest-neighbor search: random-hyperplane LSH bucketing.
  *
  * The brute-force baseline (LlmQueries.annTopkExact) scores every
  * query×candidate pair; this scale path hashes every vector into a
  * 6-bit sign bucket (64 buckets) and each query probes its own bucket
  * plus all hamming-1 neighbors (multiprobe), so per-query work is bound
  * by bucket occupancy (~n/64·7) instead of n. At 100 TB the bucket join
  * is an equi-shuffle on (bucket), never a cross join.
  *
  * Hyperplanes are deterministic ±1 vectors derived from xxhash64 of
  * (plane, dim) — reproducible with no stored model.
  */
object AnnLsh {

  private val numPlanes = 6
  private val dim = 64

  /** ±1 component of hyperplane p at dimension d (deterministic). */
  private val planes: Array[Array[Double]] = {
    val rnd = new scala.util.Random(42)
    Array.fill(numPlanes, dim)(if (rnd.nextBoolean()) 1.0 else -1.0)
  }

  /** Sign-bucket id of an embedding column (array<float/double>). */
  def lshBucket(v: Column): Column =
    planes.zipWithIndex.foldLeft(lit(0)) { case (acc, (pl, i)) =>
      val dot = aggregate(zip_with(v, lit(pl), (x, p) => x.cast("double") * p),
        lit(0.0), (a, x) => a + x)
      acc + when(dot >= 0, 1 << i).otherwise(0)
    }

  /** All buckets a query probes: its own + each single-bit flip. */
  private def probes(bucket: Column): Column =
    array((bucket +: (0 until numPlanes).map(i => bucket.bitwiseXOR(lit(1 << i)))): _*)

  /** LSH-bucketed top-k (k=5) cosine ANN for query vectors vec_id%10=0.
    * Equi-join on bucket, per-query ranking limited to probed buckets.
    */
  def annTopkLsh(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, dir)
      .select($"vec_id", $"embedding", lshBucket($"embedding").as("bucket"))

    val queries = emb.filter($"vec_id" % 10 === 0)
      .select($"vec_id".as("query_id"), $"embedding".as("qv"),
        explode(probes($"bucket")).as("bucket"))
    val cands = emb.select($"vec_id".as("neighbor_id"), $"embedding".as("cv"), $"bucket")

    val scored = queries.join(cands, Seq("bucket"))
      .filter($"query_id" =!= $"neighbor_id")
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("dot", aggregate(
        zip_with($"qv", $"cv", (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (a, x) => a + x))
    val w = Window.partitionBy($"query_id").orderBy($"dot".desc, $"neighbor_id")
    scored.withColumn("rank", row_number().over(w))
      .filter($"rank" <= 5)
      .select($"query_id", $"rank", $"neighbor_id", $"dot")
      .orderBy($"query_id", $"rank")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_topk_lsh" -> (annTopkLsh _)
  )

  /** Oracle for `ann_topk_lsh` (PROMOTED r11-cont): the hyperplanes are
    * a FIXED ±1 array baked at class load, so they embed as SQL
    * literals; every per-element product is exact (float × ±1.0, and
    * float × float in double), and the only inexact op — the fold-sum
    * of products — is replayed in the IDENTICAL association via
    * list_reduce over a 0.0-prepended list (Spark's aggregate(…, 0.0, +)
    * left fold, token for token). Sign buckets, single-bit multiprobe,
    * pair dedup, and the (dot DESC, id) rank then all reproduce
    * bit-for-bit — the one remaining ANN path joins the hash-gated set.
    */
  val annTopkLshSql: String = {
    def planeLit(p: Array[Double]): String =
      p.map(x => if (x > 0) "1.0" else "-1.0").mkString("[", ", ", "]::DOUBLE[]")
    def planeDot(i: Int): String =
      s"list_reduce(list_prepend(0.0, list_transform(range(1, len(embedding) + 1), " +
        s"j -> CAST(embedding[j] AS DOUBLE) * (${planeLit(planes(i))})[j])), (s1, s2) -> s1 + s2)"
    val bucketExpr = (0 until numPlanes)
      .map(i => s"(CASE WHEN ${planeDot(i)} >= 0 THEN ${1 << i} ELSE 0 END)")
      .mkString(" + ")
    val probeList = ("bucket" +: (0 until numPlanes).map(i => s"xor(bucket, ${1 << i})"))
      .mkString("[", ", ", "]")
    s"""WITH e AS MATERIALIZED (
       |  SELECT vec_id, embedding, ($bucketExpr) AS bucket FROM embeddings
       |), qx AS (
       |  SELECT vec_id AS query_id, unnest($probeList) AS bucket
       |  FROM e WHERE vec_id % 10 = 0
       |), pairs AS (
       |  SELECT DISTINCT q4.query_id, c.vec_id AS neighbor_id
       |  FROM qx q4 JOIN e c ON c.bucket = q4.bucket
       |  WHERE q4.query_id <> c.vec_id
       |), scored AS (
       |  SELECT p.query_id, p.neighbor_id,
       |    list_reduce(list_prepend(0.0, list_transform(range(1, len(a.embedding) + 1),
       |      j -> CAST(a.embedding[j] AS DOUBLE) * CAST(b.embedding[j] AS DOUBLE))),
       |      (s1, s2) -> s1 + s2) AS dot
       |  FROM pairs p
       |  JOIN e a ON a.vec_id = p.query_id
       |  JOIN e b ON b.vec_id = p.neighbor_id
       |), rk AS (
       |  SELECT query_id, neighbor_id, dot,
       |    row_number() OVER (PARTITION BY query_id ORDER BY dot DESC, neighbor_id) AS rank
       |  FROM scored
       |)
       |SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, dot
       |FROM rk WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    "ann_topk_lsh" -> annTopkLshSql
  )
}
