package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Scale-path near-duplicate detection: MinHash-LSH and SimHash.
  *
  * These are the 100 TB versions of the exact pairwise oracles in
  * [[LlmQueries]]: instead of an O(n²/block) self-join, each document is
  * mapped to a handful of (band, key) bucket rows and only same-bucket
  * pairs are ever compared. Shuffle volume is O(n·bands), and bucket
  * sizes — not corpus size — bound the pair work.
  *
  * All hashing is xxhash64-based and fully deterministic (fixed seed), so
  * results are reproducible across runs and cluster layouts.
  */
object ScaleDedup {

  private def words(c: Column): Column = split(lower(trim(c)), " +")
  private def wordSet(c: Column): Column = array_sort(array_distinct(words(c)))

  /** Mersenne prime 2³¹−1: permutation field small enough that a·h+b never
    * overflows a long (ANSI mode rejects wraparound arithmetic).
    */
  private val P = 2147483647L

  /** 64 deterministic affine permutations (a·h + b) mod P. */
  private val perms: Array[(Long, Long)] = {
    val rnd = new scala.util.Random(42)
    Array.fill(64)(((rnd.nextLong().abs % (P - 1)) + 1, rnd.nextLong().abs % P))
  }

  private val numBands = 16
  private val rowsPerBand = 4 // 64 / 16

  /** MinHash signature (64 lanes) of a token-set column. The token array is
    * hashed once (one xxhash64 per token); each lane is a min over the
    * permuted hashes — an O(tokens·64) per-row computation with no shuffle.
    */
  def minhashSignature(tokens: Column): Column = {
    val hs = transform(tokens, t => pmod(xxhash64(t), lit(P)))
    transform(sequence(lit(0), lit(63)), i => {
      val a = element_at(lit(perms.map(_._1)), i + 1)
      val b = element_at(lit(perms.map(_._2)), i + 1)
      array_min(transform(hs, h => pmod(h * a + b, lit(P))))
    })
  }

  /** MinHash + LSH banding near-dup detection over unigram sets:
    *  1. signature per doc (no shuffle),
    *  2. explode into 16 (band, band_key) bucket rows,
    *  3. same-bucket self-join → candidate pairs (dedup'd),
    *  4. signature-estimate prefilter (≥ 0.8 matching lanes),
    *  5. exact Jaccard verification of the survivors only.
    * Matches dedup_ngram_jaccard (jaccard ≥ 0.9) with ~1 recall at far
    * lower cost: band collision P = 1-(1-j⁴)¹⁶ ≈ 1 at j = 0.9.
    */
  def dedupMinhashLsh(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
      .select($"doc_id", wordSet($"text").as("w"))
      .withColumn("sig", minhashSignature($"w"))

    val bands = docs.select($"doc_id", $"sig",
        explode(transform(sequence(lit(0), lit(numBands - 1)), b =>
          struct(b.as("band"), xxhash64(slice($"sig", b * rowsPerBand + 1, lit(rowsPerBand))).as("band_key"))))
          .as("bk"))
      .select($"doc_id", $"sig", $"bk.band", $"bk.band_key")

    val l = bands.select($"band", $"band_key", $"doc_id".as("a"), $"sig".as("sig_a"))
    val r = bands.select($"band", $"band_key", $"doc_id".as("b"), $"sig".as("sig_b"))
    val candidates = l.join(r, Seq("band", "band_key"))
      .filter($"a" < $"b")
      .select($"a", $"b", $"sig_a", $"sig_b")
      .dropDuplicates("a", "b")
      .withColumn("sig_matches",
        size(filter(zip_with($"sig_a", $"sig_b", (x, y) => x === y), m => m)))
      .filter($"sig_matches" >= 52) // estimated jaccard ≥ ~0.8
      .select($"a", $"b", $"sig_matches")

    val sets = Tables.documents(spark, dir).select($"doc_id", wordSet($"text").as("w"))
    candidates
      .join(sets.select($"doc_id".as("a"), $"w".as("wa")), Seq("a"))
      .join(sets.select($"doc_id".as("b"), $"w".as("wb")), Seq("b"))
      .withColumn("jaccard",
        size(array_intersect($"wa", $"wb")).cast("double") /
          size(array_union($"wa", $"wb")).cast("double"))
      .filter($"jaccard" >= 0.9)
      .select($"a", $"b", $"sig_matches", $"jaccard")
      .orderBy($"a", $"b")
  }

  /** 64-bit SimHash of a token array: bit b is the sign of the sum of ±1
    * votes of each token's hash bit b. Near-dups = small hamming distance.
    */
  def simhashBits(tokens: Column): Column =
    transform(sequence(lit(0), lit(63)), b => {
      val votes = size(filter(tokens, t => pmod(xxhash64(t, b), lit(2)) === 1))
      (votes * 2 > size(tokens)).cast("int")
    })

  /** SimHash near-dup pairs with hamming ≤ 12, blocked on 4 16-bit chunks
    * (any pair within hamming 12 of 64 bits shares at least one equal chunk
    * only probabilistically — chunk blocking is the recall/cost trade the
    * scale path makes; raise chunks for tighter guarantees).
    */
  def dedupSimhash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
      .select($"doc_id", simhashBits(words($"text")).as("bits"))
      // pack 4 × 16-bit chunk values: chunk k = sum bits[16k+j] << j
      .withColumn("chunks", transform(sequence(lit(0), lit(3)), k =>
        aggregate(slice($"bits", k * 16 + 1, lit(16)), lit(0L),
          (acc, bit) => acc * 2 + bit)))

    val exploded = docs.select($"doc_id", $"bits",
        posexplode($"chunks").as(Seq("chunk_idx", "chunk_val")))
    val l = exploded.select($"chunk_idx", $"chunk_val", $"doc_id".as("a"), $"bits".as("bits_a"))
    val r = exploded.select($"chunk_idx", $"chunk_val", $"doc_id".as("b"), $"bits".as("bits_b"))
    l.join(r, Seq("chunk_idx", "chunk_val"))
      .filter($"a" < $"b")
      .dropDuplicates("a", "b")
      .withColumn("hamming",
        size(filter(zip_with($"bits_a", $"bits_b", (x, y) => x =!= y), m => m)))
      .filter($"hamming" <= 12)
      .select($"a", $"b", $"hamming")
      .orderBy($"a", $"b")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_minhash_lsh" -> (dedupMinhashLsh _),
    "dedup_simhash"     -> (dedupSimhash _)
  )
}
