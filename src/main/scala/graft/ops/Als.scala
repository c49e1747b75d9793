package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ALS matrix factorization — the model-based recommender beside the
  * neighborhood CF family ([[Recommend]]): factor the (user × item)
  * listen-count matrix into rank-d user/item embeddings by alternating
  * ridge regressions (Koren/Bell/Volinsky's classic), then serve
  * per-user top-N by factor dot product. Where item-item CF can only
  * recommend items co-listened with a user's history, the factor model
  * generalizes across the whole latent space — the standard reason a
  * production stack runs both.
  *
  * Distributed shape (the part that matters at 100 TB): one half-step
  * "solve users given items" is ONE join (ratings ⋈ item factors, on
  * item_id) + ONE user-keyed aggregation accumulating the d×d normal
  * equations map-side — the Gram entries (Σv·vᵀ, Σr·v) are plain
  * partial-agg sums, so each half-step is exactly two shuffles
  * regardless of corpus size; factor tables are ENTITY-sized (ids × d
  * doubles), never corpus-sized. With d = 2 the ridge solve
  * (A + λI)⁻¹ b is closed-form 2×2 algebra INSIDE the aggregation's
  * projection — no driver solve, no UDF, no per-row loop. d is a
  * parameter (larger d wants a Cholesky on an array column — same
  * shape, bigger expressions); the layout, not the constant, is the
  * contract, exactly like the LSH band count. Iterations
  * localCheckpoint per half-step (the Lloyd discipline) so plan depth
  * stays O(1) per round.
  *
  * The serve tail is the brute-force factor-dot ranking over the item
  * table for the query cohort (the ann_topk_exact shape) with listened
  * items anti-joined out (the rec_user_topn novelty contract); at
  * production scale the item factor table feeds the ANN index family
  * (IVF/PQ over item vectors) by composition — serving is exactly the
  * `ann_topk_*` problem once factors exist.
  *
  * Deterministic end to end: init breaks symmetry by item id (no RNG),
  * every aggregation is order-insensitive (sums), ties in the ranking
  * break by item id. Rows-only (iterative float least squares is not
  * cross-engine hashable); AlsSpec pins the monotone objective descent,
  * determinism, novelty, and that the learned model beats the
  * zero-factor baseline it started from.
  */
object Als {

  val rank = 2
  val lambda = 0.1
  val iterations = 6

  /** Deterministic symmetry-breaking init for item factors. */
  private[graft] def initItems(ratings: DataFrame): DataFrame = {
    import ratings.sparkSession.implicits._
    ratings.select($"item_id").distinct()
      .select($"item_id", lit(1.0).as("v1"),
        ((pmod($"item_id", lit(7L)) + 1L).cast("double") / 8.0).as("v2"))
  }

  /** One ridge half-solve: given factors on `givenKey` (columns g1, g2),
    * solve factors for `solveKey` from the normal equations. */
  private[graft] def halfSolve(ratings: DataFrame, given: DataFrame,
      givenKey: String, solveKey: String): DataFrame = {
    import ratings.sparkSession.implicits._
    // Gram/moment accumulation on a LONG fixed-point grid (1e-6):
    // integer addition is associative and commutative, so the
    // partial-agg order a shuffle happens to take cannot move a single
    // bit — float sums here made training run-order-dependent (caught
    // by AlsSpec's determinism pin), and DECIMAL sums fixed it but
    // measured ~2.3× slower end-to-end (the sum's widened accumulator
    // leaves Spark's compact-Long fast path). Each per-row product is
    // one deterministic snap to the 1e-6 grid — noise far below
    // anything the ridge solve can feel; headroom is ~1e10 per summed
    // group against the 9.2e18 long range. floor(x·1e6 + 0.5) and NOT
    // round(): floor on a double is exact and engine-identical, where
    // round() is Java BigDecimal HALF_UP on the printed value vs C
    // half-away-from-zero on the binary value — the one op that would
    // block the cross-engine oracle. The closed-form solve runs on the
    // summed values as doubles (÷ × + − only — correctly-rounded IEEE,
    // so the whole training trace stays cross-engine bit-exact).
    def dsum(c: org.apache.spark.sql.Column) =
      sum(floor(c * 1e6 + 0.5)).cast("double") / 1e6
    // SHUFFLE_HASH, never broadcast: `given` can be the USER factor
    // table (unbounded — 10⁸⁺ rows at 100× scale), so a broadcast here
    // is a per-iteration multi-GB driver collect, 2×iterations per
    // training run. The hint shuffles only the ENTITY-sized factor
    // table into the ratings' pinned layout ([[train]] pre-partitioned
    // the corpus on each join key) and builds the hash map on the
    // factor side — no sort of the corpus side, no exchange under it.
    // AlsSpec plan-pins both properties (no BroadcastExchange of
    // factors; no shuffle beneath the streamed corpus side).
    ratings
      .join(given.withColumnRenamed("v1", "g1").withColumnRenamed("v2", "g2")
        .hint("shuffle_hash"), Seq(givenKey))
      .groupBy(col(solveKey))
      .agg(
        dsum($"g1" * $"g1").as("a11"), dsum($"g1" * $"g2").as("a12"),
        dsum($"g2" * $"g2").as("a22"),
        dsum($"r" * $"g1").as("b1"), dsum($"r" * $"g2").as("b2"))
      .withColumn("det",
        ($"a11" + lambda) * ($"a22" + lambda) - $"a12" * $"a12")
      .select(col(solveKey),
        ((($"a22" + lambda) * $"b1" - $"a12" * $"b2") / $"det").as("v1"),
        ((-$"a12" * $"b1" + ($"a11" + lambda) * $"b2") / $"det").as("v2"))
  }

  /** One corpus shuffle, pinned and DECLARED — see
    * [[graft.plans.PinnedLayout]] (the shared device; extracted there in
    * r12 when PageRank and label propagation adopted it too). Sized by
    * the caller's rating count (r16, guide §2.2): partition count
    * derives from input rows, capped at the configured shuffle
    * parallelism — at corpus scale identical to before, at test scale
    * the 12 per-round factor exchanges stop paying `cpus` tasks each.
    */
  private[graft] def pinByKey(df: DataFrame, key: String, rows: Long): DataFrame =
    graft.plans.PinnedLayout.pinByKeySized(df, key, rows)

  /** Train (userFactors, itemFactors) on a (user_id, item_id, r) frame.
    *
    * The ratings table is pre-partitioned ONCE per join key and pinned
    * ([[pinByKey]] re-declares the hash layout the checkpoint forgets),
    * and [[halfSolve]]'s SHUFFLE_HASH join consumes exactly that layout:
    * every half-solve re-shuffles only the ENTITY-sized factor table
    * into the ratings' partitioning (hash-building on the factor side,
    * streaming the corpus side unsorted) — the corpus-sized side never
    * crosses the wire again after the two up-front shuffles, and the
    * groupBy that follows ships only map-side-combined Gram partials
    * (≤ entities × partitions rows). This is the
    * reuse-a-partitioning-across-stages discipline that matters when
    * ratings are the 100 TB side: 2 corpus shuffles total instead of
    * 2·iterations. AlsSpec plan-asserts it (no BroadcastExchange of a
    * factor table, no exchange beneath the corpus side of the solve
    * join).
    */
  private[graft] def train(ratings0: DataFrame, iters: Int = iterations): (DataFrame, DataFrame) = {
    // one bounded driver pull (a long) sizes both pins; every entry path
    // hands in an already-checkpointed ratings frame, so this scans the
    // cached blocks, not the lineage
    val nRatings = ratings0.count()
    val byItem = pinByKey(ratings0, "item_id", nRatings)
    val byUser = pinByKey(ratings0, "user_id", nRatings)
    var items = initItems(byItem).localCheckpoint()
    var users: DataFrame = null
    (1 to iters).foreach { _ =>
      // one materialization barrier per FULL alternation, not per
      // half-solve: the users solve stays lazy inside the items plan
      // (depth stays bounded at two joins off checkpoints), halving
      // the chained-job scheduling overhead that dominated the
      // per-half-checkpoint version
      users = halfSolve(byItem, items, "item_id", "user_id")
      items = halfSolve(byUser, users, "user_id", "item_id").localCheckpoint()
    }
    (users.localCheckpoint(), items)
  }

  /** Σ(r − u·v)² + λ(Σ‖u‖² + Σ‖v‖²) — the ALS objective, for the spec's
    * monotone-descent pin. */
  private[graft] def objective(ratings: DataFrame, users: DataFrame, items: DataFrame): Double = {
    import ratings.sparkSession.implicits._
    val sse = ratings
      .join(users.withColumnRenamed("v1", "u1").withColumnRenamed("v2", "u2"), Seq("user_id"))
      .join(items, Seq("item_id"))
      .select(pow($"r" - ($"u1" * $"v1" + $"u2" * $"v2"), 2).as("e"))
      .agg(sum($"e")).head().getDouble(0)
    val regU = users.select(($"v1" * $"v1" + $"v2" * $"v2").as("n"))
      .agg(sum($"n")).head().getDouble(0)
    val regI = items.select(($"v1" * $"v1" + $"v2" * $"v2").as("n"))
      .agg(sum($"n")).head().getDouble(0)
    sse + lambda * (regU + regI)
  }

  private[graft] def ratingsOf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Recommend.listenCounts(spark, dir)
      .select($"user_id", $"item_id", $"n_listens".cast("double").as("r"))
  }

  /** §2 entry `rec_als_topn`: per-user top-5 factor-model
    * recommendations for the evaluation cohort (user_id % 100 == 0 —
    * the ANN entries' query-cohort device, keeping the brute-force
    * serve tail bounded at cohort × items), listened items anti-joined
    * out, ranked by (score desc, item id) through PartialTopK.
    */
  def recAlsTopn(spark: SparkSession, dir: String): DataFrame = {
    // one fact scan: train's two partitioned copies and the novelty
    // anti-join all read this materialization
    val ratings = ratingsOf(spark, dir).localCheckpoint()
    val (users, items) = train(ratings)
    serveTopn(ratings, users, items)
  }

  /** The factor-dot serve tail shared by the trained and persisted
    * entries: cohort × item scores, novelty anti-join, top-5 through
    * PartialTopK. `listened` is any frame with (user_id, item_id) —
    * the in-session ratings for the trained entry, the persisted
    * listened/ ledger for the index entry.
    */
  private def serveTopn(listened: DataFrame, users: DataFrame, items: DataFrame): DataFrame = {
    import listened.sparkSession.implicits._
    import graft.functions.PartialTopK.partial_topk
    val cohort = users.filter($"user_id" % 100 === 0)
      .withColumnRenamed("v1", "u1").withColumnRenamed("v2", "u2")
    val scored = items.crossJoin(broadcast(cohort))
      .select($"user_id", $"item_id", ($"u1" * $"v1" + $"u2" * $"v2").as("score"))
    val novel = scored.join(
      listened.select($"user_id", $"item_id"),
      Seq("user_id", "item_id"), "left_anti")
    novel
      .groupBy($"user_id")
      .agg(partial_topk(
        struct((-$"score").as("neg"), $"item_id".as("item_id"), $"score".as("score")),
        5).as("s"))
      .select($"user_id", posexplode($"s").as(Seq("pos", "t")))
      .select($"user_id", ($"pos" + 1).cast("int").as("rank"),
        $"t.item_id".as("rec_item_id"), $"t.score".as("score"))
      .orderBy($"user_id", $"rank")
  }

  // ---------------------------------------------------------------------
  // Persisted-factor lifecycle — the index discipline every other family
  // has (save/serve/append/delete): at production the factor tables ARE
  // the model artifact a training job writes and every serving job reads.
  // ---------------------------------------------------------------------

  /** Hash buckets for the persisted user-factor table — the user-grain
    * lifecycle ops (fold-in, delete, the streaming onboard) rewrite only
    * affected buckets, so the entity-sized table is never rewritten
    * whole for a bounded change. 16 at test scale; the layout is the
    * contract, not the constant.
    */
  val userBuckets = 16

  private def bucketOf(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    pmod(xxhash64(c.cast("string")), lit(userBuckets.toLong)).cast("int")

  /** Train on `dir`'s ratings and persist both factor tables (users
    * bucketed by user-id hash — see [[userBuckets]]) PLUS the listened
    * (user_id, item_id) pair ledger the novelty anti-join serves from —
    * the CF family's uic/ discipline: the persisted entry's claim is a
    * FACT-FREE serve path, and without the ledger the anti-join would
    * re-scan the corpus at every serve. Same bucket layout as users/ so
    * the user-grain lifecycle ops (fold-in, delete) rewrite only
    * affected buckets of both tables.
    */
  def saveAlsIndex(spark: SparkSession, dir: String, indexPath: String): Unit = {
    import spark.implicits._
    val ratings = ratingsOf(spark, dir).localCheckpoint()
    val (users, items) = train(ratings)
    users.withColumn("_bucket", bucketOf($"user_id"))
      .write.mode("overwrite").partitionBy("_bucket").parquet(s"$indexPath/users")
    items.write.mode("overwrite").parquet(s"$indexPath/items")
    ratings.select($"user_id", $"item_id")
      .withColumn("_bucket", bucketOf($"user_id"))
      .write.mode("overwrite").partitionBy("_bucket").parquet(s"$indexPath/listened")
  }

  /** §2 entry `rec_als_topn_persisted`: the SAME recommendations served
    * from the saved factor tables — no training pass AND no fact-table
    * scan in the serve path (the novelty anti-join reads the persisted
    * listened/ ledger, the CfIndex uic/ discipline), which is the
    * entry's whole claim (the `ann_topk_pca_persisted` contract).
    * Row-identical to [[recAlsTopn]] (spec-pinned); fact-freedom is
    * plan-asserted in AlsSpec.
    */
  def recAlsTopnPersisted(spark: SparkSession, dir: String): DataFrame = {
    val indexPath = savedIndexes.synchronized {
      savedIndexes.getOrElseUpdate((spark, dir), {
        val p = s"${System.getProperty("java.io.tmpdir")}/graft_als_index_" +
          graft.Tables.dirKey(dir) +
          "_" + ProcessHandle.current().pid() +
          "_" + Integer.toHexString(System.identityHashCode(spark))
        saveAlsIndex(spark, dir, p)
        p
      })
    }
    serveTopn(spark.read.parquet(s"$indexPath/listened").drop("_bucket"),
      spark.read.parquet(s"$indexPath/users").drop("_bucket"),
      spark.read.parquet(s"$indexPath/items"))
  }

  private val savedIndexes =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), String]

  /** Incremental NEW-USER onboarding — the fold-in every production
    * factor model serves with: solve the new users' factors against the
    * FROZEN item table (one ridge half-solve over only the new users'
    * ratings — no retraining, no touch of existing user rows) and
    * append them. Exactly the cold-start path: a user's first session
    * ends, one bounded solve, and the factor index can recommend for
    * them. Idempotent re-fold: an already-present user is re-solved and
    * REPLACED, not duplicated (the CDC upsert discipline).
    */
  def foldUsersIntoAlsIndex(spark: SparkSession, indexPath: String,
      newRatings: DataFrame): Unit = {
    import spark.implicits._
    val items = spark.read.parquet(s"$indexPath/items")
    val solved = halfSolve(newRatings, items, "item_id", "user_id")
      .withColumn("_bucket", bucketOf($"user_id"))
      .localCheckpoint()
    // rewrite ONLY the affected user buckets (dynamic partition
    // overwrite): untouched residents of those buckets carry over, the
    // solved users replace their own rows, cold buckets stay
    // byte-identical — the bounded-change discipline every persisted
    // index's user-grain ops follow
    val affected = solved.select($"_bucket").distinct()
      .collect().map(_.getInt(0)).toSeq
    val keep = spark.read.parquet(s"$indexPath/users")
      .filter($"_bucket".isin(affected: _*))
      .join(solved.select($"user_id"), Seq("user_id"), "left_anti")
      .select($"user_id", $"v1", $"v2", $"_bucket")
    keep.unionByName(solved.select($"user_id", $"v1", $"v2", $"_bucket"))
      .localCheckpoint()
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("_bucket")
      .parquet(s"$indexPath/users")
    // listened/ ledger follows the same REPLACE rule: the folded users'
    // pair sets come from their (full) streamed profile, so the serve
    // path's novelty anti-join stays exact for onboarded users without
    // ever touching a fact table. Restricted to SOLVED users, exactly
    // like the factor rewrite: a user whose items are all absent from
    // the frozen catalog produces no factor row, and admitting their
    // pairs here would target buckets outside `affected` — the dynamic
    // overwrite would then replace those buckets with ONLY the new
    // pairs, silently wiping other residents' listened history
    // (AlsSpec pins the ledger never shrinks on fold).
    val newPairs = newRatings.select($"user_id", $"item_id").distinct()
      .join(solved.select($"user_id"), Seq("user_id"), "left_semi")
      .withColumn("_bucket", bucketOf($"user_id"))
    val keepL = spark.read.parquet(s"$indexPath/listened")
      .filter($"_bucket".isin(affected: _*))
      .join(solved.select($"user_id"), Seq("user_id"), "left_anti")
      .select($"user_id", $"item_id", $"_bucket")
    keepL.unionByName(newPairs)
      .localCheckpoint()
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("_bucket")
      .parquet(s"$indexPath/listened")
  }

  /** GDPR user delete for the factor index: remove the users' factor
    * rows (their latent taste vector IS derived personal data) AND
    * their listened/ ledger rows (the raw listen pairs are personal
    * data outright). The item table is untouched — it aggregates the
    * population and is not keyed to any user. Idempotent; atomic via
    * the shared temp-swap.
    */
  def deleteUsersFromAlsIndex(spark: SparkSession, indexPath: String,
      userIds: Seq[Long]): Unit = {
    purgeUsersFromBucketed(spark, s"$indexPath/users", userIds)
    purgeUsersFromBucketed(spark, s"$indexPath/listened", userIds)
  }

  /** Delete every row of `userIds` from a user-hash-bucketed parquet
    * table, rewriting ONLY buckets that actually hold them (an
    * already-purged id finds none and the re-delete is a byte-level
    * no-op). Schema-generic: used for both the factor table and the
    * listened ledger.
    */
  private def purgeUsersFromBucketed(spark: SparkSession, path: String,
      userIds: Seq[Long]): Unit = {
    import spark.implicits._
    val df = spark.read.parquet(path)
    val affected = df.filter($"user_id".isin(userIds: _*))
      .select($"_bucket").distinct().collect().map(_.getInt(0)).toSeq
    if (affected.nonEmpty) {
      val cols = df.columns.filterNot(_ == "_bucket").map(col) :+ col("_bucket")
      val rewritten = df.filter($"_bucket".isin(affected: _*))
        .filter(!$"user_id".isin(userIds: _*))
        .select(cols: _*)
        .localCheckpoint()
      rewritten
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("_bucket")
        .parquet(path)
      // dynamic overwrite writes NOTHING for a bucket whose rewrite is
      // empty (the deleted user was its only resident) — its stale rows
      // would survive on disk, resurrecting the purged data; remove
      // emptied dirs explicitly (the attribution touch-store lesson)
      val live = rewritten.select($"_bucket").distinct()
        .collect().map(_.getInt(0)).toSet
      val base = new org.apache.hadoop.fs.Path(path)
      val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
      affected.filterNot(live).foreach { b =>
        fs.delete(new org.apache.hadoop.fs.Path(s"$path/_bucket=$b"), true)
        ()
      }
    }
  }

  // ---------------------------------------------------------------------
  // Rank-parametric training (d > 2): the d=2 entries' closed-form 2×2
  // solve generalizes to an LDLᵀ solve of the d×d normal equations on an
  // ARRAY factor column — the same layout contract (shuffle-join the
  // entity-sized factor table into the pinned corpus partitioning, Gram
  // sums on the 1e-6 integer grid map-side, solve at ENTITY grain after
  // the aggregation). The solve is a Scala UDF, deliberately: it runs on
  // post-aggregate rows (one per entity, never per rating), so it sits
  // off the corpus hot path — the one place a UDF costs nothing at
  // 100 TB. LDLᵀ and not Cholesky so the whole solve stays ÷ × + −
  // (no sqrt), keeping the trace exactly as deterministic as the d=2
  // form. AlsSpec pins monotone objective descent and bit-determinism
  // at d = 4 — the docstring's "larger d, same shape" contract as code.
  // ---------------------------------------------------------------------

  /** Deterministic symmetry-breaking init at rank d: lane 0 is 1.0, and
    * each later lane keys to a distinct modulus so no two lanes are
    * collinear over the item-id range. */
  private[graft] def initItemsD(ratings: DataFrame, d: Int): DataFrame = {
    import ratings.sparkSession.implicits._
    val lanes = lit(1.0) +: (1 until d).map { j =>
      (pmod($"item_id", lit((7 + 4 * j).toLong)) + 1L).cast("double") / (8 + 4 * j).toDouble
    }
    ratings.select($"item_id").distinct()
      .select($"item_id", array(lanes: _*).as("v"))
  }

  /** LDLᵀ solve of (A + λI)x = b; `packed` is the upper triangle of the
    * Gram matrix row-major (i ≤ j). Rational ops only — no sqrt — so the
    * result is a deterministic function of the (integer-grid-exact)
    * inputs. λI makes A strictly positive-definite: every D(j) > 0.
    */
  private[graft] def ldlSolve(packed: Seq[Double], bs: Seq[Double], d: Int,
      lam: Double): Seq[Double] = {
    val A = Array.ofDim[Double](d, d)
    var idx = 0
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) { A(i)(j) = packed(idx); A(j)(i) = packed(idx); idx += 1; j += 1 }
      i += 1
    }
    i = 0
    while (i < d) { A(i)(i) += lam; i += 1 }
    val L = Array.ofDim[Double](d, d)
    val D = new Array[Double](d)
    var j = 0
    while (j < d) {
      var s = A(j)(j)
      var k = 0
      while (k < j) { s -= L(j)(k) * L(j)(k) * D(k); k += 1 }
      D(j) = s
      L(j)(j) = 1.0
      var r = j + 1
      while (r < d) {
        var t = A(r)(j)
        k = 0
        while (k < j) { t -= L(r)(k) * L(j)(k) * D(k); k += 1 }
        L(r)(j) = t / D(j)
        r += 1
      }
      j += 1
    }
    val y = new Array[Double](d) // forward: L y = b
    i = 0
    while (i < d) {
      var t = bs(i)
      var k = 0
      while (k < i) { t -= L(i)(k) * y(k); k += 1 }
      y(i) = t
      i += 1
    }
    val x = new Array[Double](d) // scale + back: Lᵀ x = y / D
    i = d - 1
    while (i >= 0) {
      var t = y(i) / D(i)
      var k = i + 1
      while (k < d) { t -= L(k)(i) * x(k); k += 1 }
      x(i) = t
      i -= 1
    }
    x.toSeq
  }

  /** Rank-d ridge half-solve over an array factor column `v` — the same
    * two-shuffle shape as [[halfSolve]]: SHUFFLE_HASH join of the
    * entity-sized factor table into the pinned corpus layout, integer-grid
    * Gram accumulation map-side, entity-grain LDLᵀ solve after the agg.
    */
  private[graft] def halfSolveD(ratings: DataFrame, given: DataFrame,
      givenKey: String, solveKey: String, d: Int): DataFrame = {
    import ratings.sparkSession.implicits._
    def dsum(c: org.apache.spark.sql.Column) =
      sum(floor(c * 1e6 + 0.5)).cast("double") / 1e6
    val grams = for (i <- 0 until d; j <- i until d)
      yield dsum($"g".getItem(i) * $"g".getItem(j)).as(s"a_${i}_$j")
    val moms = (0 until d).map(i => dsum($"r" * $"g".getItem(i)).as(s"b_$i"))
    val solve = udf((a: Seq[Double], b: Seq[Double]) => ldlSolve(a, b, d, lambda))
    ratings
      .join(given.withColumnRenamed("v", "g").hint("shuffle_hash"), Seq(givenKey))
      .groupBy(col(solveKey))
      .agg(grams.head, (grams.tail ++ moms): _*)
      .select(col(solveKey),
        solve(
          array((for (i <- 0 until d; j <- i until d) yield col(s"a_${i}_$j")): _*),
          array((0 until d).map(i => col(s"b_$i")): _*)).as("v"))
  }

  /** Rank-d twin of [[train]] — identical pinned-partitioning and
    * materialization-barrier discipline, array factor columns. */
  private[graft] def trainD(ratings0: DataFrame, d: Int,
      iters: Int = iterations): (DataFrame, DataFrame) = {
    val nRatings = ratings0.count() // sizes both pins; see train()
    val byItem = pinByKey(ratings0, "item_id", nRatings)
    val byUser = pinByKey(ratings0, "user_id", nRatings)
    var items = initItemsD(byItem, d).localCheckpoint()
    var users: DataFrame = null
    (1 to iters).foreach { _ =>
      users = halfSolveD(byItem, items, "item_id", "user_id", d)
      items = halfSolveD(byUser, users, "user_id", "item_id", d).localCheckpoint()
    }
    (users.localCheckpoint(), items)
  }

  /** §2 entry `rec_als_topn_d4` (round 12): the rank-4 factor model as a
    * first-class serving entry — same corpus, same cohort, same novelty
    * contract as `rec_als_topn`, trained through [[trainD]]'s array
    * factor column and LDLᵀ solve. HASH-GATED like the d=2 twin: every
    * float in the training trace is built from integer-grid-exact sums
    * by correctly-rounded IEEE ÷ × + − only (LDLᵀ needs no sqrt), so the
    * 6 alternations unroll into 12 materialized DuckDB CTEs whose
    * decomposition/substitution expressions mirror [[ldlSolve]]'s loop
    * order token for token (see [[recAlsTopnD4Sql]]).
    */
  def recAlsTopnD4(spark: SparkSession, dir: String): DataFrame = {
    val ratings = ratingsOf(spark, dir).localCheckpoint()
    val (users, items) = trainD(ratings, d = 4)
    serveTopnD(ratings, users, items, d = 4)
  }

  /** The rank-d serve tail: cohort × item scores through an index-order
    * array dot (left-associated, mirrored in the oracle), novelty
    * anti-join, top-5 through PartialTopK — [[serveTopn]] on array
    * factors. `d` must match the factor arrays' rank (a shorter d scores
    * a prefix; a longer one nulls every score through the out-of-bounds
    * getItem), so it is threaded from the caller, not assumed.
    */
  private def serveTopnD(listened: DataFrame, users: DataFrame, items: DataFrame,
      d: Int): DataFrame = {
    import listened.sparkSession.implicits._
    import graft.functions.PartialTopK.partial_topk
    val cohort = users.filter($"user_id" % 100 === 0).withColumnRenamed("v", "u")
    val score = (0 until d)
      .map(i => $"u".getItem(i) * $"v".getItem(i)).reduce(_ + _)
    val scored = items.crossJoin(broadcast(cohort))
      .select($"user_id", $"item_id", score.as("score"))
    val novel = scored.join(
      listened.select($"user_id", $"item_id"),
      Seq("user_id", "item_id"), "left_anti")
    novel
      .groupBy($"user_id")
      .agg(partial_topk(
        struct((-$"score").as("neg"), $"item_id".as("item_id"), $"score".as("score")),
        5).as("s"))
      .select($"user_id", posexplode($"s").as(Seq("pos", "t")))
      .select($"user_id", ($"pos" + 1).cast("int").as("rank"),
        $"t.item_id".as("rec_item_id"), $"t.score".as("score"))
      .orderBy($"user_id", $"rank")
  }

  /** Rank-d objective Σ(r − u·v)² + λ(Σ‖u‖² + Σ‖v‖²) over array factors. */
  private[graft] def objectiveD(ratings: DataFrame, users: DataFrame,
      items: DataFrame): Double = {
    import ratings.sparkSession.implicits._
    def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    val sse = ratings
      .join(users.withColumnRenamed("v", "u"), Seq("user_id"))
      .join(items, Seq("item_id"))
      .select(pow($"r" - dot($"u", $"v"), 2).as("e"))
      .agg(sum($"e")).head().getDouble(0)
    def reg(t: DataFrame) = t.select(dot(col("v"), col("v")).as("n"))
      .agg(sum(col("n"))).head().getDouble(0)
    sse + lambda * (reg(users) + reg(items))
  }

  // ---------------------------------------------------------------------
  // Implicit-feedback ALS (Hu/Koren/Volinsky) — the production variant:
  // listen counts are CONFIDENCE, not ratings. Every (user, item) cell
  // participates (preference p = 1 observed / 0 unobserved, confidence
  // c = 1 + α·r), which naively makes each half-solve users×items-dense;
  // the HKV identity collapses it: A_u = YᵀY + Σ_{i∈I_u}(c−1)·vᵢvᵢᵀ + λI,
  // b_u = Σ_{i∈I_u} c·vᵢ — the GLOBAL Gram YᵀY is ONE 3-number aggregate
  // over the entity-sized factor table (broadcast as one row — the
  // delta_load scalar device), and the corrections touch only OBSERVED
  // pairs, so the per-half-solve cost is identical to the explicit
  // model's: one shuffle-hash join into the pinned corpus layout + one
  // map-side-combined Gram aggregation.
  // ---------------------------------------------------------------------

  /** Confidence slope α. 32 = 2⁵: c = 1 + 32·r stays on an exact dyadic
    * grid (r is an integer count as a double), so confidence weighting
    * adds no rounding of its own.
    */
  val alpha = 32.0

  /** The shared fixed-point Gram sum (the [[halfSolve]] device). */
  private def dsumG(c: org.apache.spark.sql.Column) =
    sum(floor(c * 1e6 + 0.5)).cast("double") / 1e6

  /** The global factor Gram YᵀY as one (g11, g12, g22) row, on the same
    * 1e-6 fixed-point grid as every other Gram sum.
    */
  private[graft] def gramOf(given: DataFrame): DataFrame = {
    import given.sparkSession.implicits._
    given.agg(dsumG($"v1" * $"v1").as("g11"), dsumG($"v1" * $"v2").as("g12"),
      dsumG($"v2" * $"v2").as("g22"))
  }

  /** One implicit-feedback half-solve: corrections from observed pairs
    * only, the global Gram crossed in as a broadcast scalar row.
    */
  private[graft] def halfSolveImplicit(ratings: DataFrame, given: DataFrame,
      givenKey: String, solveKey: String): DataFrame = {
    import ratings.sparkSession.implicits._
    val corr = ratings
      .join(given.withColumnRenamed("v1", "g1").withColumnRenamed("v2", "g2")
        .hint("shuffle_hash"), Seq(givenKey))
      .groupBy(col(solveKey))
      .agg(
        dsumG((lit(alpha) * $"r") * ($"g1" * $"g1")).as("c11"),
        dsumG((lit(alpha) * $"r") * ($"g1" * $"g2")).as("c12"),
        dsumG((lit(alpha) * $"r") * ($"g2" * $"g2")).as("c22"),
        dsumG((lit(1.0) + lit(alpha) * $"r") * $"g1").as("b1"),
        dsumG((lit(1.0) + lit(alpha) * $"r") * $"g2").as("b2"))
    corr.crossJoin(broadcast(gramOf(given)))
      .withColumn("a11", $"g11" + $"c11")
      .withColumn("a12", $"g12" + $"c12")
      .withColumn("a22", $"g22" + $"c22")
      .withColumn("det",
        ($"a11" + lambda) * ($"a22" + lambda) - $"a12" * $"a12")
      .select(col(solveKey),
        ((($"a22" + lambda) * $"b1" - $"a12" * $"b2") / $"det").as("v1"),
        ((-$"a12" * $"b1" + ($"a11" + lambda) * $"b2") / $"det").as("v2"))
  }

  /** Train implicit-feedback factors — the [[train]] loop with the HKV
    * half-solve; same pinned-corpus / entity-only-shuffle contract.
    */
  private[graft] def trainImplicit(ratings0: DataFrame,
      iters: Int = iterations): (DataFrame, DataFrame) = {
    val nRatings = ratings0.count() // sizes both pins; see train()
    val byItem = pinByKey(ratings0, "item_id", nRatings)
    val byUser = pinByKey(ratings0, "user_id", nRatings)
    var items = initItems(byItem).localCheckpoint()
    var users: DataFrame = null
    (1 to iters).foreach { _ =>
      // UNLIKE the explicit train loop, each implicit half-solve
      // checkpoints: halfSolveImplicit reads its `given` factors TWICE —
      // the correction join AND the broadcast Gram aggregate — so a lazy
      // users plan inside the items solve would re-run the whole users
      // half-solve once per consumer (r15 perf pass: measured 22.9 →
      // 20.1 s cold / 14.1 → 12.6 s warm at sf0.1; the explicit loop
      // keeps the one-barrier-per-alternation form because its given
      // side is read once)
      users = halfSolveImplicit(byItem, items, "item_id", "user_id").localCheckpoint()
      items = halfSolveImplicit(byUser, users, "user_id", "item_id").localCheckpoint()
    }
    (users, items)
  }

  /** The HKV objective Σ_{ALL cells} c·(p − x·y)² + λ(Σ‖x‖² + Σ‖y‖²),
    * for the spec's monotone-descent pin — computed exactly without
    * materializing the dense cell grid: Σ_all (x·y)² = tr(XᵀX · YᵀY)
    * from the two 2×2 Grams, and the observed cells contribute
    * c·(1 − x·y)² − (x·y)² on top of their dense-term share.
    */
  private[graft] def objectiveImplicit(ratings: DataFrame, users: DataFrame,
      items: DataFrame): Double = {
    import ratings.sparkSession.implicits._
    def gram3(t: DataFrame): (Double, Double, Double) = {
      val r = t.agg(sum($"v1" * $"v1"), sum($"v1" * $"v2"), sum($"v2" * $"v2")).head()
      (r.getDouble(0), r.getDouble(1), r.getDouble(2))
    }
    val (xu11, xu12, xu22) = gram3(users)
    val (yi11, yi12, yi22) = gram3(items)
    val dense = xu11 * yi11 + 2.0 * xu12 * yi12 + xu22 * yi22
    val obs = ratings
      .join(users.withColumnRenamed("v1", "u1").withColumnRenamed("v2", "u2"), Seq("user_id"))
      .join(items, Seq("item_id"))
      .select((($"u1" * $"v1" + $"u2" * $"v2")).as("xy"), $"r")
      .select(((lit(1.0) + lit(alpha) * $"r") * pow(lit(1.0) - $"xy", 2)
        - pow($"xy", 2)).as("e"))
      .agg(sum($"e")).head().getDouble(0)
    dense + obs + lambda * (xu11 + xu22 + yi11 + yi22)
  }

  /** §2 entry `rec_als_implicit`: per-user top-5 from the implicit-
    * feedback factor model — same cohort / novelty / ranking contract as
    * [[recAlsTopn]], different model class (confidence-weighted
    * preference instead of count regression).
    */
  def recAlsImplicit(spark: SparkSession, dir: String): DataFrame = {
    val ratings = ratingsOf(spark, dir).localCheckpoint()
    val (users, items) = trainImplicit(ratings)
    serveTopn(ratings, users, items)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "rec_als_topn" -> (recAlsTopn _),
    "rec_als_topn_persisted" -> (recAlsTopnPersisted _),
    "rec_als_topn_d4" -> (recAlsTopnD4 _),
    "rec_als_implicit" -> (recAlsImplicit _)
  )

  /** Oracle for BOTH ALS entries (PROMOTED r11-cont — the persisted twin
    * is spec-pinned row-identical, so one oracle holds both): the whole
    * training trace is cross-engine bit-exact, because every float in it
    * is built from exact integers by correctly-rounded IEEE ops only —
    * the Gram/moment sums snap to the long 1e-6 grid with floor(x+0.5)
    * (exact on doubles in both engines, where round() is Java BigDecimal
    * HALF_UP vs C half-away-from-zero), and the closed-form 2×2 solve is
    * ÷ × + − verbatim. The 6 alternations unroll into 12 MATERIALIZED
    * half-solves; the serve tail is the cohort × items scoring with the
    * novelty anti-join and a (score DESC, item) rank. Token-for-token
    * expression trees matter here (e.g. (g1·g1)·1e6 + 0.5, (−a12)·b1):
    * float ops are non-associative, so the SQL mirrors the Column tree
    * exactly. Verified bit-for-bit including the double scores.
    */
  val recAlsTopnSql: String = {
    def fsum(prod: String) =
      s"CAST(SUM(CAST(floor($prod * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0"
    def solve(given: String, gk: String, sk: String, out: String) =
      s"""
         |, $out AS MATERIALIZED (
         |  SELECT t.$sk,
         |    (((t.a22 + 0.1) * t.b1 - t.a12 * t.b2) / t.det) AS v1,
         |    (((-t.a12) * t.b1 + (t.a11 + 0.1) * t.b2) / t.det) AS v2
         |  FROM (
         |    SELECT s.$sk, s.a11, s.a12, s.a22, s.b1, s.b2,
         |      ((s.a11 + 0.1) * (s.a22 + 0.1) - s.a12 * s.a12) AS det
         |    FROM (
         |      SELECT r.$sk,
         |        ${fsum("g.v1 * g.v1")} AS a11,
         |        ${fsum("g.v1 * g.v2")} AS a12,
         |        ${fsum("g.v2 * g.v2")} AS a22,
         |        ${fsum("r.r * g.v1")} AS b1,
         |        ${fsum("r.r * g.v2")} AS b2
         |      FROM ratings r JOIN $given g ON g.$gk = r.$gk
         |      GROUP BY r.$sk
         |    ) s
         |  ) t
         |)""".stripMargin
    val rounds = (1 to iterations).map { it =>
      solve(s"i${it - 1}", "item_id", "user_id", s"u$it") +
        solve(s"u$it", "user_id", "item_id", s"i$it")
    }.mkString
    s"""WITH ratings AS MATERIALIZED (
       |  SELECT o.o_custkey AS user_id, l.l_partkey AS item_id,
       |    CAST(COUNT(*) AS DOUBLE) AS r
       |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
       |  GROUP BY 1, 2
       |), i0 AS (
       |  SELECT DISTINCT item_id, 1.0 AS v1,
       |    CAST(item_id % 7 + 1 AS DOUBLE) / 8.0 AS v2
       |  FROM ratings
       |)$rounds
       |, cohort AS (
       |  SELECT user_id, v1 AS u1, v2 AS u2 FROM u$iterations WHERE user_id % 100 = 0
       |), scored_t AS (
       |  SELECT c.user_id, i.item_id, (c.u1 * i.v1 + c.u2 * i.v2) AS score
       |  FROM cohort c, i$iterations i
       |), novel AS (
       |  SELECT s.* FROM scored_t s
       |  LEFT JOIN ratings x ON x.user_id = s.user_id AND x.item_id = s.item_id
       |  WHERE x.item_id IS NULL
       |), ranked AS (
       |  SELECT user_id, item_id, score,
       |    row_number() OVER (PARTITION BY user_id ORDER BY score DESC, item_id) AS rank
       |  FROM novel
       |)
       |SELECT user_id, CAST(rank AS INT) AS rank, item_id AS rec_item_id, score
       |FROM ranked WHERE rank <= 5
       |ORDER BY user_id, rank""".stripMargin
  }

  /** Oracle for `rec_als_topn_d4`: the d=2 device at rank 4 — Gram/moment
    * sums on the shared 1e-6 integer grid, then the LDLᵀ decomposition,
    * forward substitution, and back substitution laid out as a chain of
    * nested projections whose expressions mirror [[ldlSolve]]'s loop
    * order TOKEN FOR TOKEN (every `-` chain is left-associated exactly as
    * the sequential `t -= …` statements run; `(lᵢₖ·lⱼₖ)·dₖ` products keep
    * the Scala multiply order). No sqrt anywhere, so the whole train +
    * serve trace is correctly-rounded IEEE ÷ × + − over exact integers —
    * cross-engine bit-exact including the double scores.
    */
  val recAlsTopnD4Sql: String = {
    def fsum(prod: String) =
      s"CAST(SUM(CAST(floor($prod * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0"
    def solve(given: String, gk: String, sk: String, out: String) = {
      val sums = ((for (i <- 0 until 4; j <- i until 4)
        yield s"${fsum(s"g.v$i * g.v$j")} AS a$i$j") ++
        (0 until 4).map(i => s"${fsum(s"r.r * g.v$i")} AS b$i")).mkString(",\n                  ")
      s"""
         |, $out AS MATERIALIZED (
         |  SELECT t13.$sk,
         |    ((t13.b0 / t13.d0 - t13.l10 * t13.x1) - t13.l20 * t13.x2) - t13.l30 * t13.x3 AS v0,
         |    t13.x1 AS v1, t13.x2 AS v2, t13.x3 AS v3
         |  FROM (
         |   SELECT t12.*, (t12.y1 / t12.d1 - t12.l21 * t12.x2) - t12.l31 * t12.x3 AS x1 FROM (
         |    SELECT t11.*, t11.y2 / t11.d2 - t11.l32 * t11.x3 AS x2 FROM (
         |     SELECT t10.*, t10.y3 / t10.d3 AS x3 FROM (
         |      SELECT t9.*, ((t9.b3 - t9.l30 * t9.b0) - t9.l31 * t9.y1) - t9.l32 * t9.y2 AS y3 FROM (
         |       SELECT t8.*, (t8.b2 - t8.l20 * t8.b0) - t8.l21 * t8.y1 AS y2 FROM (
         |        SELECT t7.*, t7.b1 - t7.l10 * t7.b0 AS y1 FROM (
         |         SELECT t6.*, (((t6.a33 + 0.1) - t6.l30 * t6.l30 * t6.d0) - t6.l31 * t6.l31 * t6.d1) - t6.l32 * t6.l32 * t6.d2 AS d3 FROM (
         |          SELECT t5.*, ((t5.a23 - t5.l30 * t5.l20 * t5.d0) - t5.l31 * t5.l21 * t5.d1) / t5.d2 AS l32 FROM (
         |           SELECT t4.*, ((t4.a22 + 0.1) - t4.l20 * t4.l20 * t4.d0) - t4.l21 * t4.l21 * t4.d1 AS d2 FROM (
         |            SELECT t3.*, (t3.a12 - t3.l20 * t3.l10 * t3.d0) / t3.d1 AS l21,
         |                         (t3.a13 - t3.l30 * t3.l10 * t3.d0) / t3.d1 AS l31 FROM (
         |             SELECT t2.*, (t2.a11 + 0.1) - t2.l10 * t2.l10 * t2.d0 AS d1 FROM (
         |              SELECT t1.*, t1.a01 / t1.d0 AS l10, t1.a02 / t1.d0 AS l20, t1.a03 / t1.d0 AS l30 FROM (
         |               SELECT s.*, s.a00 + 0.1 AS d0 FROM (
         |                SELECT r.$sk,
         |                  $sums
         |                FROM ratings r JOIN $given g ON g.$gk = r.$gk
         |                GROUP BY r.$sk
         |               ) s
         |              ) t1
         |             ) t2
         |            ) t3
         |           ) t4
         |          ) t5
         |         ) t6
         |        ) t7
         |       ) t8
         |      ) t9
         |     ) t10
         |    ) t11
         |   ) t12
         |  ) t13
         |)""".stripMargin
    }
    val rounds = (1 to iterations).map { it =>
      solve(s"i${it - 1}", "item_id", "user_id", s"u$it") +
        solve(s"u$it", "user_id", "item_id", s"i$it")
    }.mkString
    s"""WITH ratings AS MATERIALIZED (
       |  SELECT o.o_custkey AS user_id, l.l_partkey AS item_id,
       |    CAST(COUNT(*) AS DOUBLE) AS r
       |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
       |  GROUP BY 1, 2
       |), i0 AS (
       |  SELECT DISTINCT item_id, 1.0 AS v0,
       |    CAST(item_id % 11 + 1 AS DOUBLE) / 12.0 AS v1,
       |    CAST(item_id % 15 + 1 AS DOUBLE) / 16.0 AS v2,
       |    CAST(item_id % 19 + 1 AS DOUBLE) / 20.0 AS v3
       |  FROM ratings
       |)$rounds
       |, cohort AS (
       |  SELECT user_id, v0 AS u0, v1 AS u1, v2 AS u2, v3 AS u3
       |  FROM u$iterations WHERE user_id % 100 = 0
       |), scored_t AS (
       |  SELECT c.user_id, i.item_id,
       |    (c.u0 * i.v0 + c.u1 * i.v1 + c.u2 * i.v2 + c.u3 * i.v3) AS score
       |  FROM cohort c, i$iterations i
       |), novel AS (
       |  SELECT s.* FROM scored_t s
       |  LEFT JOIN ratings x ON x.user_id = s.user_id AND x.item_id = s.item_id
       |  WHERE x.item_id IS NULL
       |), ranked AS (
       |  SELECT user_id, item_id, score,
       |    row_number() OVER (PARTITION BY user_id ORDER BY score DESC, item_id) AS rank
       |  FROM novel
       |)
       |SELECT user_id, CAST(rank AS INT) AS rank, item_id AS rec_item_id, score
       |FROM ranked WHERE rank <= 5
       |ORDER BY user_id, rank""".stripMargin
  }

  /** Oracle for `rec_als_implicit`: the explicit oracle's unrolled
    * half-solve chain with the HKV shape — each half-solve adds ONE
    * global-Gram CTE over the given factor table (three fixed-point
    * sums, the YᵀY the dense term collapses into) CROSS JOINed into the
    * per-entity corrections. Confidence literals (1 + 32·r, 32·r) are
    * dyadic on the exact count grid; every expression tree mirrors the
    * Column tree token for token, so the whole confidence-weighted
    * training trace is cross-engine bit-exact, double scores included.
    */
  val recAlsImplicitSql: String = {
    def fsum(prod: String) =
      s"CAST(SUM(CAST(floor($prod * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0"
    def gram(given: String, out: String) =
      s"""
         |, $out AS MATERIALIZED (
         |  SELECT ${fsum("g.v1 * g.v1")} AS g11,
         |    ${fsum("g.v1 * g.v2")} AS g12,
         |    ${fsum("g.v2 * g.v2")} AS g22
         |  FROM $given g
         |)""".stripMargin
    def solve(given: String, gramT: String, gk: String, sk: String, out: String) =
      s"""
         |, $out AS MATERIALIZED (
         |  SELECT t.$sk,
         |    (((t.a22 + 0.1) * t.b1 - t.a12 * t.b2) / t.det) AS v1,
         |    (((-t.a12) * t.b1 + (t.a11 + 0.1) * t.b2) / t.det) AS v2
         |  FROM (
         |    SELECT q.$sk, q.a11, q.a12, q.a22, q.b1, q.b2,
         |      ((q.a11 + 0.1) * (q.a22 + 0.1) - q.a12 * q.a12) AS det
         |    FROM (
         |      SELECT s.$sk,
         |        (g.g11 + s.c11) AS a11, (g.g12 + s.c12) AS a12,
         |        (g.g22 + s.c22) AS a22, s.b1, s.b2
         |      FROM (
         |        SELECT r.$sk,
         |          ${fsum("(32.0 * r.r) * (g.v1 * g.v1)")} AS c11,
         |          ${fsum("(32.0 * r.r) * (g.v1 * g.v2)")} AS c12,
         |          ${fsum("(32.0 * r.r) * (g.v2 * g.v2)")} AS c22,
         |          ${fsum("(1.0 + 32.0 * r.r) * g.v1")} AS b1,
         |          ${fsum("(1.0 + 32.0 * r.r) * g.v2")} AS b2
         |        FROM ratings r JOIN $given g ON g.$gk = r.$gk
         |        GROUP BY r.$sk
         |      ) s CROSS JOIN $gramT g
         |    ) q
         |  ) t
         |)""".stripMargin
    val rounds = (1 to iterations).map { it =>
      gram(s"i${it - 1}", s"gu$it") +
        solve(s"i${it - 1}", s"gu$it", "item_id", "user_id", s"u$it") +
        gram(s"u$it", s"gi$it") +
        solve(s"u$it", s"gi$it", "user_id", "item_id", s"i$it")
    }.mkString
    s"""WITH ratings AS MATERIALIZED (
       |  SELECT o.o_custkey AS user_id, l.l_partkey AS item_id,
       |    CAST(COUNT(*) AS DOUBLE) AS r
       |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
       |  GROUP BY 1, 2
       |), i0 AS (
       |  SELECT DISTINCT item_id, 1.0 AS v1,
       |    CAST(item_id % 7 + 1 AS DOUBLE) / 8.0 AS v2
       |  FROM ratings
       |)$rounds
       |, cohort AS (
       |  SELECT user_id, v1 AS u1, v2 AS u2 FROM u$iterations WHERE user_id % 100 = 0
       |), scored_t AS (
       |  SELECT c.user_id, i.item_id, (c.u1 * i.v1 + c.u2 * i.v2) AS score
       |  FROM cohort c, i$iterations i
       |), novel AS (
       |  SELECT s.* FROM scored_t s
       |  LEFT JOIN ratings x ON x.user_id = s.user_id AND x.item_id = s.item_id
       |  WHERE x.item_id IS NULL
       |), ranked AS (
       |  SELECT user_id, item_id, score,
       |    row_number() OVER (PARTITION BY user_id ORDER BY score DESC, item_id) AS rank
       |  FROM novel
       |)
       |SELECT user_id, CAST(rank AS INT) AS rank, item_id AS rec_item_id, score
       |FROM ranked WHERE rank <= 5
       |ORDER BY user_id, rank""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    "rec_als_topn" -> recAlsTopnSql,
    "rec_als_topn_persisted" -> recAlsTopnSql,
    "rec_als_topn_d4" -> recAlsTopnD4Sql,
    "rec_als_implicit" -> recAlsImplicitSql
  )
}
