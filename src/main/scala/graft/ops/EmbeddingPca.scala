package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.Tables

/** Distributed PCA over the embeddings table — the dimensionality-reduction
  * step a large-scale training-data pipeline runs before clustering or
  * coarse ANN (reference scope: the embeddings surface next to
  * embedding_centroids / ann_topk_*).
  *
  * The scale shape is the textbook one and the reason PCA survives 100 TB:
  *
  *  1. ONE corpus pass computes the sufficient statistics
  *     (n, Σx, Σx·xᵀ) through a typed `Aggregator` whose state is a single
  *     d + d² + 1 double array (d = 64 → 33 KB). Spark runs it as a
  *     partial aggregate: every partition folds its rows map-side and only
  *     the 33 KB states cross the wire — corpus rows never shuffle.
  *  2. The d×d covariance eigendecomposition happens on the DRIVER with a
  *     cyclic Jacobi solver (symmetric 64×64 — microseconds; this is
  *     bounded model state like the k-means centroid collect, not data).
  *  3. Projection back over the corpus is MAP-SIDE: the top-k components
  *     ship as broadcast literals and each row computes k zip_with dot
  *     products locally. Zero exchanges end-to-end except the one
  *     partial-agg reduce.
  *
  * Rows-only (float sums are partitioning-order-dependent in the last
  * ulps, so no cross-engine hash oracle); OpsSpec pins orthonormality of
  * the basis, eigenvalue/variance agreement, descending order, and the
  * eigen residual of every returned pair directly against the
  * covariance matrix.
  */
object EmbeddingPca {

  /** Sufficient-statistics aggregator: state = [n, Σx (d), Σxxᵀ (d²)].
    * Associative and commutative, so partial aggregation is exact modulo
    * double-add rounding order.
    */
  private[graft] class MomentAgg(d: Int)
      extends Aggregator[Seq[Double], Array[Double], Array[Double]] {
    override def zero: Array[Double] = new Array[Double](1 + d + d * d)
    override def reduce(b: Array[Double], x: Seq[Double]): Array[Double] = {
      val xa = x.toArray
      b(0) += 1.0
      var i = 0
      while (i < d) {
        b(1 + i) += xa(i)
        var j = 0
        val row = 1 + d + i * d
        while (j < d) { b(row + j) += xa(i) * xa(j); j += 1 }
        i += 1
      }
      b
    }
    override def merge(a: Array[Double], c: Array[Double]): Array[Double] = {
      var i = 0
      while (i < a.length) { a(i) += c(i); i += 1 }
      a
    }
    override def finish(r: Array[Double]): Array[Double] = r
    override def bufferEncoder: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
    override def outputEncoder: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix (public
    * textbook algorithm — Golub & Van Loan §8.5). Returns (eigenvalues,
    * eigenvectors as COLUMNS), unordered. Deterministic for a given input.
    */
  private[graft] def jacobiEigen(sym: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = sym.length
    val a = sym.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    def off(m: Array[Array[Double]]): Double = {
      var s = 0.0
      var i = 0
      while (i < d) { var j = i + 1; while (j < d) { s += m(i)(j) * m(i)(j); j += 1 }; i += 1 }
      s
    }
    var sweep = 0
    while (off(a) > 1e-18 && sweep < 64) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t =
              if (math.abs(theta) > 1e150) 1.0 / (2.0 * theta)
              else math.signum(theta) / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var i = 0
            while (i < d) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < d) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - s * aqi
              a(q)(i) = s * api + c * aqi
              i += 1
            }
            i = 0
            while (i < d) {
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  /** Top-k eigenpairs of a covariance matrix, eigenvalue-descending, each
    * vector sign-canonicalized (largest-|coordinate| entry positive) so the
    * basis is unique and runs are comparable.
    */
  private[graft] def topComponents(cov: Array[Array[Double]], k: Int): (Array[Double], Array[Array[Double]]) = {
    val d = cov.length
    val (evals, evecs) = jacobiEigen(cov)
    val order = (0 until d).sortBy(i => -evals(i)).take(k)
    val w = order.map { c =>
      val col = Array.tabulate(d)(i => evecs(i)(c))
      val m = col.indices.maxBy(i => (math.abs(col(i)), -i))
      if (col(m) < 0) col.map(x => -x) else col
    }.toArray
    (order.map(evals(_)).toArray, w) // w(j) = j-th component, a d-vector
  }

  /** One sufficient-statistics pass per (session, corpus): embedding_pca
    * and ann_topk_pca share the model exactly like the PQ code index is
    * shared across its consumers (VectorAgg.indexCache). Locked first-fill
    * for the same reason as there: TrieMap.getOrElseUpdate may run a
    * racing thunk twice.
    */
  private val momentsCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), (Long, Array[Double], Array[Array[Double]])]

  /** (n, mean, covariance) of the embedding corpus in one pass. */
  private[graft] def moments(spark: SparkSession, dir: String): (Long, Array[Double], Array[Array[Double]]) =
    momentsCache.synchronized {
      momentsCache.getOrElseUpdate((spark, dir), {
        import spark.implicits._
        val d = 64
        val stats = Tables.embeddings(spark, dir)
          .select($"embedding".cast("array<double>").as("x"))
          .as[Seq[Double]]
          .select(new MomentAgg(d).toColumn)
          .head() // 1 + d + d² doubles — bounded model state, not data
        val n = stats(0)
        val mean = Array.tabulate(d)(i => stats(1 + i) / n)
        val cov = Array.tabulate(d, d)((i, j) => stats(1 + d + i * d + j) / n - mean(i) * mean(j))
        (n.toLong, mean, cov)
      })
    }

  /** The corpus projected onto its top-k principal components. */
  def embeddingPca(spark: SparkSession, dir: String, k: Int = 16): DataFrame = {
    import spark.implicits._
    val (_, mean, cov) = moments(spark, dir)
    val (_, w) = topComponents(cov, k)
    val meanLit = lit(mean)
    val centered = zip_with($"x", meanLit, (x, m) => x - m)
    val projCols = (0 until k).map { j =>
      aggregate(zip_with($"c", lit(w(j)), (x, y) => x * y), lit(0.0), (acc, z) => acc + z)
        .as(s"pc${j + 1}")
    }
    Tables.embeddings(spark, dir)
      .select($"vec_id", $"label", $"embedding".cast("array<double>").as("x"))
      .withColumn("c", centered)
      .select(($"vec_id" +: $"label" +: projCols): _*)
      .orderBy($"vec_id")
  }

  /** df with an added `p` column: `x` (array<double>) projected onto the
    * rows of `w` — map-side, components as literals. UNCENTERED on
    * purpose: for a dot-product metric, pᵤ(a)·pᵤ(b) with pᵤ = Wx equals
    * the centered score plus both cross terms with the mean
    * ((Wμ+p')·(Wμ+q') expands to exactly them), so it estimates the raw
    * dot a·b with only the energy outside the basis lost — whereas
    * ranking by centered projections alone adds a per-candidate bias
    * −μ·(xc−μ) that reorders candidates independent of the truncation.
    */
  private def withProjection(df: DataFrame, w: Array[Array[Double]]): DataFrame = {
    import df.sparkSession.implicits._
    df.withColumn("p", array(w.indices.map(j =>
      aggregate(zip_with($"x", lit(w(j)), (x, y) => x * y), lit(0.0), (acc, z) => acc + z)): _*))
  }

  /** ANN served from the PCA-COMPRESSED index: shortlist in the reduced
    * space, exact re-rank on the shortlist only — the compression axis of
    * the ANN family (vs IVF's partitioning axis and PQ's code axis).
    *
    * Corpus vectors are projected to `kDims` dims map-side (4× smaller
    * index than raw d = 64 — at scale this projection is precomputed and
    * persisted, like the IVF-PQ list tables). The shortlist stage scores
    * reduced-space dot products and keeps top-`shortlist` per query
    * through the bounded-heap [[graft.functions.PartialTopK]] aggregate,
    * so the exchange carries queries×shortlist rows, never the scored
    * candidate stream. Only shortlisted pairs touch the full-width
    * vectors for the exact integer re-rank — identical scoring to
    * ann_topk_exact, so every emitted (query, neighbor, dot) is
    * exact-twin-correct even when a true neighbor is missed (recall,
    * not precision, is the approximation; OpsSpec pins recall@5).
    */
  def annTopkPca(spark: SparkSession, dir: String, kDims: Int = 32, shortlist: Int = 50): DataFrame = {
    import spark.implicits._
    val (_, _, cov) = moments(spark, dir)
    val (_, w) = topComponents(cov, kDims)
    val base = withProjection(
      Tables.embeddings(spark, dir)
        .select($"vec_id", $"embedding".cast("array<double>").as("x")),
      w)
      .select($"vec_id", $"p")
    pcaShortlistRerank(spark, dir, base, shortlist)
  }

  /** Shared serve tail: reduced-space shortlist over a (vec_id, p)
    * projection table (in-session or loaded from the persisted index),
    * then the exact integer re-rank on shortlist pairs only. The
    * shortlist stage goes through the bounded-heap PartialTopK aggregate
    * (exchange = queries×shortlist rows); the re-rank joins only
    * shortlist pairs back to the full-width quantized vectors.
    */
  private def pcaShortlistRerank(spark: SparkSession, dir: String,
      proj: DataFrame, shortlist: Int): DataFrame = {
    import spark.implicits._
    import graft.functions.PartialTopK.partial_topk
    val qs = proj.filter($"vec_id" % 10 === 0)
      .select($"vec_id".as("query_id"), $"p".as("pa"))
    val cs = proj.select($"vec_id".as("neighbor_id"), $"p".as("pb"))

    val short = qs.join(cs, $"query_id" =!= $"neighbor_id")
      .withColumn("rdot",
        aggregate(zip_with($"pa", $"pb", (x, y) => x * y), lit(0.0), (acc, z) => acc + z))
      .groupBy($"query_id")
      .agg(partial_topk(
        struct((-$"rdot").as("neg_rdot"), $"neighbor_id".as("neighbor_id")), shortlist).as("sl"))
      .select($"query_id", explode($"sl.neighbor_id").as("neighbor_id"))

    // exact integer re-rank, shortlist pairs only — scoring shared with
    // the exact twin via the same quantization + codegen dot product
    val quant = LlmQueries.quantized(spark, dir)
    short
      .join(quant.select($"vec_id".as("query_id"), $"v".as("va")), Seq("query_id"))
      .join(quant.select($"vec_id".as("neighbor_id"), $"v".as("vb")), Seq("neighbor_id"))
      .withColumn("dot", graft.functions.LongVectorDot.vector_dot($"va", $"vb"))
      .groupBy($"query_id")
      .agg(partial_topk(
        struct((-$"dot").as("neg_dot"), $"neighbor_id".as("neighbor_id"), $"dot".as("dot")), 5).as("topk"))
      .select($"query_id", posexplode($"topk").as(Seq("pos", "s")))
      .select($"query_id", ($"pos" + 1).cast("int").as("rank"),
        $"s.neighbor_id".as("neighbor_id"), $"s.dot".as("dot"))
      .orderBy($"query_id", $"rank")
  }

  /** Persist the PCA model + the projected corpus as the two parquet
    * tables of a serving index — [[ScaleDedup.saveBandIndex]]'s
    * train/serve split applied to the compression axis:
    *
    *  - `components/` (component, eigenvalue, w): the top-k basis —
    *    k·d doubles of bounded model state, written once;
    *  - `projected/`  (vec_id, p): the corpus in reduced space — the
    *    4×-smaller table shortlist queries scan instead of the corpus.
    *
    * At 100 TB this is the point of PCA: the moments pass and the
    * projection run ONCE at landing; every later ANN query reads only
    * the compressed table (plus full-width vectors for the shortlisted
    * re-rank pairs). New corpus batches append their projections using
    * the saved basis — no retrain (the spectrum drifts slowly; re-run
    * the landing job to refresh, like the band index).
    */
  def savePcaIndex(spark: SparkSession, dir: String, indexPath: String, kDims: Int = 32): Unit = {
    import spark.implicits._
    val (_, _, cov) = moments(spark, dir)
    val (evals, w) = topComponents(cov, kDims)
    w.indices.map(j => (j + 1, evals(j), w(j).toSeq))
      .toDF("component", "eigenvalue", "w")
      .write.mode("overwrite").parquet(s"$indexPath/components")
    withProjection(
      Tables.embeddings(spark, dir)
        .select($"vec_id", $"embedding".cast("array<double>").as("x")),
      w)
      .select($"vec_id", $"p")
      .write.mode("overwrite").parquet(s"$indexPath/projected")
  }

  /** GDPR DELETE for the PCA index — the [[VectorAgg.deleteFromIvfPqIndex]]
    * shape: the ids' rows drop from the `projected/` table (the
    * `components/` model holds no per-vector rows and stays
    * byte-identical); idempotent, returns rows removed.
    */
  def deleteFromPcaIndex(spark: SparkSession, indexPath: String,
      vecIds: Seq[Long]): Long = {
    import spark.implicits._
    val proj = spark.read.parquet(s"$indexPath/projected")
    val n = proj.filter($"vec_id".isin(vecIds: _*)).count()
    if (n > 0)
      AtomicRewrite.overwrite(
        proj.filter(!$"vec_id".isin(vecIds: _*))
          .localCheckpoint(), // pin before replacing the dir being read
        s"$indexPath/projected")
    n
  }

  /** Append a batch of NEW vectors to an existing PCA index — the
    * maintenance half of the continuous-ingestion loop, exactly
    * [[ScaleDedup.appendToBandIndex]]'s contract: project the batch with
    * the SAVED basis (read from `components/` — no retrain, no moments
    * pass) and append only the batch's rows to `projected/`. Serve-side
    * plans are unchanged; the basis drifts only as much as the spectrum
    * does, and a landing-job re-run refreshes it (AnnSpec pins that
    * save → append equals projecting the union corpus in-session with
    * the same basis).
    *
    * `vecs` must have (vec_id, embedding array<float|double>).
    */
  def appendToPcaIndex(vecs: DataFrame, indexPath: String): Unit = {
    import vecs.sparkSession.implicits._
    val spark = vecs.sparkSession
    val comps = spark.read.parquet(s"$indexPath/components")
      .select($"component", $"w").collect()
      .sortBy(_.getAs[Int]("component"))
      .map(_.getAs[scala.collection.Seq[Double]]("w").toArray) // k·d doubles — bounded model state
    withProjection(
      vecs.select($"vec_id", $"embedding".cast("array<double>").as("x")),
      comps)
      .select($"vec_id", $"p")
      .write.mode("append").parquet(s"$indexPath/projected")
  }

  /** ANN served from the LOADED projection table — no moments pass, no
    * projection at query time. Same shortlist + exact re-rank tail as
    * the in-session twin (OpsSpec pins row parity).
    */
  def annTopkPcaFromIndex(spark: SparkSession, dir: String, indexPath: String,
      shortlist: Int = 50): DataFrame =
    pcaShortlistRerank(spark, dir,
      spark.read.parquet(s"$indexPath/projected"), shortlist)

  private val savedPcaIndexes =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), String]

  /** The §2 entry for the persisted path: project ONCE per (session, dir)
    * — first-save under a lock, pid- and session-scoped path, the
    * [[VectorAgg.annTopkIvfPqPersisted]] contract — then serve the query
    * from the loaded table end-to-end.
    */
  def annTopkPcaPersisted(spark: SparkSession, dir: String): DataFrame = {
    val indexPath = savedPcaIndexes.synchronized {
      savedPcaIndexes.getOrElseUpdate((spark, dir), {
        val p = s"${System.getProperty("java.io.tmpdir")}/graft_pca_index_" +
          graft.Tables.dirKey(dir) +
          "_" + ProcessHandle.current().pid() +
          "_" + Integer.toHexString(System.identityHashCode(spark))
        savePcaIndex(spark, dir, p)
        p
      })
    }
    annTopkPcaFromIndex(spark, dir, indexPath)
  }

  /** Hard-negative mining for contrastive embedding training: for every
    * anchor (vec_id ≡ 0 mod 10, the ANN query slice), the top-3 most
    * similar vectors from a DIFFERENT cluster label — the pairs that sit
    * closest to the decision boundary and carry the training signal.
    *
    * Scoring is the same exact integer quantized dot as ann_topk_exact
    * (oracle hash-checked); the rank stage is the bounded-heap
    * [[graft.functions.PartialTopK]] aggregate, so the exchange carries
    * anchors×3 rows, never the scored stream. At 100 TB the candidate
    * join composes with the IVF cell equi-join exactly like annTopkIvf
    * (probe cells, mine within); the brute-force pairing here is the
    * declared correctness baseline, like the rest of the exact ANN
    * family.
    */
  def mineHardNegatives(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.functions.PartialTopK.partial_topk
    val q = LlmQueries.quantized(spark, dir)
    val anchors = q.filter($"vec_id" % 10 === 0)
      .select($"vec_id".as("anchor_id"), $"label".as("anchor_label"), $"v".as("va"))
    val cands = q.select($"vec_id".as("negative_id"), $"label".as("negative_label"), $"v".as("vb"))
    anchors.join(cands, $"anchor_label" =!= $"negative_label")
      .withColumn("dot", graft.functions.LongVectorDot.vector_dot($"va", $"vb"))
      .groupBy($"anchor_id", $"anchor_label")
      .agg(partial_topk(
        struct((-$"dot").as("neg_dot"), $"negative_id".as("negative_id"),
          $"negative_label".as("negative_label"), $"dot".as("dot")), 3).as("topk"))
      .select($"anchor_id", $"anchor_label", posexplode($"topk").as(Seq("pos", "s")))
      .select($"anchor_id", $"anchor_label", ($"pos" + 1).cast("int").as("rank"),
        $"s.negative_id".as("negative_id"), $"s.negative_label".as("negative_label"),
        $"s.dot".as("dot"))
      .orderBy($"anchor_id", $"rank")
  }

  /** The IVF-composed form of [[mineHardNegatives]] — the scale path the
    * exact twin's scaladoc promises: candidates come from the anchor's
    * `probeCells` nearest k-means cells (the same trained centroids and
    * map-side broadcast argmin as [[VectorAgg.annTopkKmeans]]), so
    * candidate work per anchor is probed-cell occupancy, never the
    * corpus. Scoring, label screen, and the bounded-heap top-3 rank are
    * IDENTICAL to the exact twin — recall (pinned by AnnSpec against the
    * exact form), not precision, is the approximation: every emitted
    * negative really is a cross-label vector with its exact integer dot.
    *
    * (anchor, candidate) pairs are unique by construction — a candidate
    * lives in exactly one cell and an anchor's probed cells are distinct
    * — so there is no dedup shuffle.
    */
  def mineHardNegativesIvf(spark: SparkSession, dir: String, probeCells: Int = 3): DataFrame = {
    import spark.implicits._
    import graft.functions.PartialTopK.partial_topk
    import graft.functions.LongVectorDot.vector_dot
    val q = LlmQueries.quantized(spark, dir)
      .select($"vec_id", $"label", $"v")
    val cells = VectorAgg.kmeansCells(spark, dir, k = 16, iters = 2)
    val ranked = VectorAgg.withCellRank(q, cells)
    val cands = ranked.select($"vec_id".as("negative_id"), $"label".as("negative_label"),
      $"v".as("vb"), element_at($"cellRank", 1).getField("cell").as("cell"))
    val anchors = ranked.filter($"vec_id" % 10 === 0)
      .select($"vec_id".as("anchor_id"), $"label".as("anchor_label"), $"v".as("va"),
        explode(transform(slice($"cellRank", 1, probeCells), s => s.getField("cell"))).as("cell"))
    anchors.join(cands, Seq("cell"))
      .filter($"anchor_label" =!= $"negative_label")
      .withColumn("dot", vector_dot($"va", $"vb"))
      .groupBy($"anchor_id", $"anchor_label")
      .agg(partial_topk(
        struct((-$"dot").as("neg_dot"), $"negative_id".as("negative_id"),
          $"negative_label".as("negative_label"), $"dot".as("dot")), 3).as("topk"))
      .select($"anchor_id", $"anchor_label", posexplode($"topk").as(Seq("pos", "s")))
      .select($"anchor_id", $"anchor_label", ($"pos" + 1).cast("int").as("rank"),
        $"s.negative_id".as("negative_id"), $"s.negative_label".as("negative_label"),
        $"s.dot".as("dot"))
      .orderBy($"anchor_id", $"rank")
  }

  val mineHardNegativesSql: String =
    s"""${LlmQueries.quantizedCte}, scored AS (
       |  SELECT a.vec_id AS anchor_id, a.label AS anchor_label,
       |    b.vec_id AS negative_id, b.label AS negative_label,
       |    CAST(list_sum(list_transform(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i])) AS BIGINT) AS dot
       |  FROM n a JOIN n b ON a.vec_id % 10 = 0 AND a.label <> b.label
       |), ranked AS (
       |  SELECT anchor_id, anchor_label, negative_id, negative_label, dot,
       |    row_number() OVER (PARTITION BY anchor_id ORDER BY dot DESC, negative_id) AS rank
       |  FROM scored
       |)
       |SELECT anchor_id, anchor_label, rank, negative_id, negative_label, dot
       |FROM ranked WHERE rank <= 3
       |ORDER BY anchor_id, rank""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "embedding_pca"           -> ((s, d) => embeddingPca(s, d)),
    "ann_topk_pca"            -> ((s, d) => annTopkPca(s, d)),
    "mine_hard_negatives"     -> (mineHardNegatives _),
    "mine_hard_negatives_ivf" -> ((s, d) => mineHardNegativesIvf(s, d)),
    "ann_topk_pca_persisted"  -> (annTopkPcaPersisted _)
  )

  /** Oracle for `mine_hard_negatives_ivf` (PROMOTED r11-cont): the
    * shared integer-exact Lloyd cells, 3-deep anchor probe, cross-label
    * filter, exact-dot top-3 — the cell-blocked composition hash-checks
    * like its brute-force twin.
    */
  val mineHardNegativesIvfSql: String =
    graft.ops.VectorAgg.kmeansRankedCellsCte +
      s"""
         |, cands AS (
         |  SELECT vec_id AS negative_id, label AS negative_label, v AS vb, cell
         |  FROM ranked_cells WHERE rn = 1
         |), anchors AS (
         |  SELECT vec_id AS anchor_id, label AS anchor_label, v AS va, cell
         |  FROM ranked_cells WHERE vec_id % 10 = 0 AND rn <= 3
         |), scored AS (
         |  SELECT a.anchor_id, a.anchor_label, c.negative_id, c.negative_label,
         |    ${graft.ops.VectorAgg.sqlDot("a.va", "c.vb")} AS dot
         |  FROM anchors a JOIN cands c USING (cell)
         |  WHERE a.anchor_label <> c.negative_label
         |), ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY anchor_id ORDER BY dot DESC, negative_id) AS rank
         |  FROM scored
         |)
         |SELECT anchor_id, anchor_label, CAST(rank AS INT) AS rank,
         |  negative_id, negative_label, dot
         |FROM ranked WHERE rank <= 3 ORDER BY anchor_id, rank""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "mine_hard_negatives" -> mineHardNegativesSql,
    "mine_hard_negatives_ivf" -> mineHardNegativesIvfSql
  )
}
