package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.LongVectorDot.vector_dot
import graft.functions.PartialTopK.partial_topk

/** k-nearest-neighbor GRAPH construction over the embedding corpus — the
  * backbone structure behind semantic clustering, agglomerative near-dup
  * grouping, diversity sampling, and graph-based label propagation
  * (every SemDeDup-style pipeline builds one before it prunes).
  *
  * Unlike the ANN query family ([[graft.ops.VectorAgg]]), where a SMALL
  * query set probes a large corpus, the kNN graph ranks neighbors for
  * EVERY corpus vector — so the scale axis is the candidate-generation
  * bound, not the query count:
  *
  *   - `knn_graph_exact` — the correctness baseline: all-pairs fused
  *     integer dots, per-vector top-k through the bounded-heap
  *     [[graft.functions.PartialTopK]] aggregate (exchange carries ≤ k
  *     rows per (vector, partition), never the n² candidate stream), plus
  *     a `mutual` flag (edge present in BOTH directions — the robust edge
  *     set mutual-kNN clustering uses). DuckDB-oracle hash-exact.
  *     Quadratic by contract, like the exact-Jaccard pair oracles: it
  *     exists to gate the bounded twin and is excluded from the bench.
  *   - `knn_graph_ivf` — the 100 TB form: every vector probes its 3
  *     nearest k-means cells (the session's shared Lloyd index, assignment
  *     map-side broadcast-argmin), candidates are probed-cell occupants
  *     meeting in a cell equi-join, same top-k tail. Candidate work per
  *     vector is probed-cell occupancy — Σ occupancy² total, the SemDeDup
  *     bound — instead of n². Recall vs the exact twin pinned by KnnSpec.
  *   - `knn_graph_clusters` — mutual-kNN connected components over the
  *     IVF graph's edge set: mutual edges become 2-row buckets for the
  *     shared [[ScaleDedup.ccKeepers]] min-label propagation (O(log
  *     diameter) rounds), singletons keep themselves, cluster sizes from
  *     one bounded groupBy joined back. The output is the cluster
  *     assignment a semantic-dedup or stratified-sampling stage consumes.
  *
  * Reference anchor: the reference pipeline has no vector surface at all
  * (its nearest analog is variant grouping, track_parent_select.py:1-28 —
  * exact-key self-grouping); this family is part of the LLM-data-pipeline
  * surface the engine adds on top.
  */
object KnnGraph {

  private val K = 4

  /** Per-vector top-K neighbor edges from a scored (vec_id, neighbor_id,
    * dot) stream via the bounded-heap partial aggregate; ties broken by
    * neighbor_id asc, ranks 1-based.
    */
  private def topkEdges(scored: DataFrame): DataFrame = {
    import scored.sparkSession.implicits._
    scored
      .groupBy($"vec_id")
      .agg(partial_topk(
        struct((-$"dot").as("neg_dot"), $"neighbor_id".as("neighbor_id"), $"dot".as("dot")),
        K).as("topk"))
      .select($"vec_id", posexplode($"topk").as(Seq("pos", "s")))
      .select($"vec_id", ($"pos" + 1).cast("int").as("rank"),
        $"s.neighbor_id".as("neighbor_id"), $"s.dot".as("dot"))
  }

  /** Session-lifetime cache of the exact graph (the persisted-index-cache
    * discipline): at production scale the exact kNN graph is a landed
    * artifact the analytics jobs read, not something each of the seven
    * graph-analytics entries rebuilds with its own corpus² scored join.
    * The `knn_graph_exact` ENTRY still builds fresh — its bench row
    * measures the build; the analytics entries serve from this pin.
    */
  private val exactGraphCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  private[graft] def exactGraphOf(spark: SparkSession, dir: String): DataFrame =
    exactGraphCache.synchronized {
      exactGraphCache.getOrElseUpdate((spark, dir),
        knnGraphExact(spark, dir).localCheckpoint())
    }

  /** Exact kNN graph (k=4) with the mutual-edge flag. The mutual check is
    * an equi-join of the n·k edge table against its own reversal — bounded
    * output, never touches the candidate stream.
    */
  def knnGraphExact(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val q = VectorAgg.quantized(spark, dir)
    val a = q.select($"vec_id", $"v".as("va"))
    val b = q.select($"vec_id".as("neighbor_id"), $"v".as("vb"))
    val scored = a.join(b, $"vec_id" =!= $"neighbor_id")
      .withColumn("dot", vector_dot($"va", $"vb"))
    withMutual(topkEdges(scored))
      .orderBy($"vec_id", $"rank")
  }

  private def withMutual(knn: DataFrame): DataFrame = {
    import knn.sparkSession.implicits._
    val back = knn.select($"vec_id".as("_b_src"), $"neighbor_id".as("_b_dst"))
    knn.join(back,
        knn("neighbor_id") === back("_b_src") && knn("vec_id") === back("_b_dst"),
        "left")
      .select($"vec_id", $"rank", $"neighbor_id", $"dot", $"_b_src".isNotNull.as("mutual"))
  }

  val knnGraphExactSql: String =
    s"""${LlmQueries.quantizedCte}, scored AS (
       |  SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
       |    CAST(list_sum(list_transform(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i])) AS BIGINT) AS dot
       |  FROM n a JOIN n b ON a.vec_id <> b.vec_id
       |), ranked AS (
       |  SELECT vec_id, neighbor_id, dot,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, neighbor_id) AS rank
       |  FROM scored
       |), knn AS (
       |  SELECT * FROM ranked WHERE rank <= $K
       |)
       |SELECT k.vec_id, CAST(k.rank AS INTEGER) AS rank, k.neighbor_id, k.dot,
       |  (m.vec_id IS NOT NULL) AS mutual
       |FROM knn k LEFT JOIN knn m
       |  ON m.vec_id = k.neighbor_id AND m.neighbor_id = k.vec_id
       |ORDER BY k.vec_id, k.rank""".stripMargin

  /** The IVF-bounded kNN graph: candidates restricted to each vector's 3
    * nearest k-means cells. Shares the session's cached Lloyd index
    * (k=16, iters=2) with the ANN family, so graph construction costs one
    * map-side assignment pass + the cell equi-join — the corpus never
    * self-joins unbounded.
    */
  def knnGraphIvf(spark: SparkSession, dir: String): DataFrame =
    withMutual(ivfEdges(spark, dir)).orderBy(col("vec_id"), col("rank"))

  private def ivfEdges(spark: SparkSession, dir: String): DataFrame =
    ivfEdgesOf(spark, dir, VectorAgg.quantized(spark, dir))

  /** Core over an injectable corpus slice (the saveKnnGraphOf append spec
    * builds the landed-half graph this way). Cells come from the
    * session's shared Lloyd index for `dir` — the coarse quantizer is
    * trained once per corpus, the FAISS IVF discipline.
    */
  private[graft] def ivfEdgesOf(spark: SparkSession, dir: String, q: DataFrame): DataFrame = {
    import spark.implicits._
    val cells = VectorAgg.kmeansCells(spark, dir, k = 16, iters = 2)
    val ranked = VectorAgg.withCellRank(q, cells)
    val assigned = ranked.select($"vec_id".as("neighbor_id"), $"v".as("vb"),
      element_at($"cellRank", 1).getField("cell").as("cell"))
    // 5-of-16-cell probe: the kNN graph is the hardest recall case in the
    // ANN family — EVERY vector queries, including the cell-boundary ones
    // whose rank-3/4 neighbors sit across the Voronoi edge — so it probes
    // deeper than the 2-3 cells the query-style entries use (still a >3×
    // candidate reduction; the probe depth, not the machinery, is the knob)
    val probed = ranked
      .select($"vec_id", $"v".as("va"),
        explode(transform(slice($"cellRank", 1, 5), s => s.getField("cell"))).as("cell"))
    // each neighbor lives in exactly one cell and a vector's probed cells
    // are distinct → every (vec, neighbor) pair appears at most once: no
    // dedup shuffle before the top-k aggregate
    val scored = probed.join(assigned, Seq("cell"))
      .filter($"vec_id" =!= $"neighbor_id")
      .withColumn("dot", vector_dot($"va", $"vb"))
    topkEdges(scored)
  }

  /** Mutual-kNN clusters over the IVF graph: undirected mutual edges →
    * min-label connected components ([[ScaleDedup.ccKeepers]]), singleton
    * vectors keep themselves, sizes from a bounded per-keeper rollup.
    */
  def knnGraphClusters(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // round 11: the EXACT mutual edge base (the kcore promotion's
    // rationale — the same oracle-expressible graph the triangle/
    // assortativity entries analyze), which makes the CC labels
    // hash-gated against a DuckDB reachability-closure oracle; the
    // IVF-built graph stays the 100 TB construction path with its own
    // entry (knn_graph_ivf — communities and pagerank moved to the
    // exact base with the rest of the analytics family this round)
    val knn = exactGraphOf(spark, dir)
    // materialize the edge table BEFORE label propagation: ccKeepers
    // re-reads its input every round, and without this each CC round
    // would recompute the whole kNN-graph build (scored join + top-k +
    // mutual join) — measured 32 s vs ~2 s at sf0.1
    val edges = knn.filter($"mutual" && $"vec_id" < $"neighbor_id")
      .select($"vec_id".as("a"), $"neighbor_id".as("b"))
      .localCheckpoint()
    val bands = edges.select($"a".as("doc_id"), lit(0L).as("band"), struct($"a", $"b").as("band_key"))
      .union(edges.select($"b".as("doc_id"), lit(0L).as("band"), struct($"a", $"b").as("band_key")))
    val keepers = ScaleDedup.ccKeepers(bands)
    val all = VectorAgg.quantized(spark, dir).select($"vec_id")
    val labeled = all.join(keepers.withColumnRenamed("doc_id", "vec_id"), Seq("vec_id"), "left")
      .select($"vec_id", coalesce($"keeper", $"vec_id").as("cluster"))
    val sizes = labeled.groupBy($"cluster").agg(count(lit(1)).as("cluster_size"))
    labeled.join(sizes, Seq("cluster"))
      .select($"vec_id", $"cluster", $"cluster_size")
      .orderBy($"vec_id")
  }

  /** Total rank mass, as a scaled integer. The whole PageRank runs in
    * EXACT integer arithmetic (shares and the damping factor by floor
    * division), so every iteration is deterministic under any partitioning
    * — a float PageRank would drift with partial-agg summation order and
    * could never be pinned exactly against a reference.
    */
  private val PrScale = 1000000000000L // 10¹², headroom: 17·Σshares < 2⁶³
  private val PrIters = 8

  /** PageRank over the IVF kNN graph — graph centrality as an engine
    * shape (the representativeness signal diversity-aware sampling and
    * corpus curation rank clusters by). Damping 17/20; per iteration
    *   share(u) = r(u) div out(u),
    *   r'(v)    = base + (17 · Σ_{u→v} share(u)) div 20,
    * with base = (3·PrScale div 20) div N the teleport mass. Every node
    * has k out-edges (a kNN graph has no dangling nodes), floor division
    * leaks O(1) mass per (node, iteration) — the documented one-sided
    * trade, same family as the hashed-gram 2⁻⁶⁴ caveat.
    *
    * Scale shape: the static (src, dst, out) edge table is built once
    * (out-degree from one bounded groupBy); each of the k iterations is
    * ONE equi-join of the n-row rank table to the edge table on src plus
    * ONE partial-agg groupBy on dst — the canonical distributed PageRank;
    * the edge table pre-partitions by src ONCE (PinnedLayout, r12 — made
    * real, not just documented) so each round's join is co-located and
    * only the n-row rank vector moves (plan-pinned). Rank tables
    * localCheckpoint per round (the Lloyd discipline: plan depth O(1) per
    * iteration). KnnGraphSpec pins rank-for-rank equality with a
    * single-threaded reference of the same integer recurrence, plus the
    * mass-conservation bound.
    */
  def knnGraphPagerank(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // r11: exact directed edge base (the graph-analytics family's shared
    // pinned graph) — which, because the recurrence is exact integer
    // arithmetic, makes even iterative CENTRALITY hash-gated: the DuckDB
    // oracle unrolls the same 8 rounds over the same edges
    val edges = exactGraphOf(spark, dir).select($"vec_id".as("src"), $"neighbor_id".as("dst"))
    val outDeg = edges.groupBy($"src").agg(count(lit(1)).as("out"))
    // r12: the static edge table pins its src-hash layout ONCE (the ALS
    // discipline, PinnedLayout) — each round's join then streams it in
    // place and only the n-row rank table crosses the wire (plan-pinned
    // in KnnGraphSpec); before this the "pre-partitions by src" claim
    // was doc-only and every round re-shuffled the n·k edges
    val edgesDeg = graft.plans.PinnedLayout.pinByKey(edges.join(outDeg, Seq("src")), "src")
    val nodes = VectorAgg.quantized(spark, dir).select($"vec_id").localCheckpoint()
    val n = nodes.count() // bounded driver pull: one long, the Lloyd contract
    val r0 = PrScale / n
    val base = (3L * PrScale / 20L) / n
    var ranks = nodes.select($"vec_id", lit(r0).as("r")).localCheckpoint()
    for (_ <- 1 to PrIters) {
      ranks = prRound(edgesDeg, ranks, nodes, base).localCheckpoint()
    }
    ranks.select($"vec_id", $"r".as("rank_scaled")).orderBy($"vec_id")
  }

  /** One PageRank round over the pinned edge table — factored out so the
    * spec can plan-pin the iteration shape: the rank table SHUFFLE_HASH
    * builds into the edges' layout (no broadcast of ranks, no exchange
    * beneath the edge side), the dst groupBy ships map-combined mass.
    */
  private[graft] def prRound(edgesDeg: DataFrame, ranks: DataFrame,
      nodes: DataFrame, base: Long): DataFrame = {
    import edgesDeg.sparkSession.implicits._
    val incoming = edgesDeg
      .join(ranks.withColumnRenamed("vec_id", "src").hint("shuffle_hash"), Seq("src"))
      .select($"dst", expr("r div out").as("share")) // integer floor; r, out > 0
      .groupBy($"dst").agg(sum($"share").as("in_mass"))
    nodes
      .join(incoming.withColumnRenamed("dst", "vec_id"), Seq("vec_id"), "left")
      .select($"vec_id",
        expr(s"$base + 17 * coalesce(in_mass, CAST(0 AS BIGINT)) div 20").as("r"))
  }

  /** The PageRank recurrence mirrored in DuckDB — possible ONLY because
    * the Spark side runs in exact integer arithmetic (floor-division
    * shares and damping): 8 rounds unroll as MATERIALIZED CTEs (the
    * kcore discipline — each round references the previous one through
    * a join and would otherwise inline exponentially), every round ONE
    * share join + ONE grouped sum + the teleport-base rebuild, all
    * BIGINT (each SUM cast immediately — the §5 HUGEINT rule). Same
    * edges (the exact directed kNN graph), same constants, same
    * truncation points ⇒ hash-identical ranks.
    */
  val knnGraphPagerankSql: String = {
    val rounds = (1 to PrIters).map { i =>
      s""", inc$i AS MATERIALIZED (
         |  SELECT k.neighbor_id AS vec_id,
         |    CAST(SUM(r.r // d.outd) AS BIGINT) AS in_mass
         |  FROM knn k
         |  JOIN pr${i - 1} r ON r.vec_id = k.vec_id
         |  JOIN deg d ON d.vec_id = k.vec_id
         |  GROUP BY k.neighbor_id)
         |, pr$i AS MATERIALIZED (
         |  SELECT nn.vec_id,
         |    CAST(((3 * $PrScale // 20) // cnt.nv)
         |      + (17 * COALESCE(i.in_mass, 0)) // 20 AS BIGINT) AS r
         |  FROM n nn CROSS JOIN cnt LEFT JOIN inc$i i ON i.vec_id = nn.vec_id)""".stripMargin
    }.mkString("\n")
    s"""${LlmQueries.quantizedCte}, scored AS (
       |  SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
       |    CAST(list_sum(list_transform(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i])) AS BIGINT) AS dot
       |  FROM n a JOIN n b ON a.vec_id <> b.vec_id
       |), ranked AS (
       |  SELECT vec_id, neighbor_id, dot,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, neighbor_id) AS rank
       |  FROM scored
       |), knn AS MATERIALIZED (
       |  SELECT vec_id, neighbor_id FROM ranked WHERE rank <= $K
       |), cnt AS (SELECT CAST(COUNT(*) AS BIGINT) AS nv FROM n)
       |, deg AS MATERIALIZED (
       |  SELECT vec_id, CAST(COUNT(*) AS BIGINT) AS outd FROM knn GROUP BY vec_id
       |), pr0 AS MATERIALIZED (
       |  SELECT nn.vec_id, CAST($PrScale // cnt.nv AS BIGINT) AS r
       |  FROM n nn CROSS JOIN cnt)
       |$rounds
       |SELECT vec_id, r AS rank_scaled FROM pr$PrIters ORDER BY vec_id""".stripMargin
  }

  /** HITS value grid: 10⁹ keeps every half-round's gather sum exact in
    * BIGINT to ~9·10⁹ nodes (values are ≤ HitsScale after quantization,
    * so Σ over in-edges ≤ n·HitsScale < 2⁶³) — wider than PageRank's
    * 10¹² grid because HITS sums UNNORMALIZED neighbor values where
    * PageRank's shares always total one rank mass.
    */
  private val HitsScale = 1000000000L
  private val HitsIters = 8

  /** HITS hubs & authorities over the kNN graph — the SECOND centrality
    * beside PageRank, and the one that separates the two roles PageRank
    * conflates: an AUTHORITY is a vector many good hubs point at (a
    * prototype — what a curation pass keeps), a HUB points at many good
    * authorities (a connector spanning regions — what diversity sampling
    * wants). On a directed kNN graph the two genuinely differ: out-degree
    * is fixed at k but IN-degree concentrates on central vectors.
    *
    * Kleinberg normalizes by the L2 norm each round — a sqrt the exact
    * hash-gate discipline cannot cross. This runs the SAME mutual
    * recurrence on an integer grid: each half-round gathers the partner
    * score over the edges (exact BIGINT sums), then MAX-quantizes back to
    * the [0, HitsScale] grid by floor division with d = max div S + 1 —
    * normalization by the sup-norm instead of L2, which rescales rounds
    * but preserves the fixed-point DIRECTION the power iteration
    * converges to (both norms quotient the same ray; floor quantization
    * is the documented one-sided O(2⁻³⁰) trade, the PageRank family's).
    *
    * Scale shape: TWO pinned copies of the static n·k edge table (src-
    * and dst-hash — each half-round joins on a different key; pinned
    * ONCE, the r12 PageRank/LP discipline), each round = two equi-joins
    * of the n-row score vector into a pinned layout + two map-combined
    * grouped sums + a 1-row max broadcast; score tables localCheckpoint
    * per half-round (O(1) plan depth). Hash-gated: the 8 rounds unroll
    * as 16 gather + 16 quantize MATERIALIZED CTEs over the same exact
    * edges, same constants, same truncation points.
    */
  def knnGraphHits(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val edges = exactGraphOf(spark, dir)
      .select($"vec_id".as("src"), $"neighbor_id".as("dst"))
    val eBySrc = graft.plans.PinnedLayout.pinByKey(edges, "src")
    val eByDst = graft.plans.PinnedLayout.pinByKey(edges, "dst")
    val nodes = VectorAgg.quantized(spark, dir).select($"vec_id").localCheckpoint()
    // A node absent from a score table is an implicit ZERO: it gathers
    // nothing and contributes nothing, so the rounds never need the
    // zero-fill join — only the final output does (r12 perf pass: the
    // per-half-round nodes-join + 1-row broadcast were most of the
    // entry's wall time at test scale; the divisor is ONE long — the
    // Lloyd bounded-pull contract).
    var hub = nodes.select($"vec_id", lit(HitsScale).as("x")).localCheckpoint()
    var auth: DataFrame = null
    for (_ <- 1 to HitsIters) {
      auth = hitsGather(eBySrc, hub, "src", "dst")
      hub = hitsGather(eByDst, auth, "dst", "src")
    }
    // Edgeless graph: the oracle's per-round divisor is NULL (MAX over an
    // empty gather), so its scores degrade to NULL — mirror that here
    // instead of zero-filling; on any non-empty graph d >= 1 and a node
    // that gathers nothing is a genuine 0 in BOTH engines.
    val zeroFill: Column => Column =
      if (edges.isEmpty) _ => lit(null).cast("long") else coalesce(_, lit(0L))
    nodes
      .join(hub.withColumnRenamed("x", "hub_scaled"), Seq("vec_id"), "left")
      .join(auth.withColumnRenamed("x", "auth_scaled"), Seq("vec_id"), "left")
      .select($"vec_id", zeroFill($"hub_scaled").as("hub_scaled"),
        zeroFill($"auth_scaled").as("auth_scaled"))
      .orderBy($"vec_id")
  }

  /** One HITS half-round over a pinned edge copy: the ≤ n-row score
    * table (vec_id, x) SHUFFLE_HASH builds into the edges' `joinKey`
    * layout (no broadcast of it, no exchange beneath the edge side —
    * the prRound contract, spec plan-pinned), mass sums per `groupKey`
    * map-combined and CHECKPOINTED, then the sup-norm divisor pulls as
    * one long and the quantize is a lazy literal projection over the
    * checkpointed raw table (absent node = implicit zero).
    */
  /** The lazy gather plan (join + grouped sum), split out so the spec
    * can plan-pin the round shape pre-checkpoint.
    */
  private[graft] def hitsRawGather(edgesPinned: DataFrame, values: DataFrame,
      joinKey: String, groupKey: String): DataFrame = {
    import edgesPinned.sparkSession.implicits._
    edgesPinned
      .join(values.withColumnRenamed("vec_id", joinKey).hint("shuffle_hash"),
        Seq(joinKey))
      .groupBy(col(groupKey)).agg(sum($"x").as("raw"))
  }

  private[graft] def hitsGather(edgesPinned: DataFrame, values: DataFrame,
      joinKey: String, groupKey: String): DataFrame = {
    import edgesPinned.sparkSession.implicits._
    val raw = hitsRawGather(edgesPinned, values, joinKey, groupKey).localCheckpoint()
    // coalesce: an edgeless graph yields an empty gather → NULL max; d=1
    // keeps the divide defined (raw is empty, so the round stays empty —
    // the sparse absent-node-is-zero form the oracle zero-fill matches).
    val d = raw.agg(expr(
        s"coalesce(max(raw) div $HitsScale + CAST(1 AS BIGINT), CAST(1 AS BIGINT))"))
      .head().getLong(0)
    raw.select(col(groupKey).as("vec_id"), expr(s"raw div $d").as("x"))
  }

  /** The HITS recurrence mirrored in DuckDB — same exact edges, same
    * integer grid, same floor-quantization points as the Spark side, so
    * iterative hub/authority centrality is hash-gated like PageRank: 8
    * rounds unroll as 16 gather + 16 quantize MATERIALIZED CTEs (the
    * kcore discipline), every SUM cast immediately (the §5 HUGEINT
    * rule), the per-half-round divisor a 1-row CROSS JOIN scalar (the
    * oracle keeps the explicit zero-fill form; absent-node-is-zero
    * makes the Spark rounds' sparse form value-identical).
    */
  val knnGraphHitsSql: String = {
    val rounds = (1 to HitsIters).map { i =>
      s""", ar$i AS MATERIALIZED (
         |  SELECT k.neighbor_id AS vec_id, CAST(SUM(h.h) AS BIGINT) AS raw
         |  FROM knn k JOIN h${i - 1} h ON h.vec_id = k.vec_id
         |  GROUP BY 1)
         |, ad$i AS (SELECT CAST(MAX(raw) // $HitsScale + 1 AS BIGINT) AS d FROM ar$i)
         |, a$i AS MATERIALIZED (
         |  SELECT nn.vec_id, CAST(COALESCE(r.raw, 0) // ad.d AS BIGINT) AS a
         |  FROM n nn CROSS JOIN ad$i ad LEFT JOIN ar$i r ON r.vec_id = nn.vec_id)
         |, hr$i AS MATERIALIZED (
         |  SELECT k.vec_id AS vec_id, CAST(SUM(a.a) AS BIGINT) AS raw
         |  FROM knn k JOIN a$i a ON a.vec_id = k.neighbor_id
         |  GROUP BY 1)
         |, hd$i AS (SELECT CAST(MAX(raw) // $HitsScale + 1 AS BIGINT) AS d FROM hr$i)
         |, h$i AS MATERIALIZED (
         |  SELECT nn.vec_id, CAST(COALESCE(r.raw, 0) // hd.d AS BIGINT) AS h
         |  FROM n nn CROSS JOIN hd$i hd LEFT JOIN hr$i r ON r.vec_id = nn.vec_id)""".stripMargin
    }.mkString("\n")
    s"""${LlmQueries.quantizedCte}, scored AS (
       |  SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
       |    CAST(list_sum(list_transform(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i])) AS BIGINT) AS dot
       |  FROM n a JOIN n b ON a.vec_id <> b.vec_id
       |), ranked AS (
       |  SELECT vec_id, neighbor_id, dot,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, neighbor_id) AS rank
       |  FROM scored
       |), knn AS MATERIALIZED (
       |  SELECT vec_id, neighbor_id FROM ranked WHERE rank <= $K
       |), h0 AS MATERIALIZED (
       |  SELECT vec_id, CAST($HitsScale AS BIGINT) AS h FROM n)
       |$rounds
       |SELECT nn.vec_id, h.h AS hub_scaled, a.a AS auth_scaled
       |FROM n nn JOIN h$HitsIters h ON h.vec_id = nn.vec_id
       |JOIN a$HitsIters a ON a.vec_id = nn.vec_id
       |ORDER BY nn.vec_id""".stripMargin
  }

  private val BeamWidth = 8
  private val BeamRounds = 3

  /** GRAPH-based ANN — HNSW-style best-first search re-expressed as
    * BOUNDED iterative joins (the third ANN paradigm beside IVF's
    * partitioning and PQ/PCA/SQ's compression: navigate a neighbor graph
    * instead of scanning cells): per round, every query's beam expands
    * through the undirected kNN adjacency, candidates score by the fused
    * integer dot, and the bounded-heap PartialTopK keeps the best
    * `BeamWidth` per query. A sequential HNSW descends one hop at a time
    * per query; the distributed form advances ALL queries one hop per
    * round — 3 rounds × (one equi-join on the node key + one partial-agg
    * top-B), beam state = queries×B rows, per-round candidate work ≤
    * queries×B×degree — INDEPENDENT of corpus size, the property that
    * makes graph ANN the serving-tier default.
    *
    * Mutual-kNN graphs disconnect into semantic clusters (that is what
    * [[knnGraphClusters]] exploits), so a single entry point would trap
    * the walk in the entry's component — HNSW solves this with upper
    * layers; the distributed analog here SEEDS every beam with each
    * k-means cell's min-id member (16 bounded seed rows, the coarse
    * layer the session's Lloyd index already provides). Self-matches are
    * screened at scoring. Rows-only; KnnGraphSpec pins recall@5 vs the
    * exact twin and dot-exactness on overlapping pairs.
    */
  def annTopkGraph(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val q = VectorAgg.quantized(spark, dir)
    val directed = ivfEdges(spark, dir).select($"vec_id".as("src"), $"neighbor_id".as("dst"))
    val adj = undirected(directed).localCheckpoint()
    val corpusVec = q.select($"vec_id".as("node"), $"v".as("nv"))
    val queries = q.filter($"vec_id" % 10 === 0)
      .select($"vec_id".as("query_id"), $"v".as("qv"))
    beamSearch(queries, adj, cellSeeds(spark, dir), corpusVec)
      .filter(col("rank") <= 5)
      .select($"query_id", $"rank", $"node".as("neighbor_id"), $"dot")
      .orderBy($"query_id", $"rank")
  }

  private def undirected(directed: DataFrame): DataFrame = {
    import directed.sparkSession.implicits._
    directed.union(directed.select($"dst".as("src"), $"src".as("dst"))).distinct()
  }

  /** Per-cell min-id members: the ≤ k-row coarse entry layer. */
  private def cellSeeds(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val q = VectorAgg.quantized(spark, dir)
    val cells = VectorAgg.kmeansCells(spark, dir, k = 16, iters = 2)
    VectorAgg.withCellRank(q, cells)
      .select($"vec_id", element_at($"cellRank", 1).getField("cell").as("cell"))
      .groupBy($"cell").agg(min($"vec_id").as("node"))
      .select($"node")
  }

  /** The shared beam core: every (query_id, qv) advances one hop per
    * round through `adj`, scored by the fused integer dot against
    * `corpusVec` (node, nv), beam kept at `BeamWidth` by PartialTopK.
    * Round-0 candidates = the seeds PLUS the query's own adjacency
    * (known-item seeding — harmless for non-member queries: the join
    * finds no edges). Self-matches screened at scoring. Returns the
    * final ranked beam (query_id, qv, rank, node, dot).
    */
  private def beamSearch(queries: DataFrame, adj: DataFrame, seeds: DataFrame,
      corpusVec: DataFrame): DataFrame = {
    import queries.sparkSession.implicits._
    def topB(scored: DataFrame, b: Int): DataFrame =
      scored.groupBy($"query_id")
        .agg(partial_topk(
          struct((-$"dot").as("neg_dot"), $"node".as("node"), $"dot".as("dot")), b).as("topk"),
          first($"qv").as("qv")) // constant per group — carried, not recomputed
        .select($"query_id", $"qv", posexplode($"topk").as(Seq("pos", "s")))
        .select($"query_id", $"qv", ($"pos" + 1).cast("int").as("rank"),
          $"s.node".as("node"), $"s.dot".as("dot"))
    def score(cand: DataFrame): DataFrame =
      cand.join(corpusVec, Seq("node"))
        .filter($"node" =!= $"query_id")
        .withColumn("dot", vector_dot($"qv", $"nv")).drop("nv")
    val init = queries.select($"query_id", $"qv", $"query_id".as("node"))
      .join(adj, col("node") === col("src"))
      .select($"query_id", $"qv", $"dst".as("node"))
      .unionByName(queries.crossJoin(broadcast(seeds)))
      .dropDuplicates("query_id", "node")
    var beam = topB(score(init), BeamWidth).localCheckpoint()
    for (_ <- 1 to BeamRounds) {
      val expanded = beam.select($"query_id", $"qv", $"node", $"dot")
        .unionByName(
          score(beam.select($"query_id", $"qv", $"node")
            .join(adj, col("node") === col("src"))
            .select($"query_id", $"qv", $"dst".as("node"))
            .dropDuplicates("query_id", "node")))
        .dropDuplicates("query_id", "node")
      beam = topB(expanded, BeamWidth).localCheckpoint()
    }
    beam
  }

  /** Persist the navigable graph — the graph IS the index (what HNSW
    * serializes): the undirected adjacency + the seed layer. Vectors are
    * NOT copied; the embeddings table is the vector store the scoring
    * side reads (the hybrid_search_rrf_persisted division of labor).
    */
  def saveKnnGraph(spark: SparkSession, dir: String, indexPath: String): Unit =
    saveKnnGraphOf(spark, dir,
      VectorAgg.quantized(spark, dir), indexPath)

  /** Frame-based core (injectable for the append spec): builds the kNN
    * graph of `corpus` (same IVF-bounded construction as
    * [[knnGraphIvf]]) and lands adjacency + seeds.
    */
  private[graft] def saveKnnGraphOf(spark: SparkSession, dir: String,
      corpus: DataFrame, indexPath: String): Unit = {
    import spark.implicits._
    val directed = ivfEdgesOf(spark, dir, corpus)
      .select($"vec_id".as("src"), $"neighbor_id".as("dst"))
    undirected(directed)
      .repartition(1).write.mode("overwrite").parquet(s"$indexPath/adj")
    cellSeeds(spark, dir)
      .coalesce(1).write.mode("overwrite").parquet(s"$indexPath/seeds")
  }

  /** INCREMENTAL graph insertion — FAISS/HNSW `add()` on the graph axis:
    * each new vector finds its approximate nearest neighbors by running
    * the SAME beam search against the EXISTING graph (it is not in the
    * graph yet, so known-item seeding contributes nothing and the walk
    * starts from the seed layer), then links bidirectionally to its top
    * `K` results. Appended I/O is O(batch·K) edge rows; landed adjacency
    * files are untouched. Intra-batch edges (new↔new) are deliberately
    * not formed — the HNSW sequential-insert analog is folding smaller
    * batches; a periodic rebuild recovers them (the compaction cadence).
    */
  def appendToKnnGraph(spark: SparkSession, dir: String, batch: DataFrame,
      indexPath: String): Unit = {
    import spark.implicits._
    val adj = spark.read.parquet(s"$indexPath/adj")
    val seeds = spark.read.parquet(s"$indexPath/seeds")
    val corpusVec = VectorAgg.quantized(spark, dir)
      .select($"vec_id".as("node"), $"v".as("nv"))
    val newQ = batch.select($"vec_id".as("query_id"), $"v".as("qv"))
    val links = beamSearch(newQ, adj, seeds, corpusVec)
      .filter($"rank" <= K)
      .select($"query_id".as("src"), $"node".as("dst"))
    links.unionByName(links.select($"dst".as("src"), $"src".as("dst")))
      .distinct()
      .repartition(1).write.mode("append").parquet(s"$indexPath/adj")
  }

  /** GDPR DELETE through the persisted graph — the append path's
    * inverse: every adjacency row touching a deleted vector drops (one
    * rewrite of the edge-metadata-sized `adj/` table; n·K rows, never
    * the corpus), deleted seeds leave the seed layer, and the SURVIVORS
    * that lost an edge re-link by running the SAME beam search against
    * the cleaned graph and appending bidirectional links to their top-K
    * results — exactly how a new vector joins, so the graph's
    * navigability invariant (every member holds ~K live links) is
    * restored by the machinery that created it. Deleted ids can never
    * be served afterwards: beam candidates come only from the cleaned
    * adjacency ∪ cleaned seeds, and the re-link scores against a
    * corpus view that excludes them. Re-delete is a no-op probe
    * (nothing in `adj/` or `seeds/` references the ids). Graph ANN is
    * approximate, so the spec pins containment and navigability — no
    * deleted id in state or results, orphans re-linked, queries still
    * k-deep — rather than bit-equality with a from-scratch rebuild.
    */
  def deleteFromKnnGraph(spark: SparkSession, dir: String, indexPath: String,
      vecIds: Seq[Long]): Unit = {
    import spark.implicits._
    val adjPath = s"$indexPath/adj"
    val seedsPath = s"$indexPath/seeds"
    val adj = spark.read.parquet(adjPath)
    val seeds = spark.read.parquet(seedsPath)
    val touched = adj.filter($"src".isin(vecIds: _*) || $"dst".isin(vecIds: _*))
      .localCheckpoint() // probed for the orphan set and the no-op guard
    val seedsDirty = !seeds.filter($"node".isin(vecIds: _*)).isEmpty
    if (touched.isEmpty && !seedsDirty) return // already deleted — no-op
    // survivors that lost an edge to a deleted node
    val orphans = touched.filter(!$"dst".isin(vecIds: _*))
      .select($"dst".as("vec_id")).distinct()
    val cleaned = adj
      .filter(!$"src".isin(vecIds: _*) && !$"dst".isin(vecIds: _*))
      .localCheckpoint() // pinned: the beam walks it, the final write lands it
    val liveSeeds = seeds.filter(!$"node".isin(vecIds: _*)).localCheckpoint()
    // the orphan re-link is computed BEFORE anything is written, against
    // the in-memory cleaned graph — so the adjacency lands as ONE atomic
    // replace of (cleaned ∪ new links). The earlier rewrite-then-append
    // form had an unrecoverable crash window: adj cleaned on disk but
    // links not yet appended meant the retry's no-op probe fired and the
    // orphans stayed under-linked forever.
    val q = VectorAgg.quantized(spark, dir)
    val corpusVec = q.filter(!$"vec_id".isin(vecIds: _*))
      .select($"vec_id".as("node"), $"v".as("nv"))
    val newQ = q.join(orphans, Seq("vec_id"), "left_semi")
      .select($"vec_id".as("query_id"), $"v".as("qv"))
    val links = beamSearch(newQ, cleaned, liveSeeds, corpusVec)
      .filter($"rank" <= K)
      .select($"query_id".as("src"), $"node".as("dst"))
    val nextAdj = cleaned.unionByName(
        links.unionByName(links.select($"dst".as("src"), $"src".as("dst"))))
      .distinct()
      .repartition(1)
      .localCheckpoint()
    // seeds first, then the adjacency: a crash between the two leaves
    // the old adjacency intact (ids still present → the retry's no-op
    // guard does NOT fire) and the whole op re-runs from scratch
    if (seedsDirty)
      AtomicRewrite.overwrite(liveSeeds.coalesce(1), seedsPath)
    AtomicRewrite.overwrite(nextAdj, adjPath)
  }

  /** Serve the fixed ANN query set from the LOADED graph. */
  def annTopkGraphFromIndex(spark: SparkSession, dir: String, indexPath: String): DataFrame = {
    import spark.implicits._
    val adj = spark.read.parquet(s"$indexPath/adj")
    val seeds = spark.read.parquet(s"$indexPath/seeds")
    val q = VectorAgg.quantized(spark, dir)
    val corpusVec = q.select($"vec_id".as("node"), $"v".as("nv"))
    val queries = q.filter($"vec_id" % 10 === 0)
      .select($"vec_id".as("query_id"), $"v".as("qv"))
    beamSearch(queries, adj, seeds, corpusVec)
      .filter(col("rank") <= 5)
      .select($"query_id", $"rank", $"node".as("neighbor_id"), $"dot")
      .orderBy($"query_id", $"rank")
  }

  private val savedGraphs =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), String]

  /** §2 entry `ann_topk_graph_persisted`: save-once per (session, dir),
    * then every call serves from the loaded adjacency — identical
    * algorithm and graph, so result-identity with the in-session entry is
    * spec-pinned (rows-only driver check).
    */
  def annTopkGraphPersisted(spark: SparkSession, dir: String): DataFrame = {
    val path = savedGraphs.synchronized {
      savedGraphs.getOrElseUpdate((spark, dir), {
        val p = s"${System.getProperty("java.io.tmpdir")}/graft_knn_graph_" +
          graft.Tables.dirKey(dir) +
          "_" + ProcessHandle.current().pid() +
          "_" + Integer.toHexString(System.identityHashCode(spark))
        saveKnnGraph(spark, dir, p)
        p
      })
    }
    annTopkGraphFromIndex(spark, dir, path)
  }

  /** Triangle census + local clustering coefficient over the MUTUAL kNN
    * graph — the corpus-structure diagnostic (a high-coefficient region
    * is a near-duplicate clique; a zero-coefficient star is a hub
    * artifact): classic distributed triangle counting on the oriented
    * edge list — undirected mutual edges kept once as (a < b), wedges
    * from the (b)-join, closed by the (a, c) equi-join, so every
    * triangle is found exactly once as a < b < c. The edge table is
    * n·k rows (bounded by the graph's k, never the corpus²); per-node
    * counts come from one explode + partial agg; the coefficient
    * 2T/(d(d−1)) is ONE IEEE division of exact BIGINTs — hash-exact.
    */
  def knnGraphTriangles(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val und = exactGraphOf(spark, dir)
      .filter($"mutual" && $"vec_id" < $"neighbor_id")
      .select($"vec_id".as("a"), $"neighbor_id".as("b"))
    val e2 = und.select($"a".as("b2"), $"b".as("c"))
    val e3 = und.select($"a".as("a3"), $"b".as("c3"))
    val tri = und.join(e2, $"b" === $"b2")
      .join(e3, $"a" === $"a3" && $"c" === $"c3")
      .select($"a", $"b", $"c")
    val perNode = tri.select(explode(array($"a", $"b", $"c")).as("vec_id"))
      .groupBy($"vec_id").agg(count(lit(1)).as("triangles"))
    val deg = und.select(explode(array($"a", $"b")).as("vec_id"))
      .groupBy($"vec_id").agg(count(lit(1)).as("degree"))
    deg.join(perNode, Seq("vec_id"), "left")
      .select($"vec_id", $"degree", coalesce($"triangles", lit(0L)).as("triangles"))
      .withColumn("clustering",
        when($"degree" >= 2,
          ($"triangles" * 2L).cast("double") / ($"degree" * ($"degree" - 1L)).cast("double"))
          .otherwise(lit(0.0)))
      .orderBy($"vec_id")
  }

  val knnGraphTrianglesSql: String =
    s"""${LlmQueries.quantizedCte}, scored AS (
       |  SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
       |    CAST(list_sum(list_transform(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i])) AS BIGINT) AS dot
       |  FROM n a JOIN n b ON a.vec_id <> b.vec_id
       |), ranked AS (
       |  SELECT vec_id, neighbor_id, dot,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, neighbor_id) AS rank
       |  FROM scored
       |), knn AS (
       |  SELECT * FROM ranked WHERE rank <= $K
       |), und AS (
       |  SELECT k.vec_id AS a, k.neighbor_id AS b
       |  FROM knn k JOIN knn m
       |    ON m.vec_id = k.neighbor_id AND m.neighbor_id = k.vec_id
       |  WHERE k.vec_id < k.neighbor_id
       |), tri AS (
       |  SELECT e1.a, e1.b, e2.b AS c
       |  FROM und e1
       |  JOIN und e2 ON e1.b = e2.a
       |  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
       |), pernode AS (
       |  SELECT v AS vec_id, CAST(COUNT(*) AS BIGINT) AS triangles
       |  FROM (SELECT unnest([a, b, c]) AS v FROM tri) GROUP BY 1
       |), deg AS (
       |  SELECT v AS vec_id, CAST(COUNT(*) AS BIGINT) AS degree
       |  FROM (SELECT unnest([a, b]) AS v FROM und) GROUP BY 1
       |)
       |SELECT d.vec_id, d.degree, COALESCE(p.triangles, 0) AS triangles,
       |  CASE WHEN d.degree >= 2
       |    THEN CAST(COALESCE(p.triangles, 0) * 2 AS DOUBLE)
       |      / CAST(d.degree * (d.degree - 1) AS DOUBLE)
       |    ELSE 0.0 END AS clustering
       |FROM deg d LEFT JOIN pernode p ON d.vec_id = p.vec_id
       |ORDER BY d.vec_id""".stripMargin

  /** Synchronous label propagation over an undirected edge list: each
    * round every node adopts the MODE over its neighbors' labels PLUS
    * ITS OWN (tie → smallest label), labels initialized to the node id.
    * The self-vote is the damping that kills synchronous LPA's classic
    * bipartite oscillation (a bare 2-node pair would swap labels
    * forever; with the self-vote it converges to the min in one round)
    * and covers isolated nodes for free. Deterministic by construction
    * — the argmax is max(struct(count, −label)), a total order, so no
    * run-to-run or partitioning drift (classic ASYNC LPA is famously
    * visit-order-dependent; the synchronous+total-order variant trades
    * a little convergence speed for engine-grade reproducibility).
    * Each round is ONE equi-join of the n-row label table to the edge
    * table plus TWO bounded groupBys; labels localCheckpoint per round
    * (the Lloyd/PageRank plan-depth discipline).
    */
  private[graft] def lpCommunities(edges: DataFrame, nodes: DataFrame, rounds: Int): DataFrame = {
    import edges.sparkSession.implicits._
    val selfLoops = nodes.select($"vec_id".as("src"), $"vec_id".as("dst"))
    // r12: static vote-edge table pinned on src once (PinnedLayout — the
    // ALS/PageRank discipline); each round's join streams it in place
    val voteEdges = graft.plans.PinnedLayout.pinByKey(
      edges.select($"src", $"dst").union(selfLoops), "src")
    var labels = nodes.select($"vec_id", $"vec_id".as("label")).localCheckpoint()
    for (_ <- 1 to rounds) {
      labels = lpRound(voteEdges, labels).localCheckpoint()
    }
    labels
  }

  /** One synchronous LPA round over the pinned vote-edge table —
    * factored out so the spec can plan-pin the iteration shape (labels
    * SHUFFLE_HASH-build into the edges' layout; the corpus-sized edge
    * side never re-shuffles).
    */
  private[graft] def lpRound(voteEdges: DataFrame, labels: DataFrame): DataFrame = {
    import voteEdges.sparkSession.implicits._
    voteEdges
      .join(labels.select($"vec_id".as("src"), $"label").hint("shuffle_hash"), Seq("src"))
      .groupBy($"dst", $"label").agg(count(lit(1)).as("c"))
      .groupBy($"dst").agg(max(struct($"c", (-$"label").as("nl"))).as("m"))
      .select($"dst".as("vec_id"), (-$"m.nl").as("label"))
  }

  /** §2 entry `knn_graph_communities`: mode-based label-propagation
    * communities over the MUTUAL IVF kNN graph — the sub-component
    * structure the connected-components entry can't see (CC merges any
    * two cliques that share one bridge edge; LP keeps them apart unless
    * the bridge out-votes a side's internal cohesion). 5 synchronous
    * rounds; rows-only by §2 design (iterative mode-argmax), pinned by
    * CommunitySpec: planted-clique convergence, refinement of the CC
    * clusters, bit-identical re-runs.
    */
  def knnGraphCommunities(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // r11: exact mutual base — the whole graph-ANALYTICS family
    // (clusters/cc_star/kcore/triangles/assortativity/communities) now
    // reads one graph, which is also what keeps CommunitySpec's
    // LP-refines-CC invariant meaningful (communities of graph G must
    // partition components of the SAME G)
    val knn = exactGraphOf(spark, dir)
    val edges = knn.filter($"mutual")
      .select($"vec_id".as("src"), $"neighbor_id".as("dst"))
      .localCheckpoint() // mutual edges carry both directions already
    val nodes = VectorAgg.quantized(spark, dir).select($"vec_id")
    val labels = lpCommunities(edges.select($"src", $"dst"), nodes, rounds = 5)
    val sizes = labels.groupBy($"label").agg(count(lit(1)).as("community_size"))
    labels.join(sizes, Seq("label"))
      .select($"vec_id", $"label".as("community"), $"community_size")
      .orderBy($"vec_id")
  }

  /** §2 entry `knn_graph_modularity` — Newman MODULARITY of the
    * label-propagation communities: the quality number that says whether
    * the partition is real structure or noise (Q ≈ 0: no better than
    * random given the degree sequence; Q ≳ 0.3: strong community
    * structure) — the acceptance gate before any pipeline consumes the
    * community labels for stratification or dedup blocking. Per
    * community: size, internal edge count, degree sum, and its Q
    * contribution e_c/m − (d_c/2m)²; one sentinel community = −1 row
    * carries the GLOBAL totals so Q itself is computed from exact
    * integer sums, never a float Σ over communities (aggregation order
    * would leak into the hash).
    *
    * Scale shape: reads the session's shared exact mutual graph and the
    * SAME 5-round LP labels as `knn_graph_communities` (one chain in
    * the oracle too); everything after is two bounded joins (edges ⋈
    * labels twice) + ≤ C-row rollups; m rides a 1-row broadcast scalar.
    * All counts exact BIGINTs; each row's contribution is a fixed
    * correctly-rounded double tree, NULL when the graph has no mutual
    * edges (both engines).
    */
  /** Per-community edge statistics over the shared mutual graph + LP
    * labels — the frame modularity and conductance both read: ≤ C
    * checkpointed rows (community, size, internal_edges, degree_sum,
    * degree_sq) plus the 1-row undirected edge count. Session-cached
    * like the graph itself (two entries, one LP run).
    */
  private val commStatsCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), (DataFrame, DataFrame)]

  private def communityEdgeStats(spark: SparkSession, dir: String): (DataFrame, DataFrame) =
    commStatsCache.synchronized {
      commStatsCache.getOrElseUpdate((spark, dir), {
        import spark.implicits._
        val knn = exactGraphOf(spark, dir)
        val edges = knn.filter($"mutual")
          .select($"vec_id".as("src"), $"neighbor_id".as("dst"))
          .localCheckpoint() // both directions present
        val nodes = VectorAgg.quantized(spark, dir).select($"vec_id")
        val labels = lpCommunities(edges.select($"src", $"dst"), nodes, rounds = 5)
          .localCheckpoint()
        val und = edges.filter($"src" < $"dst")
        val mm = und.agg(count(lit(1)).as("m")).localCheckpoint()
        val deg = edges.groupBy($"src".as("vec_id")).agg(count(lit(1)).as("d"))
        val nodeProps = labels
          .join(deg, Seq("vec_id"), "left")
          .select($"label", coalesce($"d", lit(0L)).as("d"))
        val comm = nodeProps.groupBy($"label").agg(
          count(lit(1)).as("community_size"), sum($"d").as("degree_sum"))
        val la = labels.select($"vec_id".as("src"), $"label".as("la"))
        val lb = labels.select($"vec_id".as("dst"), $"label".as("lb"))
        val internal = und.join(la, Seq("src")).join(lb, Seq("dst"))
          .filter($"la" === $"lb")
          .groupBy($"la".as("label")).agg(count(lit(1)).as("internal_edges"))
        // degree_sq carries d_c² per community and Σd_c² on the total row —
        // the term that makes the sentinel row's q EXACTLY Newman's Q
        // ((Σd)² would not be); BIGINT-exact to degree sums ~3·10⁹.
        val rows = comm.join(internal, Seq("label"), "left")
          .select($"label".as("community"), $"community_size",
            coalesce($"internal_edges", lit(0L)).as("internal_edges"), $"degree_sum",
            ($"degree_sum" * $"degree_sum").as("degree_sq"))
          .localCheckpoint() // ≤ C rows; every consumer re-reads it
        (rows, mm)
      })
    }

  def knnGraphModularity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (rows, mm) = communityEdgeStats(spark, dir)
    val total = rows.agg(
        sum($"community_size").as("community_size"),
        sum($"internal_edges").as("internal_edges"),
        sum($"degree_sum").as("degree_sum"),
        sum($"degree_sq").as("degree_sq"))
      .select(lit(-1L).as("community"), $"community_size",
        $"internal_edges", $"degree_sum", $"degree_sq")
    val mD = $"m".cast("double")
    val contrib = $"internal_edges".cast("double") / mD -
      $"degree_sq".cast("double") / ((lit(2.0) * mD) * (lit(2.0) * mD))
    rows.union(total)
      .crossJoin(broadcast(mm))
      .withColumn("q_contribution", when($"m" > 0L, contrib))
      .select($"community", $"community_size", $"internal_edges",
        $"degree_sum", $"q_contribution")
      .orderBy($"community")
  }

  /** §2 entry `knn_graph_conductance` — per-community CONDUCTANCE, the
    * partition-quality metric modularity can't see: φ_c = cut/min(vol,
    * 2m − vol) measures how LEAKY one community's boundary is (φ ≈ 0 =
    * near-isolated, φ → 1 = mostly boundary), independent of what the
    * rest of the partition looks like — the per-cluster acceptance
    * screen beside modularity's global verdict. cut = d_c − 2e_c and
    * both min arms are exact BIGINTs off the SAME cached community
    * stats frame (one LP run feeds both entries); one divide per row,
    * NULL when the min volume arm is 0 (an isolated singleton or the
    * whole graph in one community) in BOTH engines.
    */
  def knnGraphConductance(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (rows, mm) = communityEdgeStats(spark, dir)
    val cut = $"degree_sum" - lit(2L) * $"internal_edges"
    val minVol = least($"degree_sum", lit(2L) * $"m" - $"degree_sum")
    rows.crossJoin(broadcast(mm))
      .withColumn("cut_edges", cut)
      .withColumn("volume", $"degree_sum")
      .withColumn("conductance",
        when(minVol > 0L, $"cut_edges".cast("double") / minVol.cast("double")))
      .select($"community", $"community_size", $"cut_edges", $"volume",
        $"conductance")
      .orderBy($"community")
  }

  val knnGraphConductanceSql: String =
    s"""$lpChainCte
       |, und AS (SELECT a, b FROM mutual WHERE a < b)
       |, mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM und)
       |, deg AS (
       |  SELECT a AS vec_id, CAST(COUNT(*) AS BIGINT) AS d FROM mutual GROUP BY 1
       |), nodeprops AS (
       |  SELECT l.label, COALESCE(d.d, 0) AS d
       |  FROM l5 l LEFT JOIN deg d ON d.vec_id = l.vec_id
       |), comm AS (
       |  SELECT label, CAST(COUNT(*) AS BIGINT) AS community_size,
       |    CAST(SUM(d) AS BIGINT) AS degree_sum
       |  FROM nodeprops GROUP BY 1
       |), internal AS (
       |  SELECT la.label, CAST(COUNT(*) AS BIGINT) AS internal_edges
       |  FROM und u
       |  JOIN l5 la ON la.vec_id = u.a
       |  JOIN l5 lb ON lb.vec_id = u.b
       |  WHERE la.label = lb.label
       |  GROUP BY 1
       |), rows_ AS (
       |  SELECT c.label AS community, c.community_size,
       |    COALESCE(i.internal_edges, 0) AS internal_edges, c.degree_sum
       |  FROM comm c LEFT JOIN internal i ON i.label = c.label
       |)
       |SELECT community, community_size,
       |  degree_sum - 2 * internal_edges AS cut_edges,
       |  degree_sum AS volume,
       |  CASE WHEN LEAST(degree_sum, 2 * m - degree_sum) > 0 THEN
       |    CAST(degree_sum - 2 * internal_edges AS DOUBLE)
       |      / CAST(LEAST(degree_sum, 2 * m - degree_sum) AS DOUBLE)
       |  END AS conductance
       |FROM rows_ CROSS JOIN mm
       |ORDER BY community""".stripMargin

  val knnGraphModularitySql: String =
    s"""$lpChainCte
       |, und AS (SELECT a, b FROM mutual WHERE a < b)
       |, mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM und)
       |, deg AS (
       |  SELECT a AS vec_id, CAST(COUNT(*) AS BIGINT) AS d FROM mutual GROUP BY 1
       |), nodeprops AS (
       |  SELECT l.label, COALESCE(d.d, 0) AS d
       |  FROM l5 l LEFT JOIN deg d ON d.vec_id = l.vec_id
       |), comm AS (
       |  SELECT label, CAST(COUNT(*) AS BIGINT) AS community_size,
       |    CAST(SUM(d) AS BIGINT) AS degree_sum
       |  FROM nodeprops GROUP BY 1
       |), internal AS (
       |  SELECT la.label, CAST(COUNT(*) AS BIGINT) AS internal_edges
       |  FROM und u
       |  JOIN l5 la ON la.vec_id = u.a
       |  JOIN l5 lb ON lb.vec_id = u.b
       |  WHERE la.label = lb.label
       |  GROUP BY 1
       |), rows_ AS (
       |  SELECT c.label AS community, c.community_size,
       |    COALESCE(i.internal_edges, 0) AS internal_edges, c.degree_sum,
       |    c.degree_sum * c.degree_sum AS degree_sq
       |  FROM comm c LEFT JOIN internal i ON i.label = c.label
       |), tot AS (
       |  SELECT CAST(-1 AS BIGINT) AS community,
       |    CAST(SUM(community_size) AS BIGINT) AS community_size,
       |    CAST(SUM(internal_edges) AS BIGINT) AS internal_edges,
       |    CAST(SUM(degree_sum) AS BIGINT) AS degree_sum,
       |    CAST(SUM(degree_sq) AS BIGINT) AS degree_sq
       |  FROM rows_
       |), unioned AS (
       |  SELECT * FROM rows_ UNION ALL SELECT * FROM tot
       |)
       |SELECT community, community_size, internal_edges, degree_sum,
       |  CASE WHEN m > 0 THEN
       |    CAST(internal_edges AS DOUBLE) / CAST(m AS DOUBLE)
       |      - CAST(degree_sq AS DOUBLE)
       |        / ((2.0 * CAST(m AS DOUBLE)) * (2.0 * CAST(m AS DOUBLE)))
       |  END AS q_contribution
       |FROM unioned CROSS JOIN mm
       |ORDER BY community""".stripMargin

  /** Alternating large-star / small-star connected components (Kiveris
    * et al., "Connected Components in MapReduce and Beyond", SoCC'14) —
    * the O(log² n)-round CC that converges on ROUND COUNT INDEPENDENT OF
    * COMPONENT DIAMETER, which is what you want at 100 TB where a
    * path-shaped component makes diameter-bounded label propagation
    * (ScaleDedup.ccKeepers' min-label + pointer-jumping) pay a round per
    * hop it can't jump. Per round, two star operations rewrite the edge
    * set toward stars rooted at component minima:
    *   large-star(u): every neighbor v > u re-links to
    *                  m(u) = min(Γ(u) ∪ u);
    *   small-star(u): every neighbor v ≤ u, and u itself, link to m(u).
    * Both are ONE bounded groupBy (per-node min — no neighbor list is
    * ever collected) + an edge-table join; edges stay canonical (a<b,
    * distinct), so each round is a fixed set of shuffles on a table that
    * only shrinks-or-stars. Convergence = full-round edge-set fixpoint
    * (checked both directions), result read off as each node's star
    * center. Spec: property-tested against a driver union-find on random
    * graphs AND pinned label-for-label to knnGraphClusters on the corpus
    * (two different algorithms, one answer).
    */
  private[graft] def ccStarLabels(edges0: DataFrame, maxRounds: Int = 64): DataFrame = {
    import edges0.sparkSession.implicits._
    def canon(df: DataFrame) =
      df.select(least($"a", $"b").as("a"), greatest($"a", $"b").as("b"))
        .filter($"a" =!= $"b").distinct()
    def adj(e: DataFrame) =
      e.select($"a".as("u"), $"b".as("v")).union(e.select($"b".as("u"), $"a".as("v")))
    def mins(a: DataFrame) =
      a.groupBy($"u").agg(min($"v").as("mn"))
        .select($"u", least($"mn", $"u").as("m"))
    var edges = canon(edges0).localCheckpoint()
    var round = 0
    var converged = false
    while (!converged) {
      if (round >= maxRounds)
        throw new IllegalStateException(
          s"ccStarLabels: not converged after $maxRounds rounds — " +
            "large/small-star converges in O(log² n); refusing partial labels")
      val a1 = adj(edges)
      val e1 = canon(
        a1.join(mins(a1), Seq("u")).filter($"v" > $"u")
          .select($"v".as("a"), $"m".as("b"))).localCheckpoint()
      val a2 = adj(e1)
      val m2 = mins(a2)
      val e2 = canon(
        a2.join(m2, Seq("u")).filter($"v" < $"u")
          .select($"v".as("a"), $"m".as("b"))
          .union(m2.select($"u".as("a"), $"m".as("b")))).localCheckpoint()
      converged = e2.exceptAll(edges).isEmpty && edges.exceptAll(e2).isEmpty
      edges = e2
      round += 1
    }
    adj(edges).groupBy($"u").agg(min($"v").as("mn"))
      .select($"u".as("node"), least($"mn", $"u").as("label"))
  }

  /** §2 `knn_graph_cc_star`: mutual-kNN connected components via the
    * large/small-star rewriting — the diameter-independent twin of
    * `knn_graph_clusters` (same edge set, same output shape, same
    * labels; the spec pins the two algorithms label-for-label).
    */
  def knnGraphCcStar(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val knn = exactGraphOf(spark, dir) // r11: exact base, shared CC oracle
    val edges = knn.filter($"mutual" && $"vec_id" < $"neighbor_id")
      .select($"vec_id".as("a"), $"neighbor_id".as("b"))
      .localCheckpoint()
    val labels = ccStarLabels(edges)
    val all = VectorAgg.quantized(spark, dir).select($"vec_id")
    val labeled = all.join(labels.withColumnRenamed("node", "vec_id"), Seq("vec_id"), "left")
      .select($"vec_id", coalesce($"label", $"vec_id").as("cluster"))
    val sizes = labeled.groupBy($"cluster").agg(count(lit(1)).as("cluster_size"))
    labeled.join(sizes, Seq("cluster"))
      .select($"vec_id", $"cluster", $"cluster_size")
      .orderBy($"vec_id")
  }

  /** §2 `knn_graph_assortativity`: degree ASSORTATIVITY of the mutual
    * kNN graph — the Pearson correlation of endpoint degrees over every
    * directed mutual edge (Newman's r: positive = hubs link hubs,
    * negative = hub-and-spoke; near zero on a healthy kNN graph whose
    * degrees are capped at k — a strongly negative r is the
    * hub-artifact diagnostic that says a few vectors sit in everyone's
    * neighbor list, the failure mode the triangle census sees locally
    * and this summarizes globally in one number). Exactness: degrees ≤
    * k are exact ints; n, Σx, Σy, Σx², Σy², Σxy are exact BIGINT sums
    * over the n·k edge table; r is the corrFrom fixed IEEE tree,
    * mirrored token-for-token. One degree groupBy + two bounded joins +
    * one scalar aggregate.
    */
  def knnGraphAssortativity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val mutualE = exactGraphOf(spark, dir).filter($"mutual")
      .select($"vec_id".as("a"), $"neighbor_id".as("b"))
    val deg = mutualE.groupBy($"a").agg(count(lit(1)).as("deg"))
    val xy = mutualE
      .join(deg.select($"a", $"deg".as("x")), Seq("a"))
      .join(deg.select($"a".as("b"), $"deg".as("y")), Seq("b"))
    val stats = xy.agg(count(lit(1)).as("n"),
      sum($"x").as("sx"), sum($"y").as("sy"),
      sum($"x" * $"x").as("sxx"), sum($"y" * $"y").as("syy"),
      sum($"x" * $"y").as("sxy"))
    val nD = $"n".cast("double")
    stats
      .withColumn("assortativity",
        (nD * $"sxy".cast("double") - $"sx".cast("double") * $"sy".cast("double")) /
          (sqrt(nD * $"sxx".cast("double") - $"sx".cast("double") * $"sx".cast("double")) *
            sqrt(nD * $"syy".cast("double") - $"sy".cast("double") * $"sy".cast("double"))))
      .select($"n".as("n_directed_edges"), $"assortativity")
  }

  val knnGraphAssortativitySql: String =
    s"""${LlmQueries.quantizedCte}, scored AS (
       |  SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
       |    CAST(list_sum(list_transform(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i])) AS BIGINT) AS dot
       |  FROM n a JOIN n b ON a.vec_id <> b.vec_id
       |), ranked AS (
       |  SELECT vec_id, neighbor_id, dot,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, neighbor_id) AS rank
       |  FROM scored
       |), knn AS (
       |  SELECT * FROM ranked WHERE rank <= $K
       |), mutual AS (
       |  SELECT k.vec_id AS a, k.neighbor_id AS b
       |  FROM knn k JOIN knn m ON m.vec_id = k.neighbor_id AND m.neighbor_id = k.vec_id
       |), deg AS (
       |  SELECT a, CAST(COUNT(*) AS BIGINT) AS deg FROM mutual GROUP BY a
       |), xy AS (
       |  SELECT da.deg AS x, db.deg AS y
       |  FROM mutual e JOIN deg da ON e.a = da.a JOIN deg db ON e.b = db.a
       |), stats AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
       |    CAST(SUM(x * x) AS BIGINT) AS sxx, CAST(SUM(y * y) AS BIGINT) AS syy,
       |    CAST(SUM(x * y) AS BIGINT) AS sxy
       |  FROM xy
       |)
       |SELECT n AS n_directed_edges,
       |  (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
       |    (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
       |     sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
       |    AS assortativity
       |FROM stats""".stripMargin

  /** Iterative k-core peeling over a DIRECTED mutual-edge table: delete
    * every node of degree < k, re-count, repeat to fixpoint — each round
    * ONE bounded degree groupBy + two semi-joins on an edge table that
    * only shrinks; rounds ≤ peeling depth (tiny on a kNN graph whose
    * max degree is k_nn). Returns surviving nodes with their in-core
    * degree.
    */
  private[graft] def kcoreOn(edges0: DataFrame, k: Int, maxRounds: Int = 64): DataFrame = {
    import edges0.sparkSession.implicits._
    var e = edges0.localCheckpoint()
    var n = e.count()
    var converged = false
    var round = 0
    while (!converged) {
      if (round >= maxRounds)
        throw new IllegalStateException(s"kcoreOn: not converged after $maxRounds rounds")
      val keep = e.groupBy($"a").agg(count(lit(1)).as("deg"))
        .filter($"deg" >= k).select($"a")
      val e2 = e.join(keep, Seq("a"), "left_semi")
        .join(keep.select($"a".as("b")), Seq("b"), "left_semi")
        .localCheckpoint()
      val n2 = e2.count()
      converged = n2 == n
      e = e2; n = n2
      round += 1
    }
    e.groupBy($"a".as("vec_id")).agg(count(lit(1)).as("core_degree"))
  }

  /** §2 `knn_graph_kcore`: the 2-CORE of the mutual kNN graph — the
    * subgraph every node of which has ≥ 2 in-core mutual neighbors, the
    * standard graph-cleaning pass before community/cluster analysis
    * (degree-1 tendrils and isolated pairs inflate component counts and
    * drag label propagation; the core is where the real neighborhood
    * structure lives). Round 11: runs on the EXACT mutual edge table —
    * the same oracle-expressible base as the triangle census and the
    * assortativity summary — which promotes the entry from rows-only to
    * hash-gated: the DuckDB oracle unrolls the peeling to
    * [[kcoreOn]]'s own maxRounds bound (rounds past the fixpoint are
    * no-ops, so wherever the Spark side converges the two agree
    * row-for-row). The spec additionally pins the result against a
    * driver-side peeling reference and the ≥ k in-core degree
    * invariant.
    */
  def knnGraphKcore(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val edges = exactGraphOf(spark, dir).filter($"mutual")
      .select($"vec_id".as("a"), $"neighbor_id".as("b"))
      .localCheckpoint() // mutual edges carry both directions already
    kcoreOn(edges, k = 2).orderBy($"vec_id")
  }

  /** The exact-graph mutual-edge prologue shared by the assortativity
    * and k-core oracles.
    */
  private def mutualCte: String =
    s"""${LlmQueries.quantizedCte}, scored AS (
       |  SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
       |    CAST(list_sum(list_transform(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i])) AS BIGINT) AS dot
       |  FROM n a JOIN n b ON a.vec_id <> b.vec_id
       |), ranked AS (
       |  SELECT vec_id, neighbor_id, dot,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, neighbor_id) AS rank
       |  FROM scored
       |), knn AS (
       |  SELECT * FROM ranked WHERE rank <= $K
       |), mutual AS (
       |  SELECT k.vec_id AS a, k.neighbor_id AS b
       |  FROM knn k JOIN knn m ON m.vec_id = k.neighbor_id AND m.neighbor_id = k.vec_id
       |)""".stripMargin

  /** Connected components as an EXACT-FIXPOINT reachability closure —
    * the oracle for both CC entries (they are pinned label-for-label,
    * so one oracle holds both): a recursive CTE accumulates (v, u)
    * reachable pairs over the directed mutual edges until UNION adds
    * nothing (true fixpoint — no unrolled-round bound needed, unlike
    * the peeling oracle, because set-union recursion terminates by
    * itself), then each node's cluster is LEAST(v, MIN(reachable)) —
    * exactly the component min both Spark algorithms emit. Closure size
    * is Σ component² — bounded at gate scale; `und` is MATERIALIZED so
    * the corpus² scoring join runs once, not once per recursion step.
    * Singletons (no mutual edge) label themselves via the left join.
    */
  val knnGraphCcSql: String =
    // WITH RECURSIVE heads the whole clause (DuckDB requires it for the
    // self-referencing `reach`; the earlier non-recursive CTEs are
    // unaffected by the keyword)
    s"""${mutualCte.replaceFirst("^WITH ", "WITH RECURSIVE ")}, und AS MATERIALIZED (
       |  SELECT a, b FROM mutual
       |), reach AS (
       |  SELECT a AS v, b AS u FROM und
       |  UNION
       |  SELECT r.v, e.b AS u FROM reach r JOIN und e ON e.a = r.u
       |), lbl AS (
       |  SELECT v, LEAST(v, MIN(u)) AS cluster FROM reach GROUP BY v
       |), labeled AS (
       |  SELECT nn.vec_id, COALESCE(l.cluster, nn.vec_id) AS cluster
       |  FROM n nn LEFT JOIN lbl l ON l.v = nn.vec_id
       |), sizes AS (
       |  SELECT cluster, CAST(COUNT(*) AS BIGINT) AS cluster_size
       |  FROM labeled GROUP BY cluster
       |)
       |SELECT vec_id, cluster, cluster_size
       |FROM labeled JOIN sizes USING (cluster)
       |ORDER BY vec_id""".stripMargin

  /** Peeling unrolled to the Spark side's maxRounds = 64: round i keeps
    * nodes with in-round degree ≥ 2 and restricts the edge table to
    * them. Past the fixpoint every round is the identity, so the
    * unrolled depth only needs to DOMINATE the true peeling depth —
    * and 64 is exactly the bound [[kcoreOn]] throws beyond, so any
    * input the Spark entry accepts, this oracle matches.
    */
  val knnGraphKcoreSql: String = {
    // AS MATERIALIZED is load-bearing: round i references round i−1
    // three times (the degree census and both endpoint semi-joins), so
    // DuckDB's default CTE inlining would expand the 64-round chain
    // 3^64-fold; materializing each round keeps it linear.
    val rounds = (1 to 64).map { i =>
      s""", k$i AS MATERIALIZED (SELECT a FROM e${i - 1} GROUP BY a HAVING COUNT(*) >= 2)
         |, e$i AS MATERIALIZED (
         |  SELECT e.a, e.b FROM e${i - 1} e
         |  JOIN k$i x ON e.a = x.a JOIN k$i y ON e.b = y.a)""".stripMargin
    }.mkString("\n")
    s"""$mutualCte, e0 AS MATERIALIZED (SELECT a, b FROM mutual)
       |$rounds
       |SELECT a AS vec_id, CAST(COUNT(*) AS BIGINT) AS core_degree
       |FROM e64 GROUP BY a ORDER BY vec_id""".stripMargin
  }

  /** Common-neighbor core over a DIRECTED mutual-edge table (each
    * undirected edge present in both directions): candidate pairs are the
    * 2-hop wedges `u−z−w, u<w`, scored by common-neighbor count and
    * neighborhood Jaccard, with EXISTING edges anti-joined out — what
    * survives is exactly the "should probably be linked" set. Spec-fed
    * with synthetic graphs; the §2 entry instantiates it on the exact
    * mutual kNN graph.
    */
  private[graft] def linkPredictOn(mutualE: DataFrame): DataFrame = {
    import mutualE.sparkSession.implicits._
    val deg = mutualE.groupBy($"a").agg(count(lit(1)).as("deg"))
    val fwd = mutualE.select($"a".as("u"), $"b".as("z"))
    val bwd = mutualE.select($"a".as("z"), $"b".as("w"))
    val cand = fwd.join(bwd, Seq("z"))
      .filter($"u" < $"w")
      .groupBy($"u", $"w").agg(count(lit(1)).as("cn"))
    val nonEdge = cand.join(mutualE,
      cand("u") === mutualE("a") && cand("w") === mutualE("b"), "left_anti")
    nonEdge
      .join(deg.select($"a".as("u"), $"deg".as("deg_a")), Seq("u"))
      .join(deg.select($"a".as("w"), $"deg".as("deg_b")), Seq("w"))
      .withColumn("jaccard",
        $"cn".cast("double") / ($"deg_a" + $"deg_b" - $"cn").cast("double"))
      .select($"u".as("a"), $"w".as("b"), $"cn", $"deg_a", $"deg_b", $"jaccard")
  }

  /** §2 `knn_graph_link_predict`: link prediction on the exact mutual
    * kNN graph — rank the non-adjacent vector pairs most likely to be
    * true neighbors by shared-neighborhood evidence (common-neighbor
    * count, then neighborhood Jaccard). The graph-repair primitive: at
    * index-maintenance time these are precisely the candidate edges an
    * HNSW-style re-link pass would test first.
    *
    * Exactness: cn and degrees are exact BIGINTs (degree ≤ k), Jaccard is
    * ONE IEEE divide (the cosine discipline). Scale shape: the wedge join
    * fans out ≤ deg² ≤ k² per node — linear in corpus size on the n·k
    * edge table, never touching the vectors; the global top-50 cut is
    * orderBy+limit (per-partition TakeOrdered), and the rank window runs
    * over the 50 survivors only (the dm_audience_overlap device).
    */
  def knnGraphLinkPredict(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val mutualE = exactGraphOf(spark, dir).filter($"mutual")
      .select($"vec_id".as("a"), $"neighbor_id".as("b"))
    linkPredictOn(mutualE)
      .orderBy($"cn".desc, $"jaccard".desc, $"a", $"b")
      .limit(50)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(pmod($"cn", lit(1)))
          .orderBy($"cn".desc, $"jaccard".desc, $"a", $"b")).cast("long"))
      .orderBy($"rank")
  }

  val knnGraphLinkPredictSql: String =
    s"""${LlmQueries.quantizedCte}, scored AS (
       |  SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
       |    CAST(list_sum(list_transform(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i])) AS BIGINT) AS dot
       |  FROM n a JOIN n b ON a.vec_id <> b.vec_id
       |), ranked AS (
       |  SELECT vec_id, neighbor_id, dot,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, neighbor_id) AS rank
       |  FROM scored
       |), knn AS (
       |  SELECT * FROM ranked WHERE rank <= $K
       |), mutual AS (
       |  SELECT k.vec_id AS a, k.neighbor_id AS b
       |  FROM knn k JOIN knn m ON m.vec_id = k.neighbor_id AND m.neighbor_id = k.vec_id
       |), deg AS (
       |  SELECT a, CAST(COUNT(*) AS BIGINT) AS deg FROM mutual GROUP BY a
       |), cand AS (
       |  SELECT x.a AS u, y.b AS w, CAST(COUNT(*) AS BIGINT) AS cn
       |  FROM mutual x JOIN mutual y ON x.b = y.a AND x.a < y.b
       |  GROUP BY 1, 2
       |), nonedge AS (
       |  SELECT c.u, c.w, c.cn FROM cand c
       |  LEFT JOIN mutual e ON e.a = c.u AND e.b = c.w
       |  WHERE e.a IS NULL
       |), ne_scored AS (
       |  SELECT u AS a, w AS b, cn, da.deg AS deg_a, db.deg AS deg_b,
       |    CAST(cn AS DOUBLE) / CAST(da.deg + db.deg - cn AS DOUBLE) AS jaccard
       |  FROM nonedge JOIN deg da ON nonedge.u = da.a JOIN deg db ON nonedge.w = db.a
       |), top AS (
       |  SELECT *, row_number() OVER (ORDER BY cn DESC, jaccard DESC, a, b) AS rank
       |  FROM ne_scored
       |  ORDER BY cn DESC, jaccard DESC, a, b
       |  LIMIT 50
       |)
       |SELECT a, b, cn, deg_a, deg_b, jaccard, CAST(rank AS BIGINT) AS rank
       |FROM top ORDER BY rank""".stripMargin

  /** §2 entry `knn_graph_betweenness` — BETWEENNESS centrality on the
    * mutual kNN graph: the BRIDGE score (how much shortest-path traffic
    * crosses a node) that PageRank/HITS cannot express — a node can be
    * low-degree and un-endorsed yet be the ONLY corridor between two
    * semantic clusters, exactly the vector a diversity sampler must
    * keep and a dedup pass must not collapse. Distributed BRANDES,
    * honestly bounded the way a 100 TB pass must be: SAMPLED sources
    * (the standard Brandes estimator — every `vec_id % 31 == 0` node,
    * a deterministic ~3% sample mirrored in SQL) and HOP-BOUNDED
    * (dist ≤ 4; on a mutual kNN graph intra-cluster shortest paths are
    * short, and the k-bounded frontier keeps each round's state ≤
    * sources × reach). Forward pass: 4 BFS rounds over the pinned edge
    * layout, σ path counts as exact BIGINT grouped sums, the visited
    * anti-join keeping layers disjoint — ALL sources advance together
    * as one (src, node) frame, so rounds are joins, not a per-source
    * loop. Backward pass: the Brandes dependency δ(v) = Σ_w σ_v/σ_w ·
    * (1 + δ(w)) on the 2²⁰ grid — each term floor-quantized
    * (per-term floor ≤ σ·(G + δ) < 2⁶³ to ~10⁸ nodes; the one-sided
    * O(2⁻²⁰) trade of the PageRank family), every edge v∈layer_r →
    * w∈layer_r+1 being a shortest-path DAG edge BY CONSTRUCTION
    * (dist(w) = dist(v)+1 forces it).
    *
    * Hash-gated: σ and the quantized δ are pure integers, so the 4+3
    * rounds unroll as MATERIALIZED CTEs over the same exact mutual
    * edges (the kcore discipline); scores sum per node, zero-filled
    * over the node table. KnnGraphSpec pins a diamond (σ = 2 splits δ
    * exactly in half on the grid), a 5-node path (all-σ-1 → the grid
    * arithmetic is EXACT, bc = known path-graph values), and corpus
    * determinism.
    */
  private val BcHops = 4
  private val BcGrid = 1048576L // 2^20
  private val BcSourceMod = 31L

  /** The shared hop-bounded multi-source BFS: layers(r) = the (src,
    * node, sigma) frame at distance exactly r (sigma = shortest-path
    * counts), disjoint by the visited anti-join. Feeds betweenness
    * (which back-propagates over them) and closeness (which only needs
    * the distances).
    */
  private def bfsLayers(edges: DataFrame, sources: DataFrame)
      : (DataFrame, scala.collection.mutable.ArrayBuffer[DataFrame]) = {
    import edges.sparkSession.implicits._
    val ePinned = graft.plans.PinnedLayout.pinByKey(
      edges.select($"a", $"b"), "a")
    var frontier = sources.select($"src", $"src".as("node"), lit(1L).as("sigma"))
      .localCheckpoint()
    var visited = frontier.select($"src", $"node").localCheckpoint()
    val layers = scala.collection.mutable.ArrayBuffer(frontier)
    for (_ <- 1 to BcHops) {
      val cand = ePinned
        .join(frontier.withColumnRenamed("node", "a").hint("shuffle_hash"), Seq("a"))
        .select($"src", $"b".as("node"), $"sigma")
      val nf = cand.join(visited, Seq("src", "node"), "left_anti")
        .groupBy($"src", $"node").agg(sum($"sigma").as("sigma"))
        .localCheckpoint()
      layers += nf
      visited = visited.unionByName(nf.select($"src", $"node")).localCheckpoint()
      frontier = nf
    }
    (ePinned, layers)
  }

  private[graft] def betweennessOn(edges: DataFrame, sources: DataFrame): DataFrame = {
    import edges.sparkSession.implicits._
    val (ePinned, layers) = bfsLayers(edges, sources)
    // backward: delta at the deepest layer is 0; each shallower layer
    // gathers floor(sigma_v * (G + delta_w) / sigma_w) over its DAG edges
    var delta = layers(BcHops).select($"src", $"node", lit(0L).as("delta2"))
      .localCheckpoint()
    val deltas = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    for (r <- (BcHops - 1) to 0 by -1) {
      val wSide = layers(r + 1)
        .select($"src", $"node".as("b"), $"sigma".as("sigma_w"))
        .join(delta.select($"src", $"node".as("b"), $"delta2".as("delta_w")),
          Seq("src", "b"))
      val terms = ePinned
        .join(wSide.hint("shuffle_hash"), Seq("b"))
        .select($"src", $"a".as("node"), $"sigma_w", $"delta_w")
      val vLayer = layers(r).select($"src", $"node", $"sigma".as("sigma_v"))
      val gathered = vLayer.join(terms, Seq("src", "node"))
        .groupBy($"src", $"node")
        .agg(sum(expr(s"sigma_v * ($BcGrid + delta_w) div sigma_w")).as("dsum"))
      delta = vLayer.join(gathered, Seq("src", "node"), "left")
        .select($"src", $"node", coalesce($"dsum", lit(0L)).as("delta2"))
        .localCheckpoint()
      if (r > 0) deltas += delta // r == 0 is the source itself - excluded
    }
    deltas.reduce(_ unionByName _)
      .groupBy($"node").agg(sum($"delta2").as("bc"))
  }

  def knnGraphBetweenness(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val edges = exactGraphOf(spark, dir).filter($"mutual")
      .select($"vec_id".as("a"), $"neighbor_id".as("b"))
    val nodes = VectorAgg.quantized(spark, dir).select($"vec_id")
    val sources = nodes.filter($"vec_id" % BcSourceMod === 0)
      .select($"vec_id".as("src"))
    nodes
      .join(betweennessOn(edges, sources)
        .withColumnRenamed("node", "vec_id"), Seq("vec_id"), "left")
      .select($"vec_id", coalesce($"bc", lit(0L)).as("bc_scaled"))
      .orderBy($"vec_id")
  }

  /** The forward-BFS CTE chain shared by the betweenness and closeness
    * oracles: sampled sources f0, visited-set v_i, per-layer (src,
    * node, sigma) frames f1..f_H.
    */
  private def bcForwardSql: String = {
    val fwd = (1 to BcHops).map { i =>
      s""", f$i AS MATERIALIZED (
         |  SELECT f.src, e.b AS node, CAST(SUM(f.sigma) AS BIGINT) AS sigma
         |  FROM f${i - 1} f JOIN mutual e ON e.a = f.node
         |  WHERE NOT EXISTS (
         |    SELECT 1 FROM v${i - 1} v WHERE v.src = f.src AND v.node = e.b)
         |  GROUP BY 1, 2)
         |, v$i AS MATERIALIZED (
         |  SELECT src, node FROM v${i - 1} UNION ALL SELECT src, node FROM f$i)""".stripMargin
    }.mkString("\n")
    s"""$mutualCte, f0 AS MATERIALIZED (
       |  SELECT vec_id AS src, vec_id AS node, CAST(1 AS BIGINT) AS sigma
       |  FROM n WHERE vec_id % $BcSourceMod = 0)
       |, v0 AS MATERIALIZED (SELECT src, node FROM f0)
       |$fwd""".stripMargin
  }

  val knnGraphBetweennessSql: String = {
    val bwd = ((BcHops - 1) to 1 by -1).map { r =>
      s""", t$r AS MATERIALIZED (
         |  SELECT f.src, f.node,
         |    CAST(SUM((f.sigma * ($BcGrid + d.delta2)) // w.sigma) AS BIGINT) AS dsum
         |  FROM f$r f
         |  JOIN mutual e ON e.a = f.node
         |  JOIN f${r + 1} w ON w.src = f.src AND w.node = e.b
         |  JOIN d${r + 1} d ON d.src = f.src AND d.node = e.b
         |  GROUP BY 1, 2)
         |, d$r AS MATERIALIZED (
         |  SELECT f.src, f.node, CAST(COALESCE(t.dsum, 0) AS BIGINT) AS delta2
         |  FROM f$r f LEFT JOIN t$r t ON t.src = f.src AND t.node = f.node)""".stripMargin
    }.mkString("\n")
    val unions = (1 to (BcHops - 1))
      .map(r => s"SELECT node, delta2 FROM d$r").mkString(" UNION ALL ")
    s"""$bcForwardSql
       |, d$BcHops AS MATERIALIZED (
       |  SELECT src, node, CAST(0 AS BIGINT) AS delta2 FROM f$BcHops)
       |$bwd
       |, bc AS (
       |  SELECT node, CAST(SUM(delta2) AS BIGINT) AS bc
       |  FROM ($unions) GROUP BY 1)
       |SELECT nn.vec_id, CAST(COALESCE(bc.bc, 0) AS BIGINT) AS bc_scaled
       |FROM n nn LEFT JOIN bc ON bc.node = nn.vec_id
       |ORDER BY nn.vec_id""".stripMargin
  }

  /** §2 entry `knn_graph_closeness` — HARMONIC closeness centrality,
    * the third centrality axis beside endorsement (PageRank/HITS) and
    * bridging (betweenness): how NEAR a vector sits to everything else
    * (Σ 1/dist — the formulation that is defined on disconnected
    * graphs, where classic closeness's Σdist diverges). High harmonic
    * closeness = a prototype at a cluster's center; near-zero = the
    * periphery a quality prune inspects first. Reuses the SAME
    * hop-bounded sampled-source BFS as betweenness (the bfsLayers
    * core): each (src, v) pair at distance r contributes the exact
    * integer ⌊G/r⌋ on the 2²⁰ grid — per-layer LITERAL weights, so the
    * whole statistic is one union + one grouped sum over the already-
    * disjoint layers; n_reached (sources within the hop bound) rides
    * along. Hash-gated: the oracle reuses the shared forward CTE chain
    * verbatim with the same ⌊G/r⌋ literals; zero-filled over the node
    * table. Spec pins the 5-node path's exact harmonic values and
    * layer-disjointness via n_reached.
    */
  private[graft] def closenessOn(edges: DataFrame, sources: DataFrame): DataFrame = {
    import edges.sparkSession.implicits._
    val (_, layers) = bfsLayers(edges, sources)
    (1 to BcHops)
      .map(r => layers(r).select($"node", lit(BcGrid / r).as("w")))
      .reduce(_ unionByName _)
      .groupBy($"node")
      .agg(sum($"w").as("harmonic"), count(lit(1)).as("n_reached"))
  }

  def knnGraphCloseness(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val edges = exactGraphOf(spark, dir).filter($"mutual")
      .select($"vec_id".as("a"), $"neighbor_id".as("b"))
    val nodes = VectorAgg.quantized(spark, dir).select($"vec_id")
    val sources = nodes.filter($"vec_id" % BcSourceMod === 0)
      .select($"vec_id".as("src"))
    nodes
      .join(closenessOn(edges, sources)
        .withColumnRenamed("node", "vec_id"), Seq("vec_id"), "left")
      .select($"vec_id",
        coalesce($"harmonic", lit(0L)).as("harmonic_scaled"),
        coalesce($"n_reached", lit(0L)).as("n_reached"))
      .orderBy($"vec_id")
  }

  val knnGraphClosenessSql: String = {
    val unions = (1 to BcHops)
      .map(r => s"SELECT node, CAST(${BcGrid / r} AS BIGINT) AS w FROM f$r")
      .mkString(" UNION ALL ")
    s"""$bcForwardSql
       |, hc AS (
       |  SELECT node, CAST(SUM(w) AS BIGINT) AS harmonic,
       |    CAST(COUNT(*) AS BIGINT) AS n_reached
       |  FROM ($unions) GROUP BY 1)
       |SELECT nn.vec_id,
       |  CAST(COALESCE(hc.harmonic, 0) AS BIGINT) AS harmonic_scaled,
       |  CAST(COALESCE(hc.n_reached, 0) AS BIGINT) AS n_reached
       |FROM n nn LEFT JOIN hc ON hc.node = nn.vec_id
       |ORDER BY nn.vec_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "knn_graph_betweenness" -> (knnGraphBetweenness _),
    "knn_graph_closeness"   -> (knnGraphCloseness _),
    "knn_graph_link_predict" -> (knnGraphLinkPredict _),
    "knn_graph_cc_star" -> (knnGraphCcStar _),
    "knn_graph_kcore" -> (knnGraphKcore _),
    "knn_graph_assortativity" -> (knnGraphAssortativity _),
    "knn_graph_communities" -> (knnGraphCommunities _),
    "knn_graph_triangles" -> (knnGraphTriangles _),
    "knn_graph_exact"    -> (knnGraphExact _),
    "knn_graph_ivf"      -> (knnGraphIvf _),
    "knn_graph_clusters" -> (knnGraphClusters _),
    "knn_graph_pagerank" -> (knnGraphPagerank _),
    "knn_graph_hits"     -> (knnGraphHits _),
    "knn_graph_modularity" -> (knnGraphModularity _),
    "knn_graph_conductance" -> (knnGraphConductance _),
    "ann_topk_graph"     -> (annTopkGraph _),
    "ann_topk_graph_persisted" -> (annTopkGraphPersisted _)
  )

  /** Oracle for `knn_graph_communities` — synchronous mode-voting LP is
    * exact integer arithmetic (vote counts + (count DESC, label ASC)
    * argmax), so the 5 fixed rounds unroll: vote edges are the directed
    * mutual table plus one self-loop per node (the self-vote), each
    * round joins the previous labels, counts votes per (node, label),
    * and picks the mode via a rank-1 window. MATERIALIZED per round —
    * each labels table feeds the next round's join.
    */
  /** The label-propagation CTE chain up to the final `l5` labels table —
    * shared by the communities oracle and the modularity tail.
    */
  private def lpChainCte: String = {
    val rounds = (1 to 5).map { r =>
      s""", c$r AS (
         |  SELECT v.dst, l.label, COUNT(*) AS c
         |  FROM ve v JOIN l${r - 1} l ON l.vec_id = v.src
         |  GROUP BY v.dst, l.label
         |), l$r AS MATERIALIZED (
         |  SELECT dst AS vec_id, label FROM (
         |    SELECT dst, label,
         |      row_number() OVER (PARTITION BY dst ORDER BY c DESC, label ASC) AS rn
         |    FROM c$r) WHERE rn = 1)""".stripMargin
    }.mkString("\n")
    s"""$mutualCte, ve AS MATERIALIZED (
       |  SELECT a AS src, b AS dst FROM mutual
       |  UNION ALL SELECT vec_id, vec_id FROM n
       |), l0 AS MATERIALIZED (
       |  SELECT vec_id, vec_id AS label FROM n
       |)
       |$rounds""".stripMargin
  }

  val knnGraphCommunitiesSql: String = {
    s"""$lpChainCte
       |, sizes AS (
       |  SELECT label, CAST(COUNT(*) AS BIGINT) AS community_size
       |  FROM l5 GROUP BY label
       |)
       |SELECT l.vec_id, l.label AS community, s.community_size
       |FROM l5 l JOIN sizes s USING (label)
       |ORDER BY l.vec_id""".stripMargin
  }

  /** Oracle for `knn_graph_ivf` (PROMOTED r11-cont): the shared
    * integer-exact Lloyd cells ([[VectorAgg.kmeansRankedCellsCte]]),
    * 5-deep probe for EVERY vector, exact-dot top-K edges, mutual flag
    * via the back-edge self-join — the approximate graph itself is
    * deterministic, so it hash-checks, not just its containment.
    */
  val knnGraphIvfSql: String =
    VectorAgg.kmeansRankedCellsCte +
      s"""
         |, assigned AS (
         |  SELECT vec_id AS neighbor_id, v AS nv, cell FROM ranked_cells WHERE rn = 1
         |), probed AS (
         |  SELECT vec_id, v AS va, cell FROM ranked_cells WHERE rn <= 5
         |), scored AS (
         |  SELECT p.vec_id, a.neighbor_id, ${VectorAgg.sqlDot("p.va", "a.nv")} AS dot
         |  FROM probed p JOIN assigned a USING (cell)
         |  WHERE p.vec_id <> a.neighbor_id
         |), knn2 AS MATERIALIZED (
         |  SELECT vec_id, neighbor_id, dot,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, neighbor_id) AS rank
         |  FROM scored QUALIFY rank <= $K
         |)
         |SELECT k.vec_id, CAST(k.rank AS INT) AS rank, k.neighbor_id, k.dot,
         |  (m.vec_id IS NOT NULL) AS mutual
         |FROM knn2 k LEFT JOIN knn2 m ON m.vec_id = k.neighbor_id AND m.neighbor_id = k.vec_id
         |ORDER BY k.vec_id, k.rank""".stripMargin

  /** Oracle for BOTH graph-ANN entries (PROMOTED r11-cont; the persisted
    * twin is spec-pinned row-identical): the navigable graph is the
    * deterministic IVF kNN graph, seeds are per-cell min members of the
    * unrolled Lloyd cells, and the beam is integer-dot scored with
    * (dot DESC, node) ties — so the 1 + BeamRounds beam states unroll
    * like every other iterative oracle (candidates = beam ∪ one-hop
    * expansion, DISTINCT, score, top-BeamWidth) and HNSW-style
    * graph search itself is hash-gated.
    */
  val annTopkGraphSql: String = {
    def beamRound(r: Int, cand: String) =
      s"""
         |, sc$r AS (
         |  SELECT c.query_id, c.node, ${VectorAgg.sqlDot("qq.qv", "nn.v")} AS dot
         |  FROM $cand c
         |  JOIN queriesg qq ON qq.query_id = c.query_id
         |  JOIN n nn ON nn.vec_id = c.node
         |  WHERE c.node <> c.query_id
         |), b$r AS MATERIALIZED (
         |  SELECT query_id, node, dot FROM (
         |    SELECT query_id, node, dot,
         |      row_number() OVER (PARTITION BY query_id ORDER BY dot DESC, node) AS rn
         |    FROM sc$r) WHERE rn <= $BeamWidth
         |)""".stripMargin
    val rounds = (1 to BeamRounds).map { r =>
      s"""
         |, cand$r AS (
         |  SELECT DISTINCT query_id, node FROM (
         |    SELECT query_id, node FROM b${r - 1}
         |    UNION ALL
         |    SELECT b.query_id, a.dst AS node FROM b${r - 1} b JOIN adj a ON a.src = b.node)
         |)""".stripMargin + beamRound(r, s"cand$r")
    }.mkString
    VectorAgg.kmeansRankedCellsCte +
      s"""
         |, assignedg AS MATERIALIZED (
         |  SELECT vec_id AS neighbor_id, v AS nv, cell FROM ranked_cells WHERE rn = 1
         |), probedg AS (
         |  SELECT vec_id, v AS va, cell FROM ranked_cells WHERE rn <= 5
         |), scoredg AS (
         |  SELECT p.vec_id, a.neighbor_id, ${VectorAgg.sqlDot("p.va", "a.nv")} AS dot
         |  FROM probedg p JOIN assignedg a USING (cell)
         |  WHERE p.vec_id <> a.neighbor_id
         |), knn3 AS MATERIALIZED (
         |  SELECT vec_id, neighbor_id FROM (
         |    SELECT vec_id, neighbor_id,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, neighbor_id) AS rank
         |    FROM scoredg) WHERE rank <= $K
         |), adj AS MATERIALIZED (
         |  SELECT vec_id AS src, neighbor_id AS dst FROM knn3
         |  UNION
         |  SELECT neighbor_id AS src, vec_id AS dst FROM knn3
         |), seedsg AS MATERIALIZED (
         |  SELECT MIN(neighbor_id) AS node FROM assignedg GROUP BY cell
         |), queriesg AS MATERIALIZED (
         |  SELECT vec_id AS query_id, v AS qv FROM n WHERE vec_id % 10 = 0
         |), cand0 AS (
         |  SELECT DISTINCT query_id, node FROM (
         |    SELECT q3.query_id, a.dst AS node FROM queriesg q3 JOIN adj a ON a.src = q3.query_id
         |    UNION ALL
         |    SELECT q3.query_id, s.node FROM queriesg q3 CROSS JOIN seedsg s)
         |)""".stripMargin +
      beamRound(0, "cand0") + rounds +
      s"""
         |SELECT query_id, CAST(rn AS INT) AS rank, node AS neighbor_id, dot FROM (
         |  SELECT query_id, node, dot,
         |    row_number() OVER (PARTITION BY query_id ORDER BY dot DESC, node) AS rn
         |  FROM b$BeamRounds) WHERE rn <= 5
         |ORDER BY query_id, rank""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    "knn_graph_betweenness" -> knnGraphBetweennessSql,
    "knn_graph_closeness"   -> knnGraphClosenessSql,
    "knn_graph_communities" -> knnGraphCommunitiesSql,
    "knn_graph_ivf" -> knnGraphIvfSql,
    "ann_topk_graph" -> annTopkGraphSql,
    "ann_topk_graph_persisted" -> annTopkGraphSql,
    "knn_graph_exact" -> knnGraphExactSql,
    "knn_graph_triangles" -> knnGraphTrianglesSql,
    "knn_graph_link_predict" -> knnGraphLinkPredictSql,
    "knn_graph_assortativity" -> knnGraphAssortativitySql,
    "knn_graph_kcore" -> knnGraphKcoreSql,
    "knn_graph_clusters" -> knnGraphCcSql,
    "knn_graph_cc_star" -> knnGraphCcSql,
    "knn_graph_pagerank" -> knnGraphPagerankSql,
    "knn_graph_hits" -> knnGraphHitsSql,
    "knn_graph_modularity" -> knnGraphModularitySql,
    "knn_graph_conductance" -> knnGraphConductanceSql
  )
}
