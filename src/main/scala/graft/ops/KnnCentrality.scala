package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import KnnGraph.{K, exactGraphOf, mutualCte}

/** CENTRALITY analytics over the session's shared exact kNN graph
  * ([[KnnGraph.exactGraphOf]]) — split out of KnnGraph along the family
  * seams (r13 verdict #7; no behavior change): the endorsement axis
  * (PageRank, HITS) and the bridging/nearness axis (sampled hop-bounded
  * Brandes betweenness + harmonic closeness over the shared
  * [[bfsLayers]] multi-source BFS core). All four run on exact integer
  * grids so every iterative recurrence unrolls into a MATERIALIZED
  * DuckDB oracle and hash-gates — see each entry's Scaladoc.
  */
object KnnCentrality {

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
    val nodes = VectorAgg.quantized(spark, dir).select($"vec_id").localCheckpoint()
    val n = nodes.count() // bounded driver pull: one long, the Lloyd contract
    // r12: the static edge table pins its src-hash layout ONCE (the ALS
    // discipline, PinnedLayout) — each round's join then streams it in
    // place and only the n-row rank table crosses the wire (plan-pinned
    // in KnnGraphSpec); before this the "pre-partitions by src" claim
    // was doc-only and every round re-shuffled the n·k edges.
    // r16: pin SIZED by the exact edge count (every node has K
    // out-edges), so the 8 per-round rank exchanges stop paying `cpus`
    // tasks at small inputs — partition count still scales linearly to
    // the configured cap (guide §2.2).
    val edgesDeg = graft.plans.PinnedLayout.pinByKeySized(
      edges.join(outDeg, Seq("src")), "src", n * K)
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
    val nodes = VectorAgg.quantized(spark, dir).select($"vec_id").localCheckpoint()
    // r16: both pinned edge copies sized by the exact n·K edge count
    // (one bounded count off the checkpointed node list) — the 16
    // per-half-round score exchanges stop paying `cpus` tasks at small
    // inputs; linear-to-cap at scale (guide §2.2)
    val nNodes = nodes.count()
    val eBySrc = graft.plans.PinnedLayout.pinByKeySized(edges, "src", nNodes * K)
    val eByDst = graft.plans.PinnedLayout.pinByKeySized(edges, "dst", nNodes * K)
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
    // NOTE (r15): a lazy auth half-round (skip this checkpoint, recompute
    // the gather inside the next barrier) was tried and REVERTED — it
    // measured faster isolated (7.3 vs 8.0 s) but consistently ~1 s
    // slower inside the full bench, where the doubled gather work
    // contends with the suite; the checkpoint stays.
    val raw = hitsRawGather(edgesPinned, values, joinKey, groupKey).localCheckpoint()
    // coalesce: an edgeless graph yields an empty gather → NULL max; d=1
    // keeps the divide defined (raw is empty, so the round stays empty —
    // the sparse absent-node-is-zero form the oracle zero-fill matches).
    // r15 perf pass: the divisor stays IN-PLAN as a broadcast 1-row
    // cross join over the checkpointed gather instead of a per-half-round
    // driver head() — 16 fewer driver barriers per entry (the documented
    // knn_graph_hits scalar-crossJoin device; same integers, same floor
    // division, bit-identical scores).
    val d = raw.agg(expr(
      s"coalesce(max(raw) div $HitsScale + CAST(1 AS BIGINT), CAST(1 AS BIGINT))").as("d"))
    raw.crossJoin(broadcast(d))
      .select(col(groupKey).as("vec_id"), expr("raw div d").as("x"))
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
    // r16: sized pin — one bounded count (the callers hand in a filter
    // over the session-checkpointed exact graph, so this scans cached
    // blocks); the 4+3 BFS/back-propagation rounds then stop paying
    // `cpus` tasks per join at small inputs (guide §2.2)
    val ePinned = graft.plans.PinnedLayout.pinByKeySized(
      edges.select($"a", $"b"), "a", edges.count())
    var frontier = sources.select($"src", $"src".as("node"), lit(1L).as("sigma"))
      .localCheckpoint()
    val layers = scala.collection.mutable.ArrayBuffer(frontier)
    for (_ <- 1 to BcHops) {
      val cand = ePinned
        .join(frontier.withColumnRenamed("node", "a").hint("shuffle_hash"), Seq("a"))
        .select($"src", $"b".as("node"), $"sigma")
      // the visited set IS the union of the already-checkpointed layers —
      // anti-join that lazy union directly instead of materializing a
      // separate cumulative `visited` frame every round (r15 perf pass:
      // one checkpoint per round instead of two; ≤ BcHops checkpointed
      // inputs under the union, same disjointness)
      val visited = layers.map(_.select($"src", $"node")).reduce(_ unionByName _)
      val nf = cand.join(visited, Seq("src", "node"), "left_anti")
        .groupBy($"src", $"node").agg(sum($"sigma").as("sigma"))
        .localCheckpoint()
      layers += nf
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
}
