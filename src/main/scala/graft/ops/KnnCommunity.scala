package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import KnnGraph.{exactGraphOf, mutualCte}

/** COMMUNITY structure over the session's shared exact kNN graph —
  * split out of KnnGraph along the family seams (r13 verdict #7; no
  * behavior change): synchronous mode-voting label propagation + the
  * modularity/conductance quality gates off one cached per-community
  * stats frame, and the large-star/small-star connected components
  * (with the shared exact-fixpoint reachability oracle both CC entries
  * are pinned to). See each entry's Scaladoc for the scale shape.
  */
object KnnCommunity {

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
    // ALS/PageRank discipline); each round's join streams it in place.
    // r16: sized pin — two bounded counts (the entry hands in a
    // checkpointed edge list and a parquet-projection node list); the 5
    // per-round label exchanges then stop paying `cpus` tasks at small
    // inputs, linear-to-cap at scale (guide §2.2)
    val voteEdges = graft.plans.PinnedLayout.pinByKeySized(
      edges.select($"src", $"dst").union(selfLoops), "src",
      edges.count() + nodes.count())
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
}
