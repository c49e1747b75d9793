package graft

import org.apache.spark.sql.functions._

/** kNN-graph family: IVF recall vs the exact twin, mutual-flag truth, and
  * cluster validity against a driver-side union-find reference.
  */
class KnnGraphSpec extends SparkSuite {

  private def edgeSet(rows: Seq[(Long, Long)]): Set[(Long, Long)] = rows.toSet

  test("knn_graph_ivf recall@4 vs the exact graph ≥ 0.6; overlapping edges dot-identical") {
    import spark.implicits._
    val exact = ops.KnnGraph.knnGraphExact(spark, sf)
      .select($"vec_id", $"neighbor_id", $"dot").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val ivf = ops.KnnGraph.knnGraphIvf(spark, sf)
      .select($"vec_id", $"neighbor_id", $"dot").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val hit = ivf.keySet.intersect(exact.keySet)
    val recall = hit.size.toDouble / exact.size
    assert(recall >= 0.6, s"recall@4 = $recall")
    // any edge both graphs emit carries the SAME exact integer dot
    hit.foreach { e => assert(ivf(e) == exact(e), s"dot mismatch on $e") }
  }

  test("mutual flag is exactly reverse-edge membership") {
    import spark.implicits._
    val g = ops.KnnGraph.knnGraphExact(spark, sf)
      .select($"vec_id", $"neighbor_id", $"mutual").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getBoolean(2)))
    val edges = edgeSet(g.map(_._1).toSeq)
    g.foreach { case ((a, b), m) =>
      assert(m == edges.contains((b, a)), s"mutual($a,$b)")
    }
    assert(g.exists(_._2) && g.exists(!_._2), "both flag values must occur")
  }

  test("graph ANN: recall@5 vs exact ≥ 0.6, overlapping dots exact, k rows per query") {
    import spark.implicits._
    val exact = ops.LlmQueries.annTopkExact(spark, sf)
      .select($"query_id", $"neighbor_id", $"dot").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val graph = ops.KnnGraph.annTopkGraph(spark, sf)
      .select($"query_id", $"neighbor_id", $"dot").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val hit = graph.keySet.intersect(exact.keySet)
    val recall = hit.size.toDouble / exact.size
    assert(recall >= 0.6, s"graph-ANN recall@5 = $recall")
    hit.foreach(e => assert(graph(e) == exact(e), s"dot mismatch on $e"))
    // exactly 5 ranked rows per query (beam ≥ 5 after the self-screen)
    val perQuery = graph.keySet.groupBy(_._1).view.mapValues(_.size)
    perQuery.foreach { case (q, n) => assert(n == 5, s"query $q emitted $n rows") }
  }

  test("persisted graph: serve == in-session; append links new nodes navigably") {
    import spark.implicits._
    // save-once entry serves the identical result (same graph, same walk)
    val inSession = ops.KnnGraph.annTopkGraph(spark, sf).collect().map(_.toSeq).toSeq
    val served = ops.KnnGraph.annTopkGraphPersisted(spark, sf).collect().map(_.toSeq).toSeq
    assert(served == inSession, "persisted graph serve diverges from in-session")

    // incremental insertion: graph built on the landed 450, the last 50
    // appended through beam-search linking
    val base = s"/tmp/graft_test_knn_graph_${System.nanoTime()}"
    val q = ops.VectorAgg.quantized(spark, sf)
    val landed = q.filter($"vec_id" < 450L)
    val batch = q.filter($"vec_id" >= 450L)
    ops.KnnGraph.saveKnnGraphOf(spark, sf, landed, base)
    val adjBefore = spark.read.parquet(s"$base/adj").count()
    val filesBefore = new java.io.File(s"$base/adj").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => f.getName -> f.lastModified()).toMap
    ops.KnnGraph.appendToKnnGraph(spark, sf, batch, base)
    // strictly additive: landed adjacency files untouched, edges grew
    val filesAfter = new java.io.File(s"$base/adj").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => f.getName -> f.lastModified()).toMap
    filesBefore.foreach { case (f, t) =>
      assert(filesAfter.get(f).contains(t), s"append rewrote landed adj file $f")
    }
    assert(spark.read.parquet(s"$base/adj").count() > adjBefore)
    // every appended node is navigable: linked bidirectionally into the graph
    val adj = spark.read.parquet(s"$base/adj")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (450L until 500L).foreach { v =>
      val out = adj.filter(_._1 == v)
      assert(out.nonEmpty, s"appended node $v has no out-edges")
      out.foreach { case (a, b) => assert(adj.contains((b, a)), s"edge ($a,$b) not bidirectional") }
      assert(out.forall(_._2 < 450L), s"appended node $v linked to a batch node")
    }
    // the incrementally-built graph still answers queries: recall vs the
    // exact twin within 0.15 of the full-rebuild graph's recall
    val exact = ops.LlmQueries.annTopkExact(spark, sf)
      .select($"query_id", $"neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallOf(rows: Seq[org.apache.spark.sql.Row]): Double = {
      val got = rows.map(r => (r.getLong(0), r.getLong(2))).toSet
      got.intersect(exact).size.toDouble / exact.size
    }
    val incServe = ops.KnnGraph.annTopkGraphFromIndex(spark, sf, base)
      .select($"query_id", $"rank", $"neighbor_id").collect().toSeq
    val fullRecall = recallOf(ops.KnnGraph.annTopkGraph(spark, sf)
      .select($"query_id", $"rank", $"neighbor_id").collect().toSeq)
    val incRecall = recallOf(incServe)
    assert(incRecall >= fullRecall - 0.15,
      s"incremental graph recall $incRecall vs rebuild $fullRecall")
  }

  test("pagerank equals the single-threaded integer reference rank-for-rank; mass bounded") {
    import spark.implicits._
    val edges = ops.KnnGraph.knnGraphExact(spark, sf)
      .select($"vec_id", $"neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val nodes = ops.VectorAgg.quantized(spark, sf)
      .select($"vec_id").collect().map(_.getLong(0)).toSeq.sorted
    // reference: same integer recurrence, sequential
    val scale = 1000000000000L
    val n = nodes.size
    val base = (3L * scale / 20L) / n
    val out = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var r = nodes.map(v => v -> scale / n).toMap
    for (_ <- 1 to 8) {
      val in = scala.collection.mutable.Map(nodes.map(v => v -> 0L): _*)
      edges.foreach { case (u, v) => in(v) += r(u) / out(u) }
      r = nodes.map(v => v -> (base + 17L * in(v) / 20L)).toMap
    }
    val got = ops.KnnCentrality.knnGraphPagerank(spark, sf)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toMap
    assert(got.keySet == r.keySet)
    nodes.foreach(v => assert(got(v) == r(v), s"rank($v): ${got(v)} != ${r(v)}"))
    // floor division only LEAKS mass: total stays under the scale, and
    // above the pure-teleport floor
    val mass = got.values.sum
    assert(mass <= scale && mass >= base * n, s"mass $mass out of bounds")
    // centrality is non-degenerate: ranks differ across nodes
    assert(got.values.toSet.size > 1)
  }

  test("hits equals the single-threaded integer reference hub- and auth-for-node") {
    import spark.implicits._
    val edges = ops.KnnGraph.knnGraphExact(spark, sf)
      .select($"vec_id", $"neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val nodes = ops.VectorAgg.quantized(spark, sf)
      .select($"vec_id").collect().map(_.getLong(0)).toSeq.sorted
    // reference: same gather + max-quantize recurrence, sequential
    val scale = 1000000000L
    def quantize(raw: Map[Long, Long]): Map[Long, Long] = {
      val d = raw.values.max / scale + 1L
      nodes.map(v => v -> raw.getOrElse(v, 0L) / d).toMap
    }
    var h = nodes.map(v => v -> scale).toMap
    var a = Map.empty[Long, Long]
    for (_ <- 1 to 8) {
      val ar = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      edges.foreach { case (u, v) => ar(v) += h(u) }
      a = quantize(ar.toMap)
      val hr = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      edges.foreach { case (u, v) => hr(u) += a(v) }
      h = quantize(hr.toMap)
    }
    val got = ops.KnnCentrality.knnGraphHits(spark, sf)
      .collect().map(x => (x.getLong(0), (x.getLong(1), x.getLong(2)))).toMap
    assert(got.keySet == nodes.toSet)
    nodes.foreach { v =>
      assert(got(v)._1 == h(v), s"hub($v): ${got(v)._1} != ${h(v)}")
      assert(got(v)._2 == a(v), s"auth($v): ${got(v)._2} != ${a(v)}")
    }
    // the two roles genuinely differ: every node has k out-edges so hubs
    // are all positive, while authority concentrates (some node has none)
    assert(got.values.forall(_._1 > 0L))
    assert(got.values.map(_._2).toSet.size > 1)
    assert(nodes.sortBy(v => -got(v)._1) != nodes.sortBy(v => -got(v)._2),
      "hub and authority orderings should not coincide on the corpus")
  }

  test("modularity: integer columns match a driver reference; sentinel row is Q") {
    import spark.implicits._
    val rows = ops.KnnCommunity.knnGraphModularity(spark, sf).collect()
    val (totalRows, commRows) = rows.partition(_.getAs[Long]("community") == -1L)
    assert(totalRows.length == 1 && commRows.nonEmpty)
    val labels = ops.KnnCommunity.knnGraphCommunities(spark, sf)
      .select($"vec_id", $"community").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val mutual = ops.KnnGraph.knnGraphExact(spark, sf)
      .filter($"mutual" && $"vec_id" < $"neighbor_id")
      .select($"vec_id", $"neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val m = mutual.length.toLong
    val eC = mutual.groupBy { case (a, b) =>
      if (labels(a) == labels(b)) labels(a) else -999L
    }.view.mapValues(_.length.toLong).toMap
    val dC = mutual.flatMap { case (a, b) => Seq(labels(a), labels(b)) }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    commRows.foreach { r =>
      val c = r.getAs[Long]("community")
      assert(r.getAs[Long]("internal_edges") == eC.getOrElse(c, 0L), s"e($c)")
      assert(r.getAs[Long]("degree_sum") == dC.getOrElse(c, 0L), s"d($c)")
    }
    val tot = totalRows.head
    assert(tot.getAs[Long]("community_size") == labels.size.toLong)
    assert(tot.getAs[Long]("degree_sum") == 2L * m, "handshake identity")
    // sentinel q == Newman Q from the exact integer sums
    val q = tot.getAs[Double]("q_contribution")
    val wantQ = eC.filterKeys(_ != -999L).values.sum.toDouble / m -
      dC.values.map(d => d.toDouble * d).sum / ((2.0 * m) * (2.0 * m))
    assert(math.abs(q - wantQ) < 1e-9, s"$q vs $wantQ")
    assert(q >= -0.5 && q <= 1.0)
  }

  test("conductance: cut identity with modularity stats, bounds, NULL edge") {
    import spark.implicits._
    val mod = ops.KnnCommunity.knnGraphModularity(spark, sf).collect()
      .filter(_.getAs[Long]("community") != -1L)
      .map(r => r.getAs[Long]("community") ->
        (r.getAs[Long]("internal_edges"), r.getAs[Long]("degree_sum"))).toMap
    val m = ops.KnnGraph.knnGraphExact(spark, sf)
      .filter($"mutual" && $"vec_id" < $"neighbor_id").count()
    val rows = ops.KnnCommunity.knnGraphConductance(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("community")).toSet == mod.keySet)
    rows.foreach { r =>
      val c = r.getAs[Long]("community")
      val (e, d) = mod(c)
      assert(r.getAs[Long]("cut_edges") == d - 2 * e, s"cut($c)")
      assert(r.getAs[Long]("volume") == d)
      val minVol = math.min(d, 2 * m - d)
      if (minVol > 0) {
        val phi = r.getAs[Double]("conductance")
        assert(phi == (d - 2 * e).toDouble / minVol)
        assert(phi >= 0.0 && phi <= (if (d <= m) 1.0 + 1e-12 else phi))
      } else assert(r.isNullAt(r.fieldIndex("conductance")))
    }
    // LP communities are real structure on this corpus: some community
    // keeps most of its volume inside
    assert(rows.exists(r => !r.isNullAt(r.fieldIndex("conductance")) &&
      r.getAs[Double]("conductance") < 0.5))
  }

  test("clusters = union-find over the exact graph's mutual edges; keeper is the component min") {
    import spark.implicits._
    val knn = ops.KnnGraph.knnGraphExact(spark, sf)
      .filter($"mutual" && $"vec_id" < $"neighbor_id")
      .select($"vec_id", $"neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val all = ops.VectorAgg.quantized(spark, sf)
      .select($"vec_id").collect().map(_.getLong(0)).toSeq
    // driver-side union-find reference
    val parent = scala.collection.mutable.Map(all.map(v => v -> v): _*)
    def find(x: Long): Long = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
    knn.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = all.map(v => v -> {
      val root = find(v)
      all.filter(u => find(u) == root).min
    }).toMap
    val got = ops.KnnGraph.knnGraphClusters(spark, sf)
      .select($"vec_id", $"cluster", $"cluster_size").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.map(_._1).toSeq.sorted == all.sorted, "every vector labeled once")
    got.foreach { case (v, c, _) => assert(c == want(v), s"cluster($v)") }
    // sizes: per-keeper counts of the reference partition
    val sizes = want.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    got.foreach { case (_, c, s) => assert(s == sizes(c)) }
    assert(got.exists(_._3 > 1L), "at least one non-singleton cluster (non-vacuous)")
  }

  test("large/small-star CC property: equals driver union-find on 20 random graphs") {
    import spark.implicits._
    val rng = new scala.util.Random(4242)
    (1 to 20).foreach { trial =>
      val n = 2 + rng.nextInt(40)
      val nEdges = rng.nextInt(60)
      val edges = (1 to nEdges)
        .map(_ => (rng.nextInt(n).toLong, rng.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      // driver union-find reference over the same node universe
      val parent = scala.collection.mutable.Map((0L until n).map(v => v -> v): _*)
      def find(x: Long): Long = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val want = (0L until n).map(v => v -> {
        val r = find(v)
        (0L until n).filter(u => find(u) == r).min
      }).toMap
      if (edges.nonEmpty) {
        val got = ops.KnnCommunity.ccStarLabels(edges.toDF("a", "b")).collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        // ccStarLabels only labels nodes with at least one edge
        got.foreach { case (v, l) => assert(l == want(v), s"trial $trial node $v") }
        val touched = edges.flatMap(e => Seq(e._1, e._2)).toSet
        assert(got.keySet == touched, s"trial $trial label coverage")
      }
    }
  }

  test("knn_graph_cc_star == knn_graph_clusters label-for-label on the corpus") {
    val a = ops.KnnCommunity.knnGraphCcStar(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val b = ops.KnnGraph.knnGraphClusters(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(a.toSeq == b.toSeq,
      "two CC algorithms over the same mutual-kNN edges must agree exactly")
  }

  test("assortativity: bounded Pearson over exactly the mutual edge set") {
    import spark.implicits._
    val row = ops.KnnCensus.knnGraphAssortativity(spark, sf).head
    val nMutual = ops.KnnGraph.knnGraphExact(spark, sf)
      .filter($"mutual").count()
    assert(row.getLong(0) == nMutual, "one (x,y) sample per directed mutual edge")
    val r = row.getDouble(1)
    assert(r >= -1.0 - 1e-12 && r <= 1.0 + 1e-12, s"assortativity $r out of range")
  }

  test("k-core: equals a driver peeling reference; every core degree >= 2") {
    import spark.implicits._
    val edges = ops.KnnGraph.knnGraphExact(spark, sf).filter($"mutual")
      .select($"vec_id", $"neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // driver peeling of the same directed mutual edge set
    var e = edges
    var stable = false
    while (!stable) {
      val deg = e.groupBy(_._1).view.mapValues(_.size).toMap
      val keep = deg.filter(_._2 >= 2).keySet
      val e2 = e.filter { case (a, b) => keep(a) && keep(b) }
      stable = e2.length == e.length
      e = e2
    }
    val want = e.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val got = ops.KnnCensus.knnGraphKcore(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want, "distributed peeling must equal the driver reference")
    assert(got.nonEmpty && got.values.forall(_ >= 2L))
    assert(got.size < edges.map(_._1).distinct.length,
      "peeling must actually remove something on this corpus")
  }

  test("link prediction: hand-checked wedge graph — scores, anti-join, determinism") {
    import spark.implicits._
    // path 1-2-3 plus 3-4: non-edges (1,3) and (2,4) each share exactly one
    // neighbor; (1,4) shares none (2 hops apart via no common neighbor).
    // Undirected edges materialized in both directions like mutual-kNN.
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    val e = (und ++ und.map(_.swap)).toDF("a", "b")
    val got = ops.KnnCensus.linkPredictOn(e).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    assert(got.keySet == Set((1L, 3L), (2L, 4L)), "exactly the 2-hop non-edges")
    // (1,3): common neighbor {2}; deg(1)=1, deg(3)=2 → jaccard 1/2
    assert(got((1L, 3L)) == ((1L, 1L, 2L, 0.5)))
    // (2,4): common neighbor {3}; deg(2)=2, deg(4)=1 → jaccard 1/2
    assert(got((2L, 4L)) == ((1L, 2L, 1L, 0.5)))
  }

  test("pagerank/LPA rounds: entity table shuffle-joins into the pinned edge layout") {
    import spark.implicits._
    import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
    import org.apache.spark.sql.execution.joins.ShuffledHashJoinExec
    import org.apache.spark.sql.catalyst.optimizer.BuildRight
    import org.apache.spark.sql.functions._
    // the ALS-weak discipline applied to the graph family (r12): the
    // static corpus-sized edge table pins its layout once; every round's
    // join must stream it (no exchange beneath it) and hash-build the
    // entity-sized rank/label table (no broadcast of it either — at 100×
    // the rank table is corpus-entity-sized, a driver-collect hazard)
    def assertPinnedRound(df: org.apache.spark.sql.DataFrame, entityCols: Set[String]): Unit = {
      df.collect() // finalize AQE
      val nodes = tools.PlanWalk.flatten(df.queryExecution.executedPlan)
      val badBroadcasts = nodes.collect {
        case b: BroadcastExchangeExec
          if b.output.exists(a => entityCols.contains(a.name)) => b
      }
      assert(badBroadcasts.isEmpty, badBroadcasts.map(_.treeString).mkString("\n---\n"))
      val joins = nodes.collect { case j: ShuffledHashJoinExec => j }
      assert(joins.nonEmpty, df.queryExecution.executedPlan.toString)
      joins.foreach { j =>
        val streamed = if (j.buildSide == BuildRight) j.left else j.right
        assert(!tools.PlanWalk.flatten(streamed)
          .exists(_.isInstanceOf[ShuffleExchangeExec]),
          s"edge side re-shuffled:\n${streamed.treeString}")
      }
    }
    val knn = ops.KnnGraph.knnGraphExact(spark, sf)
    val edges = knn.select($"vec_id".as("src"), $"neighbor_id".as("dst"))
    val outDeg = edges.groupBy($"src").agg(count(lit(1)).as("out"))
    val edgesDeg = plans.PinnedLayout.pinByKey(edges.join(outDeg, Seq("src")), "src")
    val nodes = ops.VectorAgg.quantized(spark, sf).select($"vec_id").localCheckpoint()
    val ranks = nodes.select($"vec_id", lit(1000L).as("r")).localCheckpoint()
    assertPinnedRound(ops.KnnCentrality.prRound(edgesDeg, ranks, nodes, 7L), Set("r"))
    val voteEdges = plans.PinnedLayout.pinByKey(
      knn.filter($"mutual").select($"vec_id".as("src"), $"neighbor_id".as("dst"))
        .union(nodes.select($"vec_id".as("src"), $"vec_id".as("dst"))), "src")
    val labels = nodes.select($"vec_id", $"vec_id".as("label")).localCheckpoint()
    assertPinnedRound(ops.KnnCommunity.lpRound(voteEdges, labels), Set("label"))
    // HITS half-round: same contract on both pinned edge copies
    val scores = nodes.select($"vec_id", lit(1000000000L).as("x")).localCheckpoint()
    assertPinnedRound(
      ops.KnnCentrality.hitsRawGather(edgesDeg.select($"src", $"dst"), scores, "src", "dst"),
      Set("x"))
  }

  private def bcOn(und: Seq[(Long, Long)], sources: Seq[Long]) = {
    import spark.implicits._
    val edges = (und ++ und.map(_.swap)).toDF("a", "b")
    val src = sources.toDF("src")
    ops.KnnCentrality.betweennessOn(edges, src).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("betweenness: 5-node path matches the exact ordered-pair counts") {
    // all sigma = 1 -> the grid arithmetic is EXACT: bc(v) = G * (number
    // of ordered source/target pairs whose shortest path crosses v)
    val g = 1048576L
    val bc = bcOn(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)), Seq(1L, 2L, 3L, 4L, 5L))
    assert(bc.getOrElse(1L, 0L) == 0L && bc.getOrElse(5L, 0L) == 0L)
    assert(bc(2L) == 6L * g)
    assert(bc(3L) == 8L * g)
    assert(bc(4L) == 6L * g)
  }

  test("betweenness: diamond splits the two shortest paths exactly in half") {
    // 1-2-4 and 1-3-4: sigma(4 from 1) = 2, so delta(2) = delta(3) =
    // floor(1*(G+0)/2) = G/2 per crossing source pair; symmetry gives
    // every node the same bc = G
    val g = 1048576L
    val bc = bcOn(Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L)), Seq(1L, 2L, 3L, 4L))
    Seq(1L, 2L, 3L, 4L).foreach(v => assert(bc(v) == g, s"node $v"))
  }

  test("closeness: 5-node path harmonic values are the exact floor(G/r) sums") {
    import spark.implicits._
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val edges = (und ++ und.map(_.swap)).toDF("a", "b")
    val src = Seq(1L, 2L, 3L, 4L, 5L).toDF("src")
    val hc = ops.KnnCentrality.closenessOn(edges, src).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val g = 1048576L
    // center: dists {1,1,2,2}; end: dists {1,2,3,4}
    assert(hc(3L) == (2 * g + 2 * (g / 2), 4L))
    assert(hc(1L) == (g + g / 2 + g / 3 + g / 4, 4L))
    assert(hc(5L) == hc(1L), "path symmetry")
  }

  test("betweenness corpus entry: zero-filled over all nodes, deterministic") {
    val a = ops.KnnCentrality.knnGraphBetweenness(spark, sf).collect()
    val b = ops.KnnCentrality.knnGraphBetweenness(spark, sf).collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    val nNodes = ops.VectorAgg.quantized(spark, sf).count()
    assert(a.length == nNodes, "every node gets a row (zeros included)")
    assert(a.exists(_.getLong(1) > 0L), "some bridge traffic exists")
    a.foreach(r => assert(r.getLong(1) >= 0L))
  }

  test("hits gather on an edgeless graph is empty and defined (no NPE divisor)") {
    import spark.implicits._
    val edges = Seq.empty[(Long, Long)].toDF("src", "dst")
    val scores = Seq((1L, 1000000000L), (2L, 500L)).toDF("vec_id", "x")
    // Pre-guard this threw on getLong(0): MAX over the empty gather is
    // NULL. The coalesced divisor keeps the round defined and empty.
    val out = ops.KnnCentrality.hitsGather(edges, scores, "src", "dst")
    assert(out.count() == 0L)
    assert(out.columns.toSeq == Seq("vec_id", "x"))
  }

  test("knn_graph_link_predict: predictions are non-edges with bounded evidence") {
    import spark.implicits._
    val mutual = ops.KnnGraph.knnGraphExact(spark, sf).filter($"mutual")
      .select($"vec_id", $"neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val rows = ops.KnnCensus.knnGraphLinkPredict(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 50)
    assert(rows.map(_.getAs[Long]("rank")).toSeq == (1L to rows.length).toSeq)
    rows.foreach { r =>
      val (a, b) = (r.getAs[Long]("a"), r.getAs[Long]("b"))
      assert(a < b, "canonical pair order")
      assert(!mutual.contains((a, b)) && !mutual.contains((b, a)),
        s"($a,$b) must not already be an edge")
      val cn = r.getAs[Long]("cn")
      assert(cn >= 1L && cn <= 4L, "common neighbors bounded by k=4")
      val j = r.getAs[Double]("jaccard")
      assert(j > 0.0 && j <= 1.0)
    }
  }
}
