package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Round-16 stage profiler (the r15 throwaway-driver discipline, kept as
  * a tool): times named sub-stages of the entries under optimization by
  * materializing each through localCheckpoint and printing wall-clock +
  * row count. Not part of any benched path.
  */
object Prof16 {
  def main(args: Array[String]): Unit = {
    val which = args.headOption.getOrElse("sq8")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    import spark.implicits._

    def stage(name: String)(df: => DataFrame): DataFrame = {
      val t0 = System.nanoTime()
      val out = df.localCheckpoint()
      val n = out.count()
      System.err.println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$n")
      out
    }

    which match {
      case "sq8" =>
        (1 to 2).foreach { rep =>
          System.err.println(s"--- rep $rep")
          val q = stage("quantized")(graft.ops.LlmQueries.quantized(spark, sfDir))
          val coded = stage("coded")(graft.ops.EmbeddingSq.coded(spark, sfDir))
          val recon = stage("recon")(coded
            .withColumn("rv", expr(
              """transform(sequence(0, size(v) - 1), i ->
                |  254L * st[i].mn + codes[i] * (st[i].mx - st[i].mn))""".stripMargin))
            .select($"vec_id", $"v", $"rv"))
          val queries = recon.filter($"vec_id" % 10 === 0)
            .select($"vec_id".as("query_id"), $"rv".as("qrv"), $"v".as("qv"))
          val shortlist = stage("shortlist")(queries
            .join(recon.select($"vec_id".as("neighbor_id"), $"rv"),
              $"query_id" =!= $"neighbor_id")
            .withColumn("approx_dot",
              graft.functions.LongVectorDot.vector_dot($"qrv", $"rv"))
            .groupBy($"query_id")
            .agg(graft.functions.PartialTopK.partial_topk(
              struct((-$"approx_dot").as("neg_dot"), $"neighbor_id".as("neighbor_id")),
              15).as("topk"))
            .select($"query_id", explode($"topk.neighbor_id").as("neighbor_id")))
          val reranked = stage("rerank")(shortlist
            .join(queries.select($"query_id", $"qv"), Seq("query_id"))
            .join(recon.select($"vec_id".as("neighbor_id"), $"v".as("nv")), Seq("neighbor_id"))
            .withColumn("dot", graft.functions.LongVectorDot.vector_dot($"qv", $"nv"))
            .groupBy($"query_id")
            .agg(graft.functions.PartialTopK.partial_topk(
              struct((-$"dot").as("neg_dot"), $"neighbor_id".as("neighbor_id"), $"dot".as("dot")),
              5).as("topk"))
            .select($"query_id", posexplode($"topk").as(Seq("pos", "s"))))
          reranked.count()
        }
      case "overlap" =>
        (1 to 2).foreach { rep =>
          System.err.println(s"--- rep $rep")
          val li = graft.Tables.lineitem(spark, sfDir).select($"l_orderkey", $"l_suppkey")
          val ord = graft.Tables.orders(spark, sfDir).select($"o_orderkey", $"o_custkey")
          val uaCounts = stage("uaCounts")(li.join(ord, $"l_orderkey" === $"o_orderkey")
            .groupBy($"o_custkey".as("user_id"), $"l_suppkey".as("artist_id"))
            .agg(count(lit(1)).as("n_listens")))
          val wcap = org.apache.spark.sql.expressions.Window
            .partitionBy($"user_id").orderBy($"n_listens".desc, $"artist_id")
          val ua = stage("cap")(uaCounts.withColumn("r", row_number().over(wcap))
            .filter($"r" <= 200).select($"user_id", $"artist_id"))
          val a = ua.select($"user_id", $"artist_id".as("a"))
          val b = ua.select($"user_id", $"artist_id".as("b"))
          val co = stage("pairs")(a.join(b, Seq("user_id")).filter($"a" < $"b")
            .groupBy($"a", $"b").agg(count(lit(1)).as("co_users"))
            .filter($"co_users" >= 5))
          co.count()
        }
      case "unpivot" =>
        (1 to 2).foreach { rep =>
          System.err.println(s"--- rep $rep")
          val wide = stage("monthlyAgg")(graft.mart.MartQueries.monthlyAgg(spark, sfDir))
          val metricCols = Seq("hours_listened", "total_streams_sessions",
            "nonskip_sessions", "total_estimated_streams", "distinct_tracks",
            "distinct_artists")
          val w2 = wide.select($"year" +: $"month_num" +:
            metricCols.map(c => col(c).cast("double").as(c)): _*)
          stage("melt")(w2.unpivot(Array($"year", $"month_num"),
            metricCols.map(col).toArray, "metric", "value")
            .orderBy($"year".desc, $"month_num".desc, $"metric"))
        }
      case "simhash" =>
        // attribute dedup_simhash_keeper's scale trend: rep collapse vs
        // chunk-blocked hamming join vs CC over verified edges (the
        // chunk unroll mirrors ScaleDedup.chunkStructs)
        val docs = graft.Tables.documents(spark, sfDir)
        val withFp = stage("fingerprints")(docs.select($"doc_id",
          graft.ops.ScaleDedup.simhashFp(split(lower(trim($"text")), " +")).as("fp")))
        val reps = stage("reps")(withFp.groupBy($"fp").agg(min($"doc_id").as("rep")))
        val chunks = array((0 until 8).map { k =>
          struct(lit(k).as("chunk_idx"),
            shiftrightunsigned($"fp", k * 8).bitwiseAND(lit(255L)).as("chunk_val"))
        }: _*)
        val exploded = reps.select($"rep", $"fp",
          posexplode(chunks).as(Seq("pos", "c")))
          .select($"rep", $"fp", $"c.chunk_idx", $"c.chunk_val")
        val l = exploded.select($"chunk_idx", $"chunk_val", $"rep".as("a"), $"fp".as("fp_a"))
        val r = exploded.select($"chunk_idx", $"chunk_val", $"rep".as("b"), $"fp".as("fp_b"))
        val edges = stage("hamming join")(l.join(r, Seq("chunk_idx", "chunk_val"))
          .filter($"a" < $"b")
          .filter(bit_count($"fp_a".bitwiseXOR($"fp_b")) <= 7)
          .dropDuplicates("a", "b")
          .select($"a", $"b"))
        stage("cc")(graft.ops.ScaleDedup.ccKeepersEdges(edges))
      case "graph" =>
        // attribute ann_topk_graph's scale trend: IVF kNN edge build vs
        // the beam rounds (inline replica of KnnGraph.beamSearch with a
        // stage() barrier per round)
        import graft.functions.PartialTopK.partial_topk
        import graft.functions.LongVectorDot.vector_dot
        val q = stage("quantized")(graft.ops.VectorAgg.quantized(spark, sfDir))
        val directed = stage("ivfEdges")(
          graft.ops.KnnGraph.ivfEdgesOf(spark, sfDir, q)
            .select($"vec_id".as("src"), $"neighbor_id".as("dst")))
        val adj = stage("undirected")(
          directed.union(directed.select($"dst".as("src"), $"src".as("dst"))).distinct())
        val corpusVec = q.select($"vec_id".as("node"), $"v".as("nv"))
        val queries = q.filter($"vec_id" % 10 === 0)
          .select($"vec_id".as("query_id"), $"v".as("qv"))
        val cells = graft.ops.VectorAgg.kmeansCells(spark, sfDir, k = 16, iters = 2)
        val seeds = stage("seeds")(graft.ops.VectorAgg.withCellRank(q, cells)
          .select($"vec_id", element_at($"cellRank", 1).getField("cell").as("cell"))
          .groupBy($"cell").agg(min($"vec_id").as("node"))
          .select($"node"))
        def topB(scored: DataFrame, bw: Int): DataFrame =
          scored.groupBy($"query_id")
            .agg(partial_topk(
              struct((-$"dot").as("neg_dot"), $"node".as("node"), $"dot".as("dot")), bw).as("topk"),
              first($"qv").as("qv"))
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
        var beam = stage("round0")(topB(score(init), 8))
        for (i <- 1 to 3) {
          val hop = stage(s"r$i hop")(
            beam.select($"query_id", $"qv", $"node")
              .join(adj, col("node") === col("src"))
              .select($"query_id", $"qv", $"dst".as("node"))
              .dropDuplicates("query_id", "node"))
          val scored = stage(s"r$i score")(score(hop))
          val expanded = stage(s"r$i dedup")(
            beam.select($"query_id", $"qv", $"node", $"dot")
              .unionByName(scored)
              .dropDuplicates("query_id", "node"))
          beam = stage(s"round$i")(topB(expanded, 8))
        }
      case other => System.err.println(s"unknown profile: $other")
    }
    spark.stop()
  }
}
