package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Distributed training of the model-based quality screen — the stage that
  * turns [[LlmQueries.qualityClassifier]]'s fixed rule into a LEARNED
  * probabilistic model (the FineWeb recipe: label a corpus slice with a
  * teacher, fit a cheap linear classifier, run it corpus-wide). Reference
  * analogy: the reference pipeline has no trainer — this is engine surface
  * the 100 TB curation story needs (reference scripts/transform_scripts/
  * transformer.py:1 stops at rule-based cleaning).
  *
  * Model: logistic regression over 5 bounded per-doc features (bias,
  * distinct-word rate, stopword rate, repetition rate, capped length),
  * trained by full-batch gradient descent against the rule classifier's
  * own hq/lq decision as teacher labels.
  *
  * Trained by full-batch Newton (IRLS), the right distributed shape for a
  * tiny model over a huge corpus: one iteration is ONE map-side partial
  * aggregate producing the d gradient sums, the d(d+1)/2 Hessian sums, and
  * the loss/accuracy diagnostics — d = 5, so 22 doubles per pass, no
  * shuffle of data rows, ever; the weight vector enters each pass as plan
  * literals and the driver holds only the d-vector plus a 5×5 solve (the
  * same bounded model pull as the k-means Lloyd loop,
  * [[VectorAgg.kmeansCells]]). Newton's quadratic convergence is what
  * makes this a 100 TB design: ~8 corpus scans to optimality where plain
  * gradient descent needs hundreds (measured here: GD at η = 0.8 was at
  * 0.77 teacher agreement after 25 passes; Newton is ≥ 0.95 by pass 8).
  * A ridge λ keeps the Hessian invertible when the classes separate.
  * `samplePermille` additionally trains on a deterministic xxhash64 slice
  * of documents (classifier quality needs ~10⁶ docs, not 10¹¹ — FineWeb
  * trains on ~500k); inference stays corpus-wide and map-side.
  */
object QualityTrain {

  val dim = 5
  val ridge = 1e-3
  val defaultIters = 8

  /** The feature row shared by training and inference: bounded, derived
    * from the same split-once word array as the rule classifier, plus the
    * teacher label y (1.0 = the rule says hq).
    */
  private[graft] def featurized(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    val scored = LlmQueries.qualityClassifierOn(docs)
    val nw = greatest($"n_words", lit(1L)).cast("double")
    scored.select(
      $"doc_id",
      array(
        lit(1.0),
        $"n_distinct" / nw,
        $"n_stopwords" / nw,
        ($"n_words" - $"n_distinct") / nw,
        least($"n_words", lit(200L)).cast("double") / 200.0).as("x"),
      when($"label" === "hq", 1.0).otherwise(0.0).as("y"))
  }

  /** margin = w·x with w as plan literals (d is tiny and fixed) — the
    * fused [[graft.functions.DoubleDotLiteral]] expression, NOT a
    * per-term element_at fold: the fold's generated Java grows linearly
    * in d and at predicate depth trips Spark's method splitter into
    * emitting an uncompilable class that silently falls back to the
    * interpreter (caught under codegen.factoryMode=CODEGEN_ONLY,
    * spec-pinned in QualityTrainSpec).
    */
  private def marginCol(w: Array[Double]): Column =
    graft.functions.DoubleDotLiteral.dot_lit(col("x"), w.toSeq)

  /** One Newton epoch: gradient (d), Hessian upper triangle (d(d+1)/2),
    * mean loss, accuracy — ONE partial aggregate; the only driver traffic
    * is this 22-value row.
    */
  private def epoch(feats: DataFrame, w: Array[Double]): (Array[Double], Array[Array[Double]], Double, Double) = {
    val p = lit(1.0) / (lit(1.0) + exp(-marginCol(w)))
    def x(j: Int) = element_at(col("x"), j + 1)
    val hPairs = for (i <- 0 until dim; j <- i until dim) yield (i, j)
    val aggs =
      (0 until dim).map(j => avg((p - col("y")) * x(j)).as(s"g$j")) ++
      hPairs.map { case (i, j) => avg(p * (lit(1.0) - p) * x(i) * x(j)).as(s"h${i}_$j") } ++ Seq(
        // clamped log keeps the loss finite if a margin saturates
        avg(-col("y") * log(greatest(p, lit(1e-15)))
          - (lit(1.0) - col("y")) * log(greatest(lit(1.0) - p, lit(1e-15)))).as("loss"),
        avg(when((p >= 0.5) === (col("y") === 1.0), 1.0).otherwise(0.0)).as("acc"))
    val r = feats.agg(aggs.head, aggs.tail: _*).head()
    val g = Array.tabulate(dim)(j => r.getDouble(j))
    val h = Array.fill(dim, dim)(0.0)
    hPairs.zipWithIndex.foreach { case ((i, j), k) =>
      val v = r.getDouble(dim + k); h(i)(j) = v; h(j)(i) = v
    }
    (g, h, r.getDouble(dim + hPairs.length), r.getDouble(dim + hPairs.length + 1))
  }

  /** Solve (A + λI)·x = b by Gaussian elimination with partial pivoting —
    * d = 5, a driver-side no-op next to any corpus pass.
    */
  private def solveRidge(a: Array[Array[Double]], b: Array[Double]): Array[Double] = {
    val n = b.length
    val m = Array.tabulate(n, n)((i, j) => a(i)(j) + (if (i == j) ridge else 0.0))
    val x = b.clone()
    for (c <- 0 until n) {
      val piv = (c until n).maxBy(r => math.abs(m(r)(c)))
      val (tr, tx) = (m(piv), x(piv)); m(piv) = m(c); m(c) = tr; x(piv) = x(c); x(c) = tx
      for (r <- c + 1 until n) {
        val f = m(r)(c) / m(c)(c)
        for (k <- c until n) m(r)(k) -= f * m(c)(k)
        x(r) -= f * x(c)
      }
    }
    for (c <- n - 1 to 0 by -1) {
      x(c) = (x(c) - (c + 1 until n).map(k => m(c)(k) * x(k)).sum) / m(c)(c)
    }
    x
  }

  /** Full training run; returns the per-iteration trajectory and the final
    * weights. Deterministic given the corpus (float-sum jitter across
    * partitionings is below every spec threshold).
    */
  private[graft] def train(feats: DataFrame, iters: Int): (Array[Double], Seq[(Int, Double, Double)]) = {
    val f = feats.localCheckpoint() // featurize once, not once per epoch
    var w = Array.fill(dim)(0.0)
    val traj = (1 to iters).map { i =>
      val (g, h, loss, acc) = epoch(f, w)
      val step = solveRidge(h, g)
      w = w.zip(step).map { case (wi, si) => wi - si }
      (i, loss, acc)
    }
    (w, traj)
  }

  /** Session-lifetime model cache, keyed like the persisted indexes: train
    * once per (session, dir, iters), serve every later call.
    */
  private val modelCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String, Int), Array[Double]]

  private[graft] def trainedWeights(spark: SparkSession, dir: String,
      iters: Int = defaultIters, samplePermille: Int = 1000): Array[Double] =
    modelCache.synchronized {
      modelCache.getOrElseUpdate((spark, dir, iters), {
        val docs = Tables.documents(spark, dir)
        val slice =
          if (samplePermille >= 1000) docs
          else docs.filter(pmod(xxhash64(col("doc_id")), lit(1000)) < samplePermille)
        train(featurized(slice), iters)._1
      })
    }

  /** §2 entry `quality_train_lr`: the training trajectory — one row per
    * epoch (loss, accuracy-vs-teacher) plus the final weight vector as
    * five SCALAR double columns w0..w4 (the driver's rows-only check
    * pandas-sorts every column, so nested types are banned from entry
    * outputs — see SchemaContractSpec). Rows-only by design
    * (transcendental log/exp scores); QualityTrainSpec pins monotone loss
    * and final teacher agreement.
    */
  def qualityTrainLr(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (w, traj) = train(featurized(Tables.documents(spark, dir)), defaultIters)
    modelCache.synchronized { modelCache.put((spark, dir, defaultIters), w) }
    val base = traj.map { case (i, loss, acc) => (i, loss, acc) }
      .toDF("iter", "loss", "teacher_agreement")
    (0 until dim).foldLeft(base)((df, j) => df.withColumn(s"w$j", lit(w(j))))
      .orderBy($"iter")
  }

  /** The inference core, shared with the streaming screen
    * ([[graft.streaming.CorpusStream.classifyLrStream]]) so batch and
    * streaming decisions can never diverge: a stateless projection —
    * works on any (doc_id, text) frame, batch or streaming.
    */
  private[graft] def scoreLrOn(docs: DataFrame, w: Array[Double]): DataFrame = {
    import docs.sparkSession.implicits._
    featurized(docs)
      .withColumn("prob_hq", lit(1.0) / (lit(1.0) + exp(-marginCol(w))))
      .select($"doc_id", $"prob_hq",
        when($"prob_hq" >= 0.5, "hq").otherwise("lq").as("label"),
        when(($"prob_hq" >= 0.5) === ($"y" === 1.0), 1L).otherwise(0L).as("agrees_teacher"))
  }

  /** §2 entry `quality_classifier_lr`: corpus-wide inference under the
    * trained model — one map-side pass, weights as plan literals, the same
    * serve shape as the fixed-rule classifier. Trains (or cache-hits) per
    * session, mirroring the persisted-index entries' lifecycle.
    */
  def qualityClassifierLr(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    scoreLrOn(Tables.documents(spark, dir), trainedWeights(spark, dir))
      .orderBy($"doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "quality_train_lr"      -> (qualityTrainLr _),
    "quality_classifier_lr" -> (qualityClassifierLr _)
  )

  val oracleSql: Map[String, String] = Map.empty
}
