package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Churn prediction over the event stream — the retention-ML readout on
  * the behavioral axis (the reference dashboard reports what users did;
  * this predicts who is about to stop): logistic regression trained by
  * the SAME full-batch Newton machinery as the text-quality model
  * ([[QualityTrain.train]] — gradient + Hessian in ONE partial aggregate
  * per epoch, a 22-double driver pull, quadratic convergence), applied
  * to user-level RFM-T features.
  *
  * Leakage discipline: the label window is the corpus's final days
  * ([[windowFor]]); every feature is computed from events STRICTLY
  * BEFORE that window's start, so nothing the model sees overlaps what
  * it predicts — the temporal-split contract a production churn model
  * ships with. The label is engagement DECLINE, not absolute silence:
  * churned = the user's post-cutoff events/day fell below HALF their
  * pre-cutoff rate (on a continuously-active synthetic population,
  * absolute silence is vacuous at every SF; rate decline is the signal
  * a retention campaign actually triggers on, and it splits on natural
  * activity variation). Users with no pre-window activity are excluded
  * (cold-start: nothing to featurize); the spec pins that both labels
  * are populated and that no feature reads a post-cutoff event.
  *
  * Features (5-dim like the quality model, so the Newton core is reused
  * verbatim): intercept, recency (days from last pre-window event to the
  * cutoff, /60 capped at 1), frequency (events/day of tenure, capped),
  * monetary (mean event value /100), tenure (active span /365 capped).
  *
  * Scale shape: ONE per-user aggregate over the pre-window scan builds
  * the feature frame (map-side combine); each Newton epoch is one
  * partial aggregate over it; scoring is a stateless map pass with the
  * weights as plan literals. Rows-only (sigmoid/log are
  * transcendental); ChurnSpec pins loss descent, teacher-vs-baseline
  * lift, and the leakage split itself.
  */
object ChurnTrain {

  /** Label-window cap: 30 days, shrunk to a quarter of the corpus span
    * when the corpus itself is shorter (a 30-day window over a 28-day
    * corpus would swallow every event and leave nothing to featurize —
    * the adaptive rule keeps the temporal split meaningful at every SF).
    */
  val labelWindowSec: Long = 30L * 86400L

  private[graft] def windowFor(spanSec: Long): Long =
    math.min(labelWindowSec, spanSec / 4)

  /** (user_id, x[5], y) — features strictly pre-cutoff, label from the
    * final window. Cutoff rides the plan as a broadcast scalar (the
    * delta_load watermark device).
    */
  private[graft] def featurizedUsers(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select($"user_id", unix_timestamp($"ts").as("ts_sec"),
        $"value".cast("decimal(10,2)").cast("double").as("v"))
    val mx = ev.agg(max($"ts_sec").as("max_ts"), min($"ts_sec").as("min_ts"))
    val tagged = ev.crossJoin(broadcast(mx))
      .withColumn("cutoff", $"max_ts" -
        least(lit(labelWindowSec), expr("(max_ts - min_ts) div 4")))
    val perUser = tagged.groupBy($"user_id").agg(
      max(when($"ts_sec" <= $"cutoff", $"ts_sec")).as("last_pre"),
      min(when($"ts_sec" <= $"cutoff", $"ts_sec")).as("first_pre"),
      sum(when($"ts_sec" <= $"cutoff", 1L).otherwise(0L)).as("n_pre"),
      sum(when($"ts_sec" <= $"cutoff", $"v").otherwise(0.0)).as("sum_v_pre"),
      sum(when($"ts_sec" > $"cutoff", 1L).otherwise(0L)).as("n_post"),
      first($"cutoff").as("cutoff"),
      first($"max_ts").as("max_ts"))
    perUser.filter($"n_pre" > 0)
      .withColumn("recency_d", ($"cutoff" - $"last_pre").cast("double") / 86400.0)
      .withColumn("tenure_d",
        greatest(($"last_pre" - $"first_pre").cast("double") / 86400.0, lit(1.0)))
      .withColumn("window_d", ($"max_ts" - $"cutoff").cast("double") / 86400.0)
      .withColumn("pre_rate", $"n_pre".cast("double") / $"tenure_d")
      .withColumn("post_rate", $"n_post".cast("double") / $"window_d")
      .select(
        $"user_id",
        array(
          lit(1.0),
          least($"recency_d" / 60.0, lit(1.0)),
          least($"pre_rate" / 10.0, lit(1.0)),
          ($"sum_v_pre" / $"n_pre".cast("double")) / 100.0,
          least($"tenure_d" / 365.0, lit(1.0))).as("x"),
        when($"post_rate" < $"pre_rate" * 0.5, 1.0).otherwise(0.0).as("y"))
  }

  // fused dot product (see QualityTrain.marginCol for the why — the
  // element_at fold trips Spark's codegen splitter at predicate depth)
  private def marginCol(w: Array[Double]): Column =
    graft.functions.DoubleDotLiteral.dot_lit(col("x"), w.toSeq)

  private val modelCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), Array[Double]]

  private[graft] def trainedWeights(spark: SparkSession, dir: String): Array[Double] =
    modelCache.synchronized {
      modelCache.getOrElseUpdate((spark, dir),
        QualityTrain.train(featurizedUsers(spark, dir), QualityTrain.defaultIters)._1)
    }

  /** §2 `churn_train_lr`: the training trajectory (per-epoch loss and
    * label agreement) plus the final weights as scalar columns — the
    * quality_train_lr output contract on the behavioral axis.
    */
  def churnTrainLr(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (w, traj) = QualityTrain.train(
      featurizedUsers(spark, dir), QualityTrain.defaultIters)
    modelCache.synchronized { modelCache.put((spark, dir), w) }
    val base = traj.toDF("iter", "loss", "label_agreement")
    w.indices.foldLeft(base)((df, j) => df.withColumn(s"w$j", lit(w(j))))
      .orderBy($"iter")
  }

  /** §2 `churn_score_lr`: per-user churn probability under the trained
    * model — a stateless map pass, weights as plan literals; the serving
    * shape a retention campaign reads.
    */
  def churnScoreLr(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = trainedWeights(spark, dir)
    featurizedUsers(spark, dir)
      .withColumn("prob_churn", lit(1.0) / (lit(1.0) + exp(-marginCol(w))))
      .select($"user_id", $"prob_churn",
        when($"prob_churn" >= 0.5, "at_risk").otherwise("retained").as("predicted"),
        when(($"prob_churn" >= 0.5) === ($"y" === 1.0), 1L).otherwise(0L).as("agrees_label"))
      .orderBy($"user_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "churn_train_lr" -> (churnTrainLr _),
    "churn_score_lr" -> (churnScoreLr _)
  )

  val oracleSql: Map[String, String] = Map.empty
}
