package graft

import org.apache.spark.sql.functions._

/** ALS factorization: the alternating ridge solves must descend the
  * regularized objective monotonically, the whole pipeline is
  * deterministic (no RNG anywhere), and the serve tail honors the
  * novelty contract.
  */
class AlsSpec extends SparkSuite {

  test("objective descends monotonically over alternating solves") {
    val ratings = ops.Als.ratingsOf(spark, sf).localCheckpoint()
    val objs = (1 to 3).map { iters =>
      val (u, v) = ops.Als.train(ratings, iters)
      ops.Als.objective(ratings, u, v)
    }
    assert(objs.zip(objs.tail).forall { case (a, b) => b <= a + 1e-9 },
      s"ALS objective must not increase across iterations: $objs")
    assert(objs.head.isFinite && objs.last > 0.0)
    // the model must actually have learned something: one full
    // alternation already fits far better than the magnitude of the
    // raw ratings mass (a degenerate all-zero factor model scores
    // J0 = sum r^2)
    import spark.implicits._
    val j0 = ratings.select(($"r" * $"r").as("r2")).agg(sum($"r2")).head().getDouble(0)
    assert(objs.head < j0, s"one ALS sweep must beat the zero model: ${objs.head} !< $j0")
  }

  test("deterministic: two trainings produce identical factors") {
    val ratings = ops.Als.ratingsOf(spark, sf).localCheckpoint()
    def snap() = {
      val (u, v) = ops.Als.train(ratings, 2)
      (u.collect().map(_.toSeq).toSet, v.collect().map(_.toSeq).toSet)
    }
    assert(snap() == snap(), "ALS must be bit-deterministic (no RNG)")
  }

  test("serve tail: dense ranks, novelty, bounded cohort") {
    import spark.implicits._
    val rows = ops.Als.recAlsTopn(spark, sf).collect()
    assert(rows.nonEmpty)
    val byUser = rows.groupBy(_.getAs[Long]("user_id"))
    byUser.foreach { case (u, rs) =>
      assert(rs.map(_.getAs[Int]("rank")).sorted.toSeq == (1 to rs.length),
        s"user $u ranks must be dense 1..k")
      assert(u % 100 == 0, "only the evaluation cohort is served")
    }
    // novelty: no recommended item is in the user's listen history
    val listened = ops.Recommend.listenCounts(spark, sf)
      .select($"user_id", $"item_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    rows.foreach { r =>
      assert(!listened((r.getAs[Long]("user_id"), r.getAs[Long]("rec_item_id"))),
        "recommended an already-listened item")
    }
    // scores ordered within user
    byUser.foreach { case (_, rs) =>
      val scores = rs.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("score"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
  }

  test("persisted factors serve row-identically to the trained entry") {
    val trained = ops.Als.recAlsTopn(spark, sf).collect().map(_.toSeq).toSeq
    val served = ops.Als.recAlsTopnPersisted(spark, sf).collect().map(_.toSeq).toSeq
    assert(served == trained, "factor-table round-trip changed the recommendations")
  }

  test("persisted serve plan reads only the index, never the fact tables") {
    // the CfIndexSpec discipline: the persisted entry's whole claim is a
    // fact-free serve path — novelty comes from the listened/ ledger
    val df = ops.Als.recAlsTopnPersisted(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("lineitem") && !plan.contains("orders"),
      "persisted ALS serve must not scan fact tables")
    assert(plan.contains("graft_als_index"),
      "persisted ALS serve must scan the saved index")
  }

  test("training half-solve: factor table shuffle-joins into the pinned corpus layout") {
    import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
    import org.apache.spark.sql.execution.joins.ShuffledHashJoinExec
    import org.apache.spark.sql.catalyst.optimizer.BuildRight
    // the r11 weak mark: broadcast(given) shipped the (unbounded at 100×)
    // USER factor table from the driver every item half-solve. The fixed
    // plan must (a) never put a factor table through a BroadcastExchange,
    // (b) hash-join with the corpus side STREAMED off its pinned
    // (localCheckpoint-preserved) partitioning — no exchange beneath it.
    val ratings = ops.Als.ratingsOf(spark, sf)
    val byItem = ops.Als.pinByKey(ratings, "item_id", ratings.count())
    val items = ops.Als.initItems(byItem).localCheckpoint()
    val solved = ops.Als.halfSolve(byItem, items, "item_id", "user_id")
    solved.collect() // finalize AQE
    val nodes = tools.PlanWalk.flatten(solved.queryExecution.executedPlan)
    val factorBroadcasts = nodes.collect {
      case b: BroadcastExchangeExec
        if b.output.exists(a => a.name == "g1" || a.name == "g2") => b
    }
    assert(factorBroadcasts.isEmpty,
      factorBroadcasts.map(_.treeString).mkString("\n---\n"))
    val joins = nodes.collect { case j: ShuffledHashJoinExec => j }
    assert(joins.nonEmpty, solved.queryExecution.executedPlan.toString)
    joins.foreach { j =>
      val streamed = if (j.buildSide == BuildRight) j.left else j.right
      assert(!tools.PlanWalk.flatten(streamed)
        .exists(_.isInstanceOf[ShuffleExchangeExec]),
        s"corpus side re-shuffled:\n${streamed.treeString}")
    }
    // the rank-d twin inherits the same layout discipline — assert it
    // directly (array factor column "g" instead of g1/g2)
    val itemsD = ops.Als.initItemsD(byItem, 4).localCheckpoint()
    val solvedD = ops.Als.halfSolveD(byItem, itemsD, "item_id", "user_id", 4)
    solvedD.collect()
    val nodesD = tools.PlanWalk.flatten(solvedD.queryExecution.executedPlan)
    assert(nodesD.collect {
      case b: BroadcastExchangeExec if b.output.exists(_.name == "g") => b
    }.isEmpty, "rank-d half-solve broadcast the factor table")
    val joinsD = nodesD.collect { case j: ShuffledHashJoinExec => j }
    assert(joinsD.nonEmpty, solvedD.queryExecution.executedPlan.toString)
    joinsD.foreach { j =>
      val streamed = if (j.buildSide == BuildRight) j.left else j.right
      assert(!tools.PlanWalk.flatten(streamed)
        .exists(_.isInstanceOf[ShuffleExchangeExec]),
        s"rank-d corpus side re-shuffled:\n${streamed.treeString}")
    }
  }

  test("rank-4 array-column training: objective descends and beats the zero model") {
    val ratings = ops.Als.ratingsOf(spark, sf).localCheckpoint()
    val objs = (1 to 3).map { iters =>
      val (u, v) = ops.Als.trainD(ratings, d = 4, iters)
      ops.Als.objectiveD(ratings, u, v)
    }
    assert(objs.zip(objs.tail).forall { case (a, b) => b <= a + 1e-9 },
      s"rank-4 ALS objective must not increase across iterations: $objs")
    assert(objs.head.isFinite && objs.last > 0.0)
    import spark.implicits._
    val j0 = ratings.select(($"r" * $"r").as("r2")).agg(sum($"r2")).head().getDouble(0)
    assert(objs.head < j0, s"one rank-4 sweep must beat the zero model: ${objs.head} !< $j0")
  }

  test("rank-4 entry honors the serve contract: dense ranks, cohort, novelty") {
    import spark.implicits._
    val rows = ops.Als.recAlsTopnD4(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (u, rs) =>
      assert(u % 100 == 0, "only the evaluation cohort is served")
      assert(rs.map(_.getAs[Int]("rank")).sorted.toSeq == (1 to rs.length))
      val scores = rs.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("score"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
    val listened = ops.Recommend.listenCounts(spark, sf)
      .select($"user_id", $"item_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    rows.foreach { r =>
      assert(!listened((r.getAs[Long]("user_id"), r.getAs[Long]("rec_item_id"))),
        "rank-4 model recommended an already-listened item")
    }
  }

  test("rank-4 training is bit-deterministic") {
    val ratings = ops.Als.ratingsOf(spark, sf).localCheckpoint()
    def snap() = {
      val (u, v) = ops.Als.trainD(ratings, d = 4, iters = 2)
      (u.collect().map(_.toSeq).toSet, v.collect().map(_.toSeq).toSet)
    }
    assert(snap() == snap(), "rank-4 ALS must be bit-deterministic (no RNG)")
  }

  test("fold-in with cold-catalog users never shrinks the listened ledger") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // the review-caught wipe: a user whose items are ALL absent from the
    // frozen item table produces no solved factor row, so their bucket is
    // not in the factor rewrite's affected set — admitting their pairs to
    // the listened rewrite would dynamic-overwrite that bucket with only
    // the new pairs, deleting every other resident's history
    val dir = java.nio.file.Files.createTempDirectory("graft_als_cold").toString
    ops.Als.saveAlsIndex(spark, sf, dir)
    val usersBefore = spark.read.parquet(s"$dir/users").count()
    val listenedBefore = spark.read.parquet(s"$dir/listened").count()
    val knownItem = ops.Als.ratingsOf(spark, sf)
      .select($"item_id").distinct().limit(1).collect().head.getLong(0)
    val batch = Seq(
      (888801L, knownItem, 1.0),    // solvable: known item
      (888802L, 99999999L, 1.0),    // cold: item absent from the catalog
      (888802L, 99999998L, 1.0)
    ).toDF("user_id", "item_id", "r")
    ops.Als.foldUsersIntoAlsIndex(spark, dir, batch)
    val users = spark.read.parquet(s"$dir/users")
    val listened = spark.read.parquet(s"$dir/listened")
    assert(users.count() == usersBefore + 1, "only the solvable user gains factors")
    assert(users.filter($"user_id" === 888802L).isEmpty)
    assert(listened.count() == listenedBefore + 1,
      "listened ledger must grow by exactly the solved user's pair — never shrink")
    assert(listened.filter($"user_id" === 888802L).isEmpty,
      "an unsolvable user must not enter the serving ledger")
    assert(listened.filter($"user_id" === 888801L).count() == 1)
  }

  test("fold-in onboards a new user idempotently; delete removes; re-delete no-ops") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_als_idx").toString
    ops.Als.saveAlsIndex(spark, sf, dir)
    val before = spark.read.parquet(s"$dir/users").count()
    val someItems = ops.Als.ratingsOf(spark, sf)
      .select($"item_id").distinct().limit(3)
      .collect().map(_.getLong(0))
    val newUser = 999999L
    val newRatings = someItems.map(i => (newUser, i, 2.0)).toSeq
      .toDF("user_id", "item_id", "r")
    ops.Als.foldUsersIntoAlsIndex(spark, dir, newRatings)
    val after = spark.read.parquet(s"$dir/users")
    assert(after.count() == before + 1, "fold-in must add exactly the new user")
    val row1 = after.filter($"user_id" === newUser).collect().map(_.toSeq).toSeq
    assert(row1.nonEmpty, "new user's factors missing")
    // idempotent: re-folding the same ratings replaces, not duplicates,
    // and re-solves to identical factors (integer-grid accumulation)
    ops.Als.foldUsersIntoAlsIndex(spark, dir, newRatings)
    val again = spark.read.parquet(s"$dir/users")
    assert(again.count() == before + 1)
    assert(again.filter($"user_id" === newUser).collect().map(_.toSeq).toSeq == row1)
    // the item table is untouched by user lifecycle operations
    ops.Als.deleteUsersFromAlsIndex(spark, dir, Seq(newUser))
    val gone = spark.read.parquet(s"$dir/users")
    assert(gone.count() == before)
    assert(gone.filter($"user_id" === newUser).isEmpty)
    // idempotent re-delete: nothing rewritten
    def mtimes() = {
      def walk(f: java.io.File): Seq[(String, Long)] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
        else Seq(f.getPath -> f.lastModified())
      walk(new java.io.File(s"$dir/users")).toMap
    }
    val stable = mtimes()
    ops.Als.deleteUsersFromAlsIndex(spark, dir, Seq(newUser))
    assert(mtimes() == stable, "re-delete rewrote the user factor table")
  }
}
