package graft

import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Streaming Markov fold: batch-boundary transitions are counted exactly
  * once (the carried per-user last event), parity with the batch matrix,
  * the state guard paths, bucket isolation of the per-user table, and
  * crash recovery between the users write-ahead and the counts commit.
  */
class MarkovStreamSpec extends SparkSuite {

  test("streamed over 3 ordered batches == batch transition matrix (boundary pairs included)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_markov").toString
    val ev = Tables.events(spark, sf)
    val maxId = ev.agg(max($"event_id")).head().getLong(0)
    val cuts = Seq(maxId / 3, 2 * maxId / 3, maxId)
    cuts.zip(-1L +: cuts.dropRight(1)).zipWithIndex.foreach { case ((hi, lo), i) =>
      streaming.MarkovStream.markovFold(
        ev.filter($"event_id" > lo && $"event_id" <= hi), dir, i.toLong)
    }
    val streamed = streaming.MarkovStream.serveTransitions(spark, dir)
      .collect().map(_.toSeq).toSeq
    val batch = core.EngagementQueries.eventsMarkovTransitions(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(streamed == batch, "streamed fold diverges from the batch matrix")
    assert(batch.nonEmpty)
    // the boundary pairs are real: per-batch windows alone undercount —
    // every user active in 2+ batches contributes at least one
    val perBatchOnly = cuts.zip(-1L +: cuts.dropRight(1)).map { case (hi, lo) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"user_id").orderBy($"ts", $"event_id")
      ev.filter($"event_id" > lo && $"event_id" <= hi)
        .withColumn("nt", lead($"event_type", 1).over(w))
        .filter($"nt".isNotNull).count()
    }.sum
    val total = batch.map(_(2).asInstanceOf[Long]).sum
    assert(total > perBatchOnly, "fixture has no cross-boundary transitions")
    // the committed state carries ONLY the ≤ types² transition counts —
    // per-user rows live in the bucketed users/ table, never the
    // driver-merged state (the round-10 scale contract)
    val st = streaming.StateFold.readState(spark, dir).get
    assert(st.columns.toSeq == Seq("prev_type", "next_type", "n_transitions"))
    val nTypes = ev.select($"event_type").distinct().count()
    assert(st.count() <= nTypes * nTypes)
  }

  test("retry no-ops; an older batch id fails loudly") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_markov_retry").toString
    val ev = Tables.events(spark, sf)
    val maxId = ev.agg(max($"event_id")).head().getLong(0)
    val b0 = ev.filter($"event_id" * 2 <= maxId)
    val b1 = ev.filter($"event_id" * 2 > maxId)
    streaming.MarkovStream.markovFold(b0, dir, 0L)
    streaming.MarkovStream.markovFold(b1, dir, 1L)
    def snap() = (
      streaming.StateFold.readState(spark, dir).get.collect().map(_.toSeq).toSet,
      spark.read.parquet(s"$dir/users").collect().map(_.toSeq).toSet)
    val state = snap()
    streaming.MarkovStream.markovFold(b1, dir, 1L)
    assert(snap() == state, "retry mutated the folded state")
    val e = intercept[IllegalStateException] {
      streaming.MarkovStream.markovFold(b0, dir, 0L)
    }
    assert(e.getMessage.contains("clear the state path"))
  }

  test("a batch rewrites only its affected user buckets (cold buckets byte-stable)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_markov_buckets").toString
    val ev = Tables.events(spark, sf)
    val maxId = ev.agg(max($"event_id")).head().getLong(0)
    streaming.MarkovStream.markovFold(ev.filter($"event_id" * 2 <= maxId), dir, 0L)
    // batch 1: a single user → exactly one affected bucket
    val u = ev.filter($"event_id" * 2 > maxId)
      .select($"user_id").head().getLong(0)
    val b1 = ev.filter($"event_id" * 2 > maxId && $"user_id" === u)
    def bucketFiles(): Map[String, Map[String, Long]] = {
      val root = new java.io.File(s"$dir/users")
      root.listFiles().filter(f => f.isDirectory && f.getName.startsWith("_bucket="))
        .map(d => d.getName -> d.listFiles().filter(_.getName.endsWith(".parquet"))
          .map(f => f.getName -> f.lastModified()).toMap).toMap
    }
    val before = bucketFiles()
    assert(before.size > 1, "fixture must populate several buckets")
    streaming.MarkovStream.markovFold(b1, dir, 1L)
    val after = bucketFiles()
    val hot = s"_bucket=${spark.range(1)
      .select(pmod(xxhash64(lit(u.toString)),
        lit(streaming.MarkovStream.userBuckets.toLong)))
      .head().getLong(0)}"
    assert(after.keySet.contains(hot))
    (before.keySet - hot).foreach { b =>
      assert(after(b) == before(b), s"cold bucket $b was rewritten")
    }
  }

  test("crash between the users write-ahead and the counts commit recovers exactly-once") {
    import spark.implicits._
    val clean = Files.createTempDirectory("graft_markov_clean").toString
    val crashed = Files.createTempDirectory("graft_markov_crash").toString
    val ev = Tables.events(spark, sf)
    val maxId = ev.agg(max($"event_id")).head().getLong(0)
    val b0 = ev.filter($"event_id" * 2 <= maxId)
    val b1 = ev.filter($"event_id" * 2 > maxId)
    Seq(clean, crashed).foreach { d =>
      streaming.MarkovStream.markovFold(b0, d, 0L)
    }
    streaming.MarkovStream.markovFold(b1, clean, 1L)
    // simulate the crash window in `crashed`: users/ stamped with batch
    // 1 but the v1 counts commit never landed (and v0 not yet pruned —
    // pruning follows the commit). Reproduce by snapshotting v0, running
    // the full fold, then deleting v1 and restoring v0.
    def rm(x: java.io.File): Unit = {
      if (x.isDirectory) x.listFiles().foreach(rm)
      x.delete(); ()
    }
    def cp(src: java.nio.file.Path, dst: java.nio.file.Path): Unit = {
      java.nio.file.Files.walk(src).forEach { p =>
        val t = dst.resolve(src.relativize(p))
        if (java.nio.file.Files.isDirectory(p)) java.nio.file.Files.createDirectories(t)
        else java.nio.file.Files.copy(p, t)
        ()
      }
    }
    val v0snap = Files.createTempDirectory("graft_markov_v0snap")
    cp(java.nio.file.Paths.get(s"$crashed/v0"), v0snap)
    streaming.MarkovStream.markovFold(b1, crashed, 1L)
    rm(new java.io.File(s"$crashed/v1"))
    cp(v0snap, java.nio.file.Paths.get(s"$crashed/v0"))
    // the checkpoint redelivers batch 1 into the half-applied state
    streaming.MarkovStream.markovFold(b1, crashed, 1L)
    val got = streaming.MarkovStream.serveTransitions(spark, crashed)
      .collect().map(_.toSeq).toSeq
    val want = streaming.MarkovStream.serveTransitions(spark, clean)
      .collect().map(_.toSeq).toSeq
    assert(got == want,
      "re-folding after a users-ahead crash must not double-count boundary transitions")
  }
}
