package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** CDC apply: the streaming merge sink folds batches into the SAME state
  * the one-shot batch apply computes; replays and out-of-order redelivery
  * are no-ops (LSN guard); deletes stay dead behind their tombstones.
  */
class CdcSpec extends SparkSuite {

  private def served(path: String): Set[Seq[Any]] =
    streaming.CdcStream.serveSnapshot(spark, path)
      .select("key", "lsn", "op", "event_type", "value", "ts")
      .collect().map(_.toSeq.toIndexedSeq: Seq[Any]).toSet

  private def oneShot(cdc: DataFrame): Set[Seq[Any]] =
    etl.CdcApply.applyCdc(cdc)
      .select(col("key"), col("last_lsn").as("lsn"), col("last_op").as("op"),
        col("event_type"), col("value"), col("updated_at").as("ts"))
      .collect().map(_.toSeq.toIndexedSeq: Seq[Any]).toSet

  test("streamed over 3 LSN-split batches == batch one-shot apply; replay is a no-op") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_cdc").toString
    val path = s"$dir/wh"
    val cdc = etl.CdcApply.cdcLog(spark, sf).localCheckpoint()
    val maxLsn = cdc.agg(max($"lsn")).head().getLong(0)
    val cuts = Seq(maxLsn / 3, 2 * maxLsn / 3, maxLsn)
    val batches = cuts.zip(-1L +: cuts.dropRight(1)).map { case (hi, lo) =>
      cdc.filter($"lsn" > lo && $"lsn" <= hi).localCheckpoint()
    }
    batches.foreach(b => streaming.CdcStream.cdcMergeBatch(b, path, buckets = 4))
    assert(served(path) == oneShot(cdc), "streamed state == one-shot apply")

    // redeliver the FIRST batch after the later ones: every incoming row
    // loses the LSN race, state is value-identical
    val before = served(path)
    streaming.CdcStream.cdcMergeBatch(batches.head, path, buckets = 4)
    assert(served(path) == before, "old-batch replay must be a no-op")
  }

  test("a deleted key stays dead when its insert batch is redelivered") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_cdc_del").toString
    val path = s"$dir/wh"
    val b1 = Seq((1L, 10L, "I", "view", 1.0), (2L, 20L, "I", "click", 2.0))
      .toDF("lsn", "key", "op", "event_type", "value")
    val b2 = Seq((3L, 10L, "D", "view", 0.0), (4L, 20L, "U", "click", 5.0))
      .toDF("lsn", "key", "op", "event_type", "value")
    streaming.CdcStream.cdcMergeBatch(b1, path, buckets = 2)
    streaming.CdcStream.cdcMergeBatch(b2, path, buckets = 2)
    def keys() = streaming.CdcStream.serveSnapshot(spark, path)
      .select($"key").collect().map(_.getLong(0)).toSet
    assert(keys() == Set(20L), "key 10 deleted, key 20 updated")
    // tombstone holds: replaying the insert batch cannot resurrect key 10
    streaming.CdcStream.cdcMergeBatch(b1, path, buckets = 2)
    assert(keys() == Set(20L), "tombstone must block the resurrected insert")
    val v = streaming.CdcStream.serveSnapshot(spark, path)
      .filter($"key" === 20L).select($"value").head().getDouble(0)
    assert(v == 5.0, "update payload survives the replay")
  }

  test("tombstone vacuum: old markers drop, young markers survive, cold buckets untouched") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_cdc_vac").toString
    val path = s"$dir/wh"
    // key 10: deleted long ago (lsn 3). key 20: deleted recently (lsn 9).
    // key 30: live. keys spread across buckets; bucket of 30 stays cold.
    val ops = Seq(
      (1L, 10L, "I", "view", 1.0), (3L, 10L, "D", "view", 0.0),
      (2L, 20L, "I", "click", 2.0), (9L, 20L, "D", "click", 0.0),
      (5L, 30L, "I", "play", 3.0))
      .toDF("lsn", "key", "op", "event_type", "value")
    streaming.CdcStream.cdcMergeBatch(ops, path, buckets = 8)
    def raw() = spark.read.parquet(path)
      .select($"key", $"lsn", $"op").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(raw() == Set((10L, 3L, "D"), (20L, 9L, "D"), (30L, 5L, "I")))
    val mt = new java.io.File(path).listFiles().filter(_.getName.startsWith("_bucket="))
      .map(d => d.getName -> d.listFiles().map(_.lastModified()).max).toMap

    val rewritten = streaming.CdcStream.vacuumTombstones(spark, path, horizonLsn = 5L)
    assert(raw() == Set((20L, 9L, "D"), (30L, 5L, "I")),
      "only the sub-horizon tombstone may drop")
    // cold buckets (no expirable tombstone) keep their files byte-stable
    val mtAfter = new java.io.File(path).listFiles().filter(_.getName.startsWith("_bucket="))
      .map(d => d.getName -> d.listFiles().map(_.lastModified()).max).toMap
    val touched = rewritten.map(b => s"_bucket=$b").toSet
    mt.foreach { case (b, t) =>
      if (!touched.contains(b)) assert(mtAfter.get(b).contains(t), s"cold bucket $b rewritten")
    }
    // the young tombstone still blocks resurrection
    streaming.CdcStream.cdcMergeBatch(
      Seq((2L, 20L, "I", "click", 2.0)).toDF("lsn", "key", "op", "event_type", "value"),
      path, buckets = 8)
    assert(!streaming.CdcStream.serveSnapshot(spark, path)
      .filter($"key" === 20L).collect().nonEmpty, "young tombstone failed to block")
    // idempotent: nothing left to vacuum at the same horizon
    assert(streaming.CdcStream.vacuumTombstones(spark, path, horizonLsn = 5L).isEmpty)
  }

  test("gate entry: watermark-merge == one-shot apply (the oracle's claim, in-process)") {
    import spark.implicits._
    val merged = etl.CdcApply.etlCdcApply(spark, sf)
      .collect().map(_.toSeq.toIndexedSeq: Seq[Any]).toSet
    val full = etl.CdcApply.applyCdc(etl.CdcApply.cdcLog(spark, sf))
      .collect().map(_.toSeq.toIndexedSeq: Seq[Any]).toSet
    assert(merged == full)
    assert(merged.nonEmpty)
    // deletes are real at this sf: some key's latest op is D
    val latestOps = etl.CdcApply.latestPerKey(etl.CdcApply.cdcLog(spark, sf))
      .select($"last_op").collect().map(_.getString(0)).toSet
    assert(latestOps.contains("D"), "gate corpus must exercise the delete path")
  }
}
