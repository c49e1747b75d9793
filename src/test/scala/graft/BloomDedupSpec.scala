package graft

import org.apache.spark.sql.functions._

/** The persisted-Bloom incremental dedup: losslessness (no false
  * negatives), screen effectiveness, and the map-side probe plan shape.
  */
class BloomDedupSpec extends SparkSuite {

  private def plantedCorpus() = {
    import spark.implicits._
    // corpus = ids ≤ 250; incoming 251..256: two exact dups (up to
    // normalization), one near-dup (NOT exact — must not match), three fresh
    Seq(
      (10L, "spark shuffles the partitions"),
      (20L, "a completely different corpus document"),
      (30L, "Spark Shuffles The Partitions"), // same normalized text as 10
      (251L, "  SPARK SHUFFLES THE PARTITIONS  "), // dup of {10, 30}
      (252L, "A COMPLETELY DIFFERENT CORPUS DOCUMENT"), // dup of 20
      (253L, "spark shuffles the partition"), // near-dup, not exact
      (254L, "entirely novel incoming text"),
      (255L, "another fresh document body"),
      (256L, "")).toDF("doc_id", "text")
  }

  test("bloom screen is lossless: screened output == unscreened twin on planted dups") {
    import spark.implicits._
    val docs = plantedCorpus()
    val corpusFp = docs.filter($"doc_id" <= 250L)
      .select(xxhash64(ops.BloomDedup.canonText($"text")).as("fp"))
    val bf = corpusFp.stat.bloomFilter($"fp", 1000L, 0.01)
    val bos = new java.io.ByteArrayOutputStream(); bf.writeTo(bos)
    val screened = ops.BloomDedup.dedupIncrementalBloomOn(docs, 250L, Some(bos.toByteArray))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val unscreened = ops.BloomDedup.dedupIncrementalBloomOn(docs, 250L, None)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(screened == unscreened)
    // the planted truths: 251 matches {10, 30} keeper 10; 252 matches 20;
    // the near-dup and fresh docs match nothing
    assert(screened == Seq((251L, 10L, 2L), (252L, 20L, 1L)))
  }

  test("real corpus: screened entry == unscreened twin (lossless at sf) and NON-VACUOUS") {
    val screened = ops.BloomDedup.dedupIncrementalBloom(spark, sf)
      .collect().map(_.toSeq).toSeq
    val unscreened = ops.BloomDedup.dedupIncrementalBloomOn(
      Tables.documents(spark, sf), 250L, None).collect().map(_.toSeq).toSeq
    assert(screened == unscreened)
    // the driver gate must check real survivor rows, not two empty frames
    assert(screened.nonEmpty, "gate corpus produced no cross-watermark duplicates")
  }

  test("blob cache is watermark-keyed: a later higher watermark never serves a stale blob") {
    // call at the default watermark first (populates the cache), then at a
    // higher one — a (session, dir)-only cache key would serve the w=250
    // blob, whose missing gap fingerprints cause Bloom FALSE NEGATIVES
    ops.BloomDedup.dedupIncrementalBloom(spark, sf).collect()
    val hi = ops.BloomDedup.dedupIncrementalBloom(spark, sf, watermarkId = 400L)
      .collect().map(_.toSeq).toSeq
    val truth = ops.BloomDedup.dedupIncrementalBloomOn(
      Tables.documents(spark, sf), 400L, None).collect().map(_.toSeq).toSeq
    assert(hi == truth, "stale blob served for a different watermark")
  }

  test("probe screens map-side: survivors bounded, might_contain below the join") {
    import spark.implicits._
    val docs = plantedCorpus()
    val blob = {
      val bf = docs.filter($"doc_id" <= 250L)
        .select(xxhash64(ops.BloomDedup.canonText($"text")).as("fp"))
        .stat.bloomFilter($"fp", 1000L, 0.01)
      val bos = new java.io.ByteArrayOutputStream(); bf.writeTo(bos); bos.toByteArray
    }
    // survivors of the probe alone: the 2 true dups (+ tolerated fp slack)
    val survivors = docs.filter($"doc_id" > 250L)
      .select($"doc_id", xxhash64(ops.BloomDedup.canonText($"text")).as("fp"))
      .filter(ops.BloomDedup.bloomProbe(blob, $"fp"))
      .collect().map(_.getLong(0)).toSet
    assert(Set(251L, 252L).subsetOf(survivors), s"false negative! $survivors")
    assert(survivors.size <= 3, s"bloom screen leaks: $survivors")
    // plan: the might_contain filter sits on the incoming side BELOW the
    // join (map-side screen), and the join is a hash/merge equi-join.
    // Asserted on the PARQUET-backed entry — over a LocalRelation Catalyst
    // constant-folds the whole screen away at plan time (the synthetic
    // corpus above would show nothing)
    val df = ops.BloomDedup.dedupIncrementalBloom(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("might_contain"), p)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
  }
}
