package graft

import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Bucketed right-to-be-forgotten purge: the purged keys vanish from
  * reads, only their buckets are rewritten (cold buckets byte-stable by
  * mtime), a second purge of the same keys is a no-op, and the audit
  * accounting matches an independent recount.
  */
class UserPurgeSpec extends SparkSuite {

  private def bucketFiles(wh: String): Map[String, Long] = {
    val root = new java.io.File(wh)
    root.listFiles().filter(_.getName.startsWith("_bucket="))
      .flatMap(d => d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getPath -> f.lastModified()))
      .toMap
  }

  test("purge removes exactly the key set, bucket-isolated, idempotent") {
    import spark.implicits._
    // private warehouse for this spec (the entry's own path would be
    // rebuilt underneath us by other suites)
    val wh = Files.createTempDirectory("graft_purge_spec").toString + "/wh"
    val ev = Tables.events(spark, sf)
    ev.withColumn("_bucket",
        pmod(xxhash64($"user_id".cast("string")), lit(16)).cast("int"))
      .write.mode("overwrite").partitionBy("_bucket").parquet(wh)
    val purgeKeys = ev.select($"user_id").distinct().filter($"user_id" % 97 === 0)
    val keyList = purgeKeys.as[Long].collect().toSet
    assert(keyList.nonEmpty, "vacuous purge set")
    val before = bucketFiles(wh)
    val hotBuckets = keyList.map(k =>
      spark.range(1).select(pmod(xxhash64(lit(k).cast("string")), lit(16)).cast("int"))
        .head().getInt(0))
    val audit = etl.UserPurge.purgeFrom(spark, wh, purgeKeys).head()
    // accounting matches an independent recount
    val expectRows = ev.join(purgeKeys, Seq("user_id"), "left_semi").count()
    assert(audit.getAs[Long]("n_purged_rows") == expectRows)
    assert(audit.getAs[Long]("n_purge_users") == keyList.size)
    assert(audit.getAs[Long]("rows_before") == ev.count())
    // the keys are gone; everything else survived
    val after = spark.read.parquet(wh)
    assert(after.filter($"user_id".isin(keyList.toSeq: _*)).count() == 0)
    assert(after.count() == ev.count() - expectRows)
    // cold buckets byte-stable (mtime isolation, the merge-sink contract)
    val afterFiles = bucketFiles(wh)
    val cold = before.keys.filter(p => !hotBuckets.exists(b => p.contains(s"_bucket=$b")))
    assert(cold.nonEmpty, "every bucket was hot — isolation not exercised")
    cold.foreach { p =>
      assert(afterFiles.contains(p) && afterFiles(p) == before(p),
        s"cold bucket file rewritten: $p")
    }
    // idempotent: purging again finds nothing
    val again = etl.UserPurge.purgeFrom(spark, wh, purgeKeys).head()
    assert(again.getAs[Long]("n_purged_rows") == 0L)
    assert(spark.read.parquet(wh).count() == ev.count() - expectRows)
  }
}
