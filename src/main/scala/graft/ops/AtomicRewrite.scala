package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame

/** Crash-safe replacement of a LIVE parquet directory — the shared
  * device behind every delete/vacuum op that rewrites a whole table in
  * place (norms/, lists/, projected/, adj/, seeds/, bands/,
  * wordsets/, the CF rollback): a plain `mode("overwrite")` deletes
  * the existing data at job START, so a crash during the multi-second
  * rewrite job leaves the table EMPTY — strictly worse than the
  * unapplied delete, in ops whose stated crash model is "retry and it
  * heals".
  *
  * Here the new contents land in a UNIQUE temp sibling first (the long
  * window — the whole Spark job — leaves the live dir untouched), and
  * only then two driver-side metadata ops swap it in: delete dest,
  * rename tmp → dest. The residual window is those two fs calls
  * (milliseconds, no data movement); a crash exactly between them
  * leaves dest absent and the complete tmp beside it — loud (readers
  * throw, nothing silently wrong) and manually recoverable by a
  * rename, unlike the silent empty table the naive form risks. Stale
  * `.tmp-` siblings from such crashes are swept on the next rewrite of
  * the same dir.
  *
  * Callers must pin `df` (localCheckpoint) before calling when its
  * lineage reads `destPath` — every current caller does.
  */
object AtomicRewrite {

  /** True iff the dir exists AND holds at least one COMMITTED entry.
    * The naive `exists && listStatus.nonEmpty` probe counts a crashed
    * write's lone `_temporary` dir as data, and the parquet read that
    * follows then throws unable-to-infer-schema on every retry — a
    * permanent crash loop in paths whose whole point is
    * heal-on-redelivery. Committed entries are non-hidden names PLUS
    * partition DIRECTORIES: a `_bucket=3` dir is committed output (the
    * touch/ledger stores partition on `_bucket`), while the temp/marker
    * names this probe exists to skip (`_temporary`, `_SUCCESS`,
    * `.hive-staging…`) never contain `=`. The `=` rule applies to
    * directories only (a stray `=`-named FILE is never committed
    * partition output), and it assumes the job-level commit protocol
    * (FileOutputCommitter algorithm v1, Spark's default for these
    * rewrites): partition dirs appear only at job commit. A
    * task-commit-materializing committer (algorithm v2) could leave a
    * crashed write's partial `_bucket=` dirs that this probe would count
    * as committed — the heal paths that rely on this probe all roll back
    * by batch stamp afterwards, but do not switch the committer.
    */
  def hasCommittedFiles(fs: org.apache.hadoop.fs.FileSystem, p: Path): Boolean =
    fs.exists(p) && fs.listStatus(p).exists { s =>
      val n = s.getPath.getName
      (n.contains("=") && s.isDirectory) || (!n.startsWith("_") && !n.startsWith("."))
    }

  def overwrite(df: DataFrame, destPath: String): Unit = {
    val spark = df.sparkSession
    val dest = new Path(destPath)
    val fs = dest.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // sweep tmp dirs orphaned by an earlier crash mid-write
    val parent = dest.getParent
    if (parent != null && fs.exists(parent))
      fs.listStatus(parent).toSeq
        .filter(_.getPath.getName.startsWith(dest.getName + ".tmp-"))
        .foreach(s => fs.delete(s.getPath, true))
    val tmp = new Path(destPath + ".tmp-" +
      java.util.UUID.randomUUID().toString.take(8))
    df.write.mode("overwrite").parquet(tmp.toString)
    fs.delete(dest, true)
    if (!fs.rename(tmp, dest))
      throw new IllegalStateException(s"atomic rewrite: rename $tmp -> $dest failed")
  }
}
