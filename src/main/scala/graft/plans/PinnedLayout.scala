package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Reuse-a-partitioning-across-stages, as a first-class device for the
  * iterative algorithms (ALS half-solves, PageRank rounds, label
  * propagation): shuffle the BIG static table ONCE into a hash layout on
  * its join key, materialize it, and have every iteration's join consume
  * that layout — so the per-round traffic is only the entity-sized table
  * (factors / ranks / labels), never the corpus.
  *
  * Three pieces make the claim real (any one missing and Spark silently
  * re-shuffles the corpus every round — the r11 ALS `weak` mark):
  *  1. `repartition(n, key)` with an EXPLICIT count: REPARTITION_BY_NUM
  *     output is never AQE-coalesced, so the materialized rows genuinely
  *     sit at `pmod(hash(key), n)`.
  *  2. `localCheckpoint()` to cut the lineage (the Lloyd plan-depth
  *     discipline) — but under AQE the checkpoint's LogicalRDD records
  *     UnknownPartitioning, forgetting the layout just paid for.
  *  3. `graftshim.declareHashPartitioned` puts the (truthful) layout
  *     fact back on the LogicalRDD so EnsureRequirements can consume it.
  *
  * Callers pair this with a SHUFFLE_HASH hint on the entity-sized side
  * of each round's join: the hash map builds on the small side and the
  * pinned corpus STREAMS — no sort, no exchange beneath it (plan-pinned
  * in AlsSpec and KnnGraphSpec).
  */
object PinnedLayout {

  /** One corpus shuffle, pinned and declared. */
  def pinByKey(df: DataFrame, key: String): DataFrame = {
    val n = df.sparkSession.sessionState.conf.numShufflePartitions
    org.apache.spark.sql.graftshim.declareHashPartitioned(
      df.repartition(n, col(key)).localCheckpoint(), n, key)
  }
}
