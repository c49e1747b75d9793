package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge between Catalyst [[Expression]]s and the public [[Column]] API.
  * Spark 4 made the Expression↔Column converters private[sql]; a library
  * adding native expressions needs this one-file shim in the sql package
  * (same technique as every Spark extension library).
  */
package object graftshim {
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Build a DataFrame from a custom logical plan (Dataset.ofRows is
    * private[sql] in Spark 4 — needed by libraries contributing custom
    * LogicalPlan nodes, e.g. graft's native as-of join).
    */
  def ofRows(spark: SparkSession, plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Re-declare a (truthful) hash partitioning on a checkpointed
    * [[execution.LogicalRDD]] leaf. Under AQE, `Dataset.localCheckpoint`
    * captures `UnknownPartitioning` even when the materialized RDD was
    * produced by an exact `repartition(n, col)` — the engine forgets a
    * layout fact the caller just paid a full shuffle to establish, and
    * every downstream join re-shuffles the corpus. This puts the fact
    * back so EnsureRequirements can consume the pinned layout
    * (reuse-a-partitioning-across-stages; see graft.ops.Als.train).
    *
    * CONTRACT: rows must genuinely be laid out as
    * `HashPartitioning(cols, n)` — i.e. the checkpoint must come from a
    * `repartition(n, cols)` with an EXPLICIT partition count (AQE never
    * changes REPARTITION_BY_NUM output, where a count-less
    * `repartition(col)` may be coalesced into a layout that is no
    * longer plain hash). Declaring a false partitioning silently
    * mis-co-partitions every join that trusts it.
    */
  def declareHashPartitioned(df: DataFrame, n: Int, colNames: String*): DataFrame = {
    val lr = df.queryExecution.analyzed match {
      case l: execution.LogicalRDD => l
      case other => throw new IllegalArgumentException(
        s"declareHashPartitioned needs a checkpointed LogicalRDD leaf, got ${other.getClass.getName}")
    }
    require(lr.rdd.getNumPartitions == n,
      s"declared $n partitions but the RDD has ${lr.rdd.getNumPartitions}")
    val attrs = colNames.map(c => lr.output.find(_.name == c).getOrElse(
      throw new IllegalArgumentException(s"no column '$c' in ${lr.output.map(_.name)}")))
    val hp = org.apache.spark.sql.catalyst.plans.physical.HashPartitioning(attrs, n)
    ofRows(df.sparkSession, lr.copy(outputPartitioning = hp)(
      df.sparkSession.asInstanceOf[classic.SparkSession],
      Some(lr.computeStats()), Some(lr.constraints)))
  }
}
