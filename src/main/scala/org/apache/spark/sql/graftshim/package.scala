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
}
