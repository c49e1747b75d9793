package graft.tools

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec

/** Physical-plan traversal that descends through AQE wrappers.
  *
  * With `spark.sql.adaptive.enabled=true`, `queryExecution.executedPlan`
  * is an `AdaptiveSparkPlanExec`, which is a LEAF node to
  * `TreeNode.collect` — a naive `plan.collect {...}` never sees the real
  * operators, so plan assertions written that way are vacuously green.
  * This walker recurses into the adaptive plan, materialized query stages,
  * and reused exchanges, returning every reachable node.
  */
object PlanWalk {

  def flatten(p: SparkPlan): Seq[SparkPlan] = {
    val below: Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
      case q: QueryStageExec        => flatten(q.plan)
      case r: ReusedExchangeExec    => flatten(r.child)
      case other                    => other.children.flatMap(flatten)
    }
    p +: below
  }

  /** `collect` over the AQE-unwrapped node set. */
  def collectAll[A](p: SparkPlan)(pf: PartialFunction[SparkPlan, A]): Seq[A] =
    flatten(p).collect(pf)

  /** Unpartitioned (single-task) window operators — the 100 TB red flag. */
  def globalWindows(p: SparkPlan): Seq[SparkPlan] = collectAll(p) {
    case w: org.apache.spark.sql.execution.window.WindowExec if w.partitionSpec.isEmpty => w
    case w: org.apache.spark.sql.execution.window.WindowGroupLimitExec if w.partitionSpec.isEmpty => w
  }
}
