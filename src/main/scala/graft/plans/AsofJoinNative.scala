package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Descending, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native as-of (point-in-time) join — the full custom-operator surface:
  * a logical node ([[AsofJoinPlan]]), a planner strategy
  * ([[AsofJoinStrategy]]) and a physical operator ([[AsofJoinExec]])
  * implementing a streaming sort-merge pass.
  *
  * Semantics (identical to [[graft.ops.AsofJoin.asof]] and DuckDB's
  * `ASOF LEFT JOIN`): for every left row, attach the payload of the LAST
  * right row with the same key and right.time ≤ left.time, or nulls if no
  * such row exists. With `forward = true` the direction flips (DuckDB's
  * forward ASOF, [[graft.ops.AsofJoin.asofForward]]): the FIRST right row
  * with right.time ≥ left.time — implemented as the same merge pass over
  * a time-DESCENDING sort (reversed scan; the inclusive comparison makes
  * equal-time right rows visible, the "right-first tie" rule).
  *
  * Scale shape: `requiredChildDistribution` clusters both sides on the key
  * and `requiredChildOrdering` sorts by (key, time) — EnsureRequirements
  * inserts exactly one co-partitioning shuffle + sort per side, after which
  * the merge is a single forward pass per partition: O(|L| + |R|) with O(1)
  * state (one buffered candidate row). No window state, no per-row range
  * probe — strictly less memory than the union + forward-fill-window
  * formulation, with the same single-shuffle cost.
  */
case class AsofJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    payload: Seq[Attribute],
    forward: Boolean = false) extends BinaryNode {

  /** Left columns plus the (nullable) as-of payload columns. */
  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.withNullability(true))

  override protected def withNewChildrenInternal(newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinPlan(l, r, lk, rk, lt, rt, payload, fwd) =>
      AsofJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, payload, fwd) :: Nil
    case _ => Nil
  }
}

case class AsofJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    payload: Seq[Attribute],
    forward: Boolean = false) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.withNullability(true))

  // one shuffle per side, co-partitioned on the key
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  // merge pass needs (key, time) order within each partition; forward
  // reverses the time scan so "next at-or-after" is the same one-pass merge
  private def timeDir = if (forward) Descending else Ascending

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, timeDir)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, timeDir)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, timeDir))

  override protected def doExecute(): RDD[InternalRow] = {
    val keyOrd  = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val timeOrd = TypeUtils.getInterpretedOrdering(leftTime.dataType)
    // widened for the result binding: the output slot is nullable (left rows
    // without a match get the null payload row) even if the source is not
    val payloadAttrs = payload.map(_.withNullability(true))
    val leftOut = left.output
    val rightOut = right.output
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyEval  = BindReferences.bindReference(leftKey, leftOut)
      val lTimeEval = BindReferences.bindReference(leftTime, leftOut)
      val rKeyEval  = BindReferences.bindReference(rightKey, rightOut)
      val rTimeEval = BindReferences.bindReference(rightTime, rightOut)
      val payloadProj = UnsafeProjection.create(payload, rightOut)
      val resultProj  = UnsafeProjection.create(outAttrs, leftOut ++ payloadAttrs)
      val nullPayload = new GenericInternalRow(payloadAttrs.size)
      val joined = new JoinedRow

      val rBuf = rIter.buffered
      // the last same-key right row with time <= current left time
      var candidate: InternalRow = null
      var candidateKey: Any = null

      lIter.map { lRow =>
        val lk = lKeyEval.eval(lRow)
        val lt = lTimeEval.eval(lRow)
        if (lk == null || lt == null) {
          // null keys/times never match (join semantics); nulls sort first
          resultProj(joined(lRow, nullPayload))
        } else {
          var advance = true
          while (advance && rBuf.hasNext) {
            val head = rBuf.head
            val rk = rKeyEval.eval(head)
            if (rk == null) {
              rBuf.next() // null right keys match nothing; sorted first, skip
            } else {
              val cmp = keyOrd.compare(rk, lk)
              if (cmp < 0) {
                rBuf.next() // smaller key: skip (stale candidates guarded by key check below)
              } else if (cmp == 0) {
                val rt = rTimeEval.eval(head)
                if (rt == null) {
                  // null right times match nothing — consume the row (it
                  // sorts FIRST under Ascending / LAST under Descending;
                  // either way it must never block a valid same-key row)
                  rBuf.next()
                } else if (if (forward) timeOrd.compare(rt, lt) >= 0
                           else timeOrd.compare(rt, lt) <= 0) {
                  // backward: last right with rt ≤ lt (ascending scan);
                  // forward: first right with rt ≥ lt (descending scan —
                  // the last row consumed is the SMALLEST rt ≥ lt)
                  candidate = payloadProj.apply(rBuf.next()).copy()
                  candidateKey = lk
                } else {
                  advance = false // same key, wrong side of lt: keep for next left rows
                }
              } else {
                advance = false // later key: keep for next left rows
              }
            }
          }
          val p =
            if (candidate != null && keyOrd.compare(candidateKey, lk) == 0) candidate
            else nullPayload
          resultProj(joined(lRow, p))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsofJoinNative {

  /** As-of join `left` with `right` on equal `key`, right.`ts` ≤ left.`ts`
    * (or ≥ with `forward = true`); `payload` columns from the right are
    * attached as `asof_<name>`. Self-registers the planner strategy on the
    * session.
    */
  def asof(left: DataFrame, right: DataFrame, key: String, ts: String,
      payload: Seq[String], forward: Boolean = false): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsofJoinStrategy)) {
      spark.experimental.extraStrategies = spark.experimental.extraStrategies :+ AsofJoinStrategy
    }
    val lPlan = left.queryExecution.analyzed
    // self-join safety: if the two sides share attribute ids (common lineage),
    // the analyzer would deduplicate the right CHILD's ids without rewriting
    // this node's rightKey/rightTime (it cannot know their side) — re-alias
    // the right side up front so every right id is fresh
    val rightDistinct =
      if (lPlan.outputSet.intersect(right.queryExecution.analyzed.outputSet).nonEmpty)
        right.select(right.columns.map(n => right(n).as(n)).toIndexedSeq: _*)
      else right
    val rPlan = rightDistinct.queryExecution.analyzed
    def attr(p: LogicalPlan, name: String): Attribute =
      p.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not in ${p.output.map(_.name)}"))
    val payloadAttrs = payload.map(c => attr(rPlan, c).withName(s"asof_$c"))
    val node = AsofJoinPlan(lPlan, rPlan,
      attr(lPlan, key), attr(rPlan, key), attr(lPlan, ts), attr(rPlan, ts), payloadAttrs, forward)
    org.apache.spark.sql.graftshim.ofRows(spark, node)
  }
}
