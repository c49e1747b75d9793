package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Integer vector dot product Σ aᵢ·bᵢ over two array<bigint> columns as a
  * native codegen expression.
  *
  * The zip_with + aggregate composition is semantically identical but runs
  * on the interpreted higher-order-function path and allocates an
  * intermediate array per row; this is a single fused loop inside
  * whole-stage codegen — the hot inner op of dedup_embedding/ann_topk_exact
  * where it runs once per candidate pair.
  *
  * Semantics exactly mirror the HOF idiom it replaces (so the
  * [[graft.plans.RewriteDotProduct]] optimizer rewrite is
  * semantics-preserving):
  *  - unequal lengths → NULL (zip_with pads the shorter side with NULL, the
  *    padded products poison the sum);
  *  - any NULL element → NULL (NULL·x = NULL ⇒ running sum NULL);
  *  - `failOnError` (= session ANSI mode at construction) → overflow throws
  *    like ANSI Add/Multiply; otherwise wraps like the non-ANSI idiom.
  * With quantized embeddings (|x| ≤ ~10³) overflow is unreachable either
  * way and the result matches the integer oracle bit-for-bit.
  */
case class LongVectorDot(left: Expression, right: Expression, failOnError: Boolean)
  extends BinaryExpression {

  override def dataType: DataType = LongType

  // may produce NULL (length mismatch / null element) even for non-null inputs
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(s"vector_dot requires array<bigint>, got ($l, $r)")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      if (failOnError) acc = Math.addExact(acc, Math.multiplyExact(x.getLong(i), y.getLong(i)))
      else acc += x.getLong(i) * y.getLong(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val bad = ctx.freshName("bad")
      val step =
        if (failOnError)
          s"$acc = Math.addExact($acc, Math.multiplyExact($a.getLong($i), $b.getLong($i)));"
        else
          s"$acc += $a.getLong($i) * $b.getLong($i);"
      s"""
         |int $n = $a.numElements();
         |boolean $bad = $n != $b.numElements();
         |long $acc = 0L;
         |for (int $i = 0; !$bad && $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; } else { $step }
         |}
         |if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): LongVectorDot =
    copy(left = newLeft, right = newRight)
}

object LongVectorDot {
  def apply(left: Expression, right: Expression): LongVectorDot =
    LongVectorDot(left, right, SQLConf.get.ansiEnabled)

  /** Column-API entry point. */
  def vector_dot(a: Column, b: Column): Column =
    graftshim.toColumn(LongVectorDot(graftshim.toExpression(a), graftshim.toExpression(b)))

  /** Register as a SQL function. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vector_dot", exprs => LongVectorDot(exprs(0), exprs(1)), "built-in")
}
