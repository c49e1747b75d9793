package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Fused linear form Σ wᵢ·xᵢ of a LITERAL weight vector against an
  * array<double> column, as one native codegen expression — the
  * double-typed sibling of [[LongVectorDot]] for model serving, where
  * the weights are plan constants (an LR or linear head trained
  * up-front) and only the feature column varies per row.
  *
  * Replaces the `lit(w₀)·element_at(x,1) + lit(w₁)·element_at(x,2) + …`
  * Column fold the LR scorers used: that chain generates one
  * bounds-check + null-branch block PER TERM, and at predicate depth
  * (the curation pipeline filters on the score) the resulting kilobytes
  * of Java hit Spark's expression splitter (`reduceCodeSize`), which
  * orphans a child's `isNull` local in a sibling split method — the
  * generated predicate fails to compile ("isNull_45 is not an rvalue")
  * and silently runs interpreted on a corpus-sized scan. One compact
  * expression stays far below the splitter threshold AND evaluates in a
  * single fused loop.
  *
  * Semantics (total function): NULL input → NULL; any NULL element →
  * NULL; length mismatch vs the weight vector → NULL. The element_at
  * chain it replaces THREW on short arrays — unreachable for every
  * caller (feature rows are fixed-width `array(...)` constructions),
  * and the null-not-throw form matches the [[LongVectorDot]] contract.
  * Accumulation runs in index order starting from 0.0 — bit-identical
  * to the left-associated fold it replaced (0.0 + x == x for every
  * finite x except -0.0).
  */
case class DoubleDotLiteral(child: Expression, weights: Seq[Double])
  extends UnaryExpression {

  override def dataType: DataType = DoubleType

  // may produce NULL (length mismatch / null element) for non-null input
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"dot_lit requires array<double>, got $t")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != weights.length) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      acc += weights(i) * x.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val w = ctx.addReferenceObj("weights", weights.toArray, "double[]")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val bad = ctx.freshName("bad")
      s"""
         |int $n = $x.numElements();
         |boolean $bad = $n != ${weights.length};
         |double $acc = 0.0;
         |for (int $i = 0; !$bad && $i < $n; $i++) {
         |  if ($x.isNullAt($i)) { $bad = true; } else { $acc += $w[$i] * $x.getDouble($i); }
         |}
         |if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): DoubleDotLiteral =
    copy(child = newChild)
}

object DoubleDotLiteral {
  /** Column-API entry point. */
  def dot_lit(x: Column, weights: Seq[Double]): Column =
    graftshim.toColumn(DoubleDotLiteral(graftshim.toExpression(x), weights))
}
