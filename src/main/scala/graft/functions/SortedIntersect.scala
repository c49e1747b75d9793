package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}

/** |A ∩ B| over two SORTED, DISTINCT array<string> columns as one fused
  * two-pointer merge inside whole-stage codegen (r15 perf pass).
  *
  * Replaces `size(array_intersect(a, b))` on the exact-Jaccard /
  * containment verify hot paths: array_intersect builds a hash set of one
  * side and materializes the intersection ARRAY per candidate pair, only
  * for size() to throw the elements away — the merge count allocates
  * nothing and runs one binary-compare pass. `size(array_union(a, b))`
  * likewise becomes `size(a) + size(b) − count` at the call sites (exact
  * for distinct arrays — every verify input is a [[graft.ops.ScaleDedup]]
  * wordSet: array_sort(array_distinct(...))).
  *
  * PRECONDITION (caller-owned, like vector_dot's equal-length contract):
  * both arrays are sorted ascending by Spark's binary UTF8String order
  * with nulls last (array_sort's default) and duplicate-free. Every call
  * site passes wordSet output, which guarantees both.
  *
  * Null semantics mirror the size∘array_intersect composition on such
  * inputs: NULL array → NULL; a null ELEMENT present in both arrays
  * counts once (array_sort puts it last on both sides).
  */
case class SortedIntersectCount(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect_count requires array<string>, got ($l, $r)")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val na = x.numElements()
    val nb = y.numElements()
    var i = 0
    var j = 0
    var cnt = 0
    while (i < na && j < nb) {
      val an = x.isNullAt(i)
      val bn = y.isNullAt(j)
      val c =
        if (an && bn) 0
        else if (an) 1 // nulls sort last
        else if (bn) -1
        else x.getUTF8String(i).compareTo(y.getUTF8String(j))
      if (c == 0) { cnt += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val cnt = ctx.freshName("cnt")
      val an = ctx.freshName("an")
      val bn = ctx.freshName("bn")
      val c = ctx.freshName("c")
      s"""
         |int $na = $a.numElements();
         |int $nb = $b.numElements();
         |int $i = 0; int $j = 0; int $cnt = 0;
         |while ($i < $na && $j < $nb) {
         |  boolean $an = $a.isNullAt($i);
         |  boolean $bn = $b.isNullAt($j);
         |  int $c;
         |  if ($an && $bn) { $c = 0; }
         |  else if ($an) { $c = 1; }
         |  else if ($bn) { $c = -1; }
         |  else { $c = $a.getUTF8String($i).compareTo($b.getUTF8String($j)); }
         |  if ($c == 0) { $cnt++; $i++; $j++; }
         |  else if ($c < 0) { $i++; }
         |  else { $j++; }
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {
  /** Column-API entry point. */
  def sorted_intersect_count(a: Column, b: Column): Column =
    graftshim.toColumn(SortedIntersectCount(
      graftshim.toExpression(a), graftshim.toExpression(b)))
}
