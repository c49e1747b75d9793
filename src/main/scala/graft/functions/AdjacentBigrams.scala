package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Adjacent-bigram extraction ("a b c" → ["a b", "b c"]) as a single
  * whole-stage-codegen pass over the string's UTF-8 bytes — the
  * embedding-training pair stream's hot loop (ops.Curation.textCooccurrence).
  *
  * Tokens are maximal runs of non-space bytes (equivalent to
  * `split(s, " +")` after trim — a space byte is never part of a multi-byte
  * UTF-8 sequence, so byte-level scanning is UTF-8-safe). Fewer than two
  * tokens → empty array, never null elements. Replaces the previous
  * `zip_with(w, slice(w, 2, …), concat)` formulation, which (a) ran
  * interpreted — higher-order functions are CodegenFallback — and
  * (b) re-evaluated the regex `split` up to three times per row once
  * CollapseProject inlined the token-array alias into every use site.
  */
case class AdjacentBigrams(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes() =
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"adjacent_bigrams requires STRING, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[UTF8String].getBytes
    val out = new java.util.ArrayList[UTF8String]()
    var i = 0
    var prevStart = -1
    var prevEnd = -1
    while (i < b.length) {
      while (i < b.length && b(i) == 0x20) i += 1
      if (i < b.length) {
        val start = i
        while (i < b.length && b(i) != 0x20) i += 1
        if (prevStart >= 0) {
          val bg = new Array[Byte](prevEnd - prevStart + 1 + (i - start))
          System.arraycopy(b, prevStart, bg, 0, prevEnd - prevStart)
          bg(prevEnd - prevStart) = 0x20
          System.arraycopy(b, start, bg, prevEnd - prevStart + 1, i - start)
          out.add(UTF8String.fromBytes(bg))
        }
        prevStart = start
        prevEnd = i
      }
    }
    new GenericArrayData(out.toArray)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val b = ctx.freshName("b")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val start = ctx.freshName("start")
      val pS = ctx.freshName("prevStart")
      val pE = ctx.freshName("prevEnd")
      val bg = ctx.freshName("bg")
      s"""
         |byte[] $b = $c.getBytes();
         |java.util.ArrayList<UTF8String> $out = new java.util.ArrayList<UTF8String>();
         |int $i = 0; int $pS = -1; int $pE = -1;
         |while ($i < $b.length) {
         |  while ($i < $b.length && $b[$i] == 0x20) $i++;
         |  if ($i < $b.length) {
         |    int $start = $i;
         |    while ($i < $b.length && $b[$i] != 0x20) $i++;
         |    if ($pS >= 0) {
         |      byte[] $bg = new byte[$pE - $pS + 1 + ($i - $start)];
         |      System.arraycopy($b, $pS, $bg, 0, $pE - $pS);
         |      $bg[$pE - $pS] = 0x20;
         |      System.arraycopy($b, $start, $bg, $pE - $pS + 1, $i - $start);
         |      $out.add(UTF8String.fromBytes($bg));
         |    }
         |    $pS = $start; $pE = $i;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out.toArray());
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): AdjacentBigrams =
    copy(child = newChild)
}

object AdjacentBigrams {
  import org.apache.spark.sql.graftshim

  /** Column-API entry point. */
  def adjacent_bigrams(c: Column): Column =
    graftshim.toColumn(AdjacentBigrams(graftshim.toExpression(c)))
}
