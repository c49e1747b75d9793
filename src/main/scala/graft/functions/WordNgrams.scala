package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram extraction ("a b c d", n=3 → ["a b c", "b c d"]) as one
  * whole-stage-codegen pass over the string's UTF-8 bytes — the hot loop
  * of the corpus-hygiene operators (decontamination's 8-grams, substring-
  * span dedup's 15-grams, the streaming screen). Generalizes
  * [[AdjacentBigrams]] (= n 2, kept for the bigram call sites).
  *
  * Tokens are maximal runs of non-space bytes (UTF-8-safe: 0x20 never
  * occurs inside a multi-byte sequence), equivalent to `split(s, " +")`
  * after trim; grams join their n tokens with single spaces, exactly the
  * `concat_ws(" ", slice(w, i, n))` the HOF formulation produced — parity
  * is spec-pinned so the oracle-green operators stay hash-identical.
  * Fewer than n tokens → empty array. The previous formulation
  * (transform over sequence + slice + concat_ws per position) ran
  * interpreted (HOFs are CodegenFallback) and re-copied the token array
  * per position.
  */
case class WordNgrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"word_ngrams requires n >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes() =
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"word_ngrams requires STRING, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[UTF8String].getBytes
    // token boundaries: at most (len+1)/2 tokens
    val starts = new Array[Int](b.length / 2 + 1)
    val ends = new Array[Int](b.length / 2 + 1)
    var nTok = 0
    var i = 0
    while (i < b.length) {
      while (i < b.length && b(i) == 0x20) i += 1
      if (i < b.length) {
        starts(nTok) = i
        while (i < b.length && b(i) != 0x20) i += 1
        ends(nTok) = i
        nTok += 1
      }
    }
    val nGrams = math.max(0, nTok - n + 1)
    val out = new Array[AnyRef](nGrams)
    var g = 0
    while (g < nGrams) {
      var len = n - 1
      var t = g
      while (t < g + n) { len += ends(t) - starts(t); t += 1 }
      val gb = new Array[Byte](len)
      var off = 0
      t = g
      while (t < g + n) {
        if (t > g) { gb(off) = 0x20; off += 1 }
        System.arraycopy(b, starts(t), gb, off, ends(t) - starts(t))
        off += ends(t) - starts(t)
        t += 1
      }
      out(g) = UTF8String.fromBytes(gb)
      g += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val b = ctx.freshName("b"); val starts = ctx.freshName("starts")
      val ends = ctx.freshName("ends"); val nTok = ctx.freshName("nTok")
      val i = ctx.freshName("i"); val nGrams = ctx.freshName("nGrams")
      val out = ctx.freshName("out"); val g = ctx.freshName("g")
      val len = ctx.freshName("len"); val t = ctx.freshName("t")
      val gb = ctx.freshName("gb"); val off = ctx.freshName("off")
      s"""
         |byte[] $b = $c.getBytes();
         |int[] $starts = new int[$b.length / 2 + 1];
         |int[] $ends = new int[$b.length / 2 + 1];
         |int $nTok = 0; int $i = 0;
         |while ($i < $b.length) {
         |  while ($i < $b.length && $b[$i] == 0x20) $i++;
         |  if ($i < $b.length) {
         |    $starts[$nTok] = $i;
         |    while ($i < $b.length && $b[$i] != 0x20) $i++;
         |    $ends[$nTok] = $i; $nTok++;
         |  }
         |}
         |int $nGrams = java.lang.Math.max(0, $nTok - $n + 1);
         |Object[] $out = new Object[$nGrams];
         |for (int $g = 0; $g < $nGrams; $g++) {
         |  int $len = $n - 1;
         |  for (int $t = $g; $t < $g + $n; $t++) $len += $ends[$t] - $starts[$t];
         |  byte[] $gb = new byte[$len];
         |  int $off = 0;
         |  for (int $t = $g; $t < $g + $n; $t++) {
         |    if ($t > $g) { $gb[$off] = 0x20; $off++; }
         |    System.arraycopy($b, $starts[$t], $gb, $off, $ends[$t] - $starts[$t]);
         |    $off += $ends[$t] - $starts[$t];
         |  }
         |  $out[$g] = UTF8String.fromBytes($gb);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WordNgrams =
    copy(child = newChild)
}

object WordNgrams {
  import org.apache.spark.sql.graftshim

  /** Column-API entry point. */
  def word_ngrams(c: Column, n: Int): Column =
    graftshim.toColumn(WordNgrams(graftshim.toExpression(c), n))
}
