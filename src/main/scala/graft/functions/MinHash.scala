package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Fused MinHash signature: all `as.length` lanes of
  * `min over tokens of (aⱼ·h + bⱼ) mod prime` computed in ONE pass over the
  * token-hash array, inside whole-stage codegen.
  *
  * The declarative form — 64 sibling `array_min(transform(hs, h =>
  * pmod(h·a + b, P)))` columns — is semantically identical but runs 64
  * interpreted higher-order-function passes and allocates 64 intermediate
  * arrays per row; this expression is a single `tokens × lanes` loop with a
  * stack-local `long[]` of running minima (the dominant cost of
  * dedup_minhash_lsh at sf0.1 moved from 19 s to the ~1 s class).
  *
  * Null elements are skipped (they contribute no minimum); an all-null or
  * empty input yields lanes pinned at `prime` (> any real lane value, and
  * deterministic). Coefficients must satisfy aⱼ·h + bⱼ < 2⁶³ for h < prime —
  * guaranteed by choosing prime = 2³¹−1 and aⱼ, bⱼ < prime.
  *
  * Reference semantics: minhash banding dedup as in the classic
  * shingle→minhash→band→bucket pipeline (Leskovec/Rajaraman/Ullman, Mining
  * of Massive Datasets ch. 3).
  */
case class MinHashSignature(child: Expression, as: Array[Long], bs: Array[Long], prime: Long)
  extends UnaryExpression {

  require(as.length == bs.length, "coefficient arrays must have equal length")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"minhash_signature requires array<bigint>, got $t")
  }

  private def lanes: Int = as.length

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(lanes)(prime)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = arr.getLong(i)
        var j = 0
        while (j < lanes) {
          val v = (as(j) * h + bs(j)) % prime
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val asRef = ctx.addReferenceObj("minhashAs", as, "long[]")
    val bsRef = ctx.addReferenceObj("minhashBs", bs, "long[]")
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      val mins = ctx.freshName("mins")
      s"""
         |int $n = $c.numElements();
         |long[] $mins = new long[$lanes];
         |java.util.Arrays.fill($mins, ${prime}L);
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$c.isNullAt($i)) {
         |    long $h = $c.getLong($i);
         |    for (int $j = 0; $j < $lanes; $j++) {
         |      long $v = ($asRef[$j] * $h + $bsRef[$j]) % ${prime}L;
         |      if ($v < $mins[$j]) $mins[$j] = $v;
         |    }
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHashSignature {
  /** Column-API entry point: `tokenHashes` is array<bigint> of per-token
    * hashes already reduced mod `prime`.
    */
  def minhash_signature(tokenHashes: Column, as: Array[Long], bs: Array[Long], prime: Long): Column =
    graftshim.toColumn(MinHashSignature(graftshim.toExpression(tokenHashes), as, bs, prime))
}
