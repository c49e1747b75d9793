package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native Catalyst expression — the first
  * pass of every serious text-cleaning pipeline (decomposed accents,
  * compatibility variants, and mixed encodings otherwise make the SAME
  * visible string hash/dedup/tokenize differently). Wraps the JDK's
  * `java.text.Normalizer` (the reference Unicode implementation — DuckDB's
  * `nfc_normalize` implements the same standard algorithm, which is what
  * lets the corpus entry be oracle hash-exact) with an ASCII fast path:
  * ASCII is NFC by definition, so the common case never allocates a
  * String — at 100 TB the normalizer only pays for the rows that need it.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def checkInputDataTypes() =
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires STRING, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NfcNormalize.normalize($c);")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  import org.apache.spark.sql.graftshim

  /** Shared by interpreted eval and generated code (one implementation,
    * zero drift). ASCII fast path returns the input buffer untouched.
    */
  def normalize(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    var i = 0
    var ascii = true
    while (ascii && i < bytes.length) { ascii = (bytes(i) & 0x80) == 0; i += 1 }
    if (ascii) s
    else {
      val str = s.toString
      if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
      else UTF8String.fromString(
        java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
    }
  }

  /** Column-API entry point. */
  def nfc_normalize(c: Column): Column =
    graftshim.toColumn(NfcNormalize(graftshim.toExpression(c)))

  /** Register as a SQL function (`SELECT nfc_normalize(text) …`). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "nfc_normalize", exprs => NfcNormalize(exprs.head), "built-in")
}
