package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{LongVectorDot, RollingHash, WordNgrams}

/** Session extension: installs graft's native expressions as SQL functions
  * and the dot-product rewrite rule (plans.RewriteDotProduct) at session
  * build time —
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)
  *   // or: .config("spark.sql.extensions", "graft.GraftExtensions")
  * }}}
  *
  * after which `SELECT rolling_hash(text)`, `SELECT vector_dot(a, b)` work
  * in plain SQL on any cluster with the graft jar.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "built-in")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => graft.plans.RewriteDotProduct)
    ext.injectPlannerStrategy(_ => graft.plans.AsofJoinStrategy)
    ext.injectFunction((
      FunctionIdentifier("rolling_hash"),
      info("rolling_hash", "rolling_hash(str) - 64-bit polynomial rolling hash of str's UTF-8 bytes"),
      (exprs: Seq[Expression]) => RollingHash(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("vector_dot"),
      info("vector_dot", "vector_dot(a, b) - integer dot product of two array<bigint> vectors"),
      (exprs: Seq[Expression]) => LongVectorDot(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("adjacent_bigrams"),
      info("adjacent_bigrams", "adjacent_bigrams(str) - array of space-joined adjacent token pairs"),
      (exprs: Seq[Expression]) => WordNgrams(exprs.head, 2)))
    ext.injectFunction((
      FunctionIdentifier("word_ngrams"),
      info("word_ngrams", "word_ngrams(str, n) - array of space-joined word n-grams, one per start position"),
      (exprs: Seq[Expression]) => {
        // n must be a literal: it shapes the generated code, so it cannot
        // vary per row. Validate here for a real error message instead of
        // a raw ClassCastException from a blind eval.
        if (exprs.length != 2)
          throw new IllegalArgumentException(
            s"word_ngrams(str, n) takes 2 arguments, got ${exprs.length}")
        val n = exprs(1) match {
          case e if e.foldable => e.eval(null) match {
            case i: Int => i
            case l: Long => l.toInt
            case other => throw new IllegalArgumentException(
              s"word_ngrams: n must be an integer literal, got $other")
          }
          case _ => throw new IllegalArgumentException(
            "word_ngrams: n must be a literal (it shapes the generated code)")
        }
        WordNgrams(exprs.head, n)
      }))
    ext.injectFunction((
      FunctionIdentifier("nfc_normalize"),
      info("nfc_normalize", "nfc_normalize(str) - Unicode NFC normalization (ASCII fast path)"),
      (exprs: Seq[Expression]) => graft.functions.NfcNormalize(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("simhash_fingerprint"),
      info("simhash_fingerprint",
        "simhash_fingerprint(hashes) - packed 64-bit SimHash of an array<bigint> of token hashes (majority vote per bit)"),
      (exprs: Seq[Expression]) => graft.functions.SimHashFingerprint(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("partial_topk"),
      info("partial_topk",
        "partial_topk(struct, k) - aggregate: k smallest struct rows per group " +
          "(bounded map-side heaps; at most k rows per group per partition reach the exchange)"),
      (exprs: Seq[Expression]) => {
        if (exprs.length != 2)
          throw new IllegalArgumentException(
            s"partial_topk(struct, k) takes 2 arguments, got ${exprs.length}")
        val k = exprs(1) match {
          case e if e.foldable => e.eval(null) match {
            case i: Int => i
            case l: Long => l.toInt
            case other => throw new IllegalArgumentException(
              s"partial_topk: k must be an integer literal, got $other")
          }
          case _ => throw new IllegalArgumentException(
            "partial_topk: k must be a literal (it bounds the aggregation buffer)")
        }
        graft.functions.PartialTopK(exprs.head, k)
      }))
  }
}
