package graft.functions

import org.apache.spark.sql.Column

/** Adjacent-bigram extraction ("a b c" → ["a b", "b c"]): the n = 2 case
  * of [[WordNgrams]], kept as a named entry point because the bigram call
  * sites (co-occurrence, LM scoring, repetition filter) read better with
  * the domain term. One codegen byte pass; identical tokenization
  * (maximal non-space runs = `split(s, " +")` after trim), empty array
  * under two tokens. The previously separate hand-written expression was
  * byte-for-byte this specification — WordNgrams subsumed it.
  */
object AdjacentBigrams {

  /** Column-API entry point. */
  def adjacent_bigrams(c: Column): Column = WordNgrams.word_ngrams(c, 2)
}
