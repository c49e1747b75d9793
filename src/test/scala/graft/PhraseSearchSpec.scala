package graft

import org.apache.spark.sql.functions._

/** Phrase-search semantics on hand-checked streams plus the persisted
  * positional index's serve parity. Value-level correctness at corpus
  * scale is the driver's DuckDB gate.
  */
class PhraseSearchSpec extends SparkSuite {

  test("alignment join: adjacency, order, overlap, repeated-word phrases") {
    import spark.implicits._
    // doc 1: "a b c a b" — "a b" occurs at 1 and 4; "b a" never (b→c, b→end);
    // doc 2: "b a b a b" — "a b" at 2 and 4 (overlapping region shared
    //   token 'b' at pos 3 belongs to no "a b": a at 2 → b at 3 ✓, a at 4 → b at 5 ✓);
    //   repeated-word phrase "b a b" at 1 and 3 (OVERLAPPING — both count);
    // doc 3: "a c b" — words present but never adjacent.
    val toks = Seq(
      (1L, "a b c a b"), (2L, "b a b a b"), (3L, "a c b")
    ).toDF("doc_id", "text")
      .select($"doc_id", posexplode(split($"text", " ")).as(Seq("p0", "term")))
      .select($"doc_id", ($"p0" + 1).cast("long").as("pos"), $"term")
    def tf(ph: Seq[String]): Map[Long, Long] =
      ops.PhraseSearch.phraseMatches(toks, ph).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(tf(Seq("a", "b")) == Map(1L -> 2L, 2L -> 2L), "order + adjacency")
    assert(tf(Seq("b", "a")) == Map(2L -> 2L), "direction matters")
    assert(tf(Seq("b", "a", "b")) == Map(2L -> 2L),
      "repeated-word phrase counts overlapping occurrences")
    assert(tf(Seq("c", "b")) == Map(3L -> 1L))
    assert(tf(Seq("b", "c", "b")).isEmpty, "no false trigram")
  }

  test("corpus phrase hits are real adjacencies; persisted serve is row-identical") {
    import spark.implicits._
    val inSession = ops.PhraseSearch.textSearchPhrase(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(inSession.nonEmpty, "gate phrase must hit the corpus")
    // cross-check one hit against the raw text
    val (docId, n) = inSession.head
    val text = Tables.documents(spark, sf).filter($"doc_id" === docId)
      .select(lower(trim($"text"))).head.getString(0)
    val w = text.split(" +")
    val ref = w.indices.dropRight(1).count(i => w(i) == "table" && w(i + 1) == "hash")
    assert(ref.toLong == n, s"doc $docId adjacency count")
    val served = ops.PhraseSearch.textSearchPhrasePersisted(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(served == inSession, "index serve == in-session, row for row")
  }

  test("positional index append: save 70% + append 30% == full rebuild, row for row") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val path = java.nio.file.Files.createTempDirectory("graft_posidx").toString
    val landed = docs.filter($"doc_id" % 10 < 7)
    val batch = docs.filter($"doc_id" % 10 >= 7)
    // save the landed corpus, then append the batch (O(batch) work)
    ops.PhraseSearch.positionalRows(landed)
      .write.mode("overwrite").partitionBy("tb").parquet(s"$path/positions")
    ops.PhraseSearch.appendToPositionalIndex(batch, path)
    val appended = ops.PhraseSearch.phraseFromIndex(spark, path, ops.PhraseSearch.phrase)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val rebuilt = ops.PhraseSearch.textSearchPhrase(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(appended == rebuilt, "append == rebuild through the phrase core")
  }
}
