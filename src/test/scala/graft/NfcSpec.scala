package graft

import org.apache.spark.sql.functions._

/** NfcNormalize expression + text_normalize entry: codegen/interpreted
  * parity with the JDK reference, the ASCII fast path, and the cleaning
  * pipeline's planted positive paths.
  */
class NfcSpec extends SparkSuite {

  private val decomposedCafe = "café"       // e + combining acute
  private val composedCafe   = "café"        // precomposed é
  private val angstromSign   = "Å"           // Å (ANGSTROM SIGN) → NFC U+00C5

  test("nfc_normalize: JDK-reference values, codegen and interpreted agree") {
    import spark.implicits._
    import graft.functions.NfcNormalize.nfc_normalize
    val inputs = Seq("plain ascii", decomposedCafe, composedCafe, angstromSign, "")
    val got = inputs.toDF("s").select(nfc_normalize($"s")).collect().map(_.getString(0))
    val ref = inputs.map(s => java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
    assert(got.sameElements(ref))
    assert(got(1) == composedCafe)           // decomposed → composed
    assert(got(3) == "Å")               // compatibility-adjacent canonical map
    // interpreted eval path agrees
    inputs.foreach { s =>
      val e = graft.functions.NfcNormalize(
        org.apache.spark.sql.catalyst.expressions.Literal(
          org.apache.spark.unsafe.types.UTF8String.fromString(s)))
      assert(e.eval(null).toString ==
        java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
    }
    // null-safe
    assert(Seq[String](null).toDF("s").select(nfc_normalize($"s")).collect().head.isNullAt(0))
  }

  test("ASCII fast path returns the identical UTF8String buffer (no copy)") {
    val s = org.apache.spark.unsafe.types.UTF8String.fromString("pure ascii text")
    assert(graft.functions.NfcNormalize.normalize(s) eq s)
    val nonAscii = org.apache.spark.unsafe.types.UTF8String.fromString(composedCafe)
    // already-NFC non-ASCII also avoids re-encoding
    assert(graft.functions.NfcNormalize.normalize(nonAscii) eq nonAscii)
  }

  test("text_normalize: planted NFC, control-char, and whitespace cases") {
    import spark.implicits._
    val docs = Seq(
      (1L, s"$decomposedCafe au lait"),          // NFC change, length shrinks by 1
      (2L, "tab\tand\nnewline  runs"),           // whitespace collapse
      (3L, "ctrlcharshere"),         // C0 + DEL strip
      (4L, "already clean"),                     // unchanged
      (5L, "  padded  ")                         // trim + collapse
    ).toDF("doc_id", "text")
    val got = ops.CorpusOps.textNormalizeOn(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("norm_text"), r.getAs[Long]("changed"),
          r.getAs[Long]("n_chars_before"), r.getAs[Long]("n_chars_after")))).toMap
    assert(got(1L) == ((s"$composedCafe au lait", 1L, 13L, 12L)))
    assert(got(2L) == (("tab and newline runs", 1L, 21L, 20L)))
    assert(got(3L) == (("ctrlcharshere", 1L, 15L, 13L)))
    assert(got(4L) == (("already clean", 0L, 13L, 13L)))
    assert(got(5L) == (("padded", 1L, 10L, 6L)))
  }

  test("script profile: planted scripts counted and dominant-ranked correctly") {
    import spark.implicits._
    val docs = Seq(
      (1L, "hello world 123"),                    // latin + digits
      (2L, "привет мир"),                         // cyrillic
      (3L, "你好世界 と カタカナ 한글"),            // han + kana + hangul = cjk
      (4L, "مرحبا بالعالم"),                      // arabic
      (5L, "αβγ δε"),                             // greek
      (6L, "   .,;!?"),                           // nothing scriptful
      (7L, "mixed привет with more latin words")  // latin dominant over cyrillic
    ).toDF("doc_id", "text")
    val got = ops.LlmQueries.textScriptProfileOn(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(got(1L).getAs[String]("dominant_script") == "latin")
    assert(got(1L).getAs[Long]("n_latin") == 10L)
    assert(got(1L).getAs[Long]("n_digit") == 3L)
    assert(got(2L).getAs[String]("dominant_script") == "cyrillic")
    assert(got(2L).getAs[Long]("n_cyrillic") == 9L)
    assert(got(3L).getAs[String]("dominant_script") == "cjk")
    assert(got(3L).getAs[Long]("n_cjk") == 11L)
    assert(got(4L).getAs[String]("dominant_script") == "arabic")
    assert(got(5L).getAs[String]("dominant_script") == "greek")
    assert(got(6L).getAs[String]("dominant_script") == "none")
    assert(got(7L).getAs[String]("dominant_script") == "latin")
    assert(got(7L).getAs[Long]("n_cyrillic") == 6L)
  }

  test("registered via GraftExtensions SQL surface") {
    graft.functions.NfcNormalize.register(spark)
    val r = spark.sql(s"SELECT nfc_normalize('$decomposedCafe') AS n").collect().head
    assert(r.getString(0) == composedCafe)
  }
}
