package graft.expressions

import graft.SparkSpec
import graft.ops.TextAnalysis
import org.apache.spark.sql.functions._

/** All non-ASCII test data is written with explicit \\u escapes \u2014
  * source-file normalization must never decide what is decomposed. */
class NfcNormalizeSpec extends SparkSpec {
  import spark.implicits._

  private def nfc(ss: String*): Seq[String] =
    ss.zipWithIndex.map { case (s, i) => (i, s) }
      .toDF("id", "s").orderBy("id")
      .select(TextAnalysis.nfcNormalize(col("s")))
      .collect().map(_.getString(0)).toSeq

  test("composes decomposed sequences to canonical form") {
    // e+U+0301 -> \u00e9 (U+00E9); o+U+0308 -> \u00f6 (U+00F6); A+U+030A -> \u00c5 (U+00C5)
    assert(nfc("e\u0301", "o\u0308", "A\u030a") ===
      Seq("\u00e9", "\u00f6", "\u00c5"))
  }

  test("ASCII and already-NFC text pass through unchanged") {
    assert(nfc("plain ascii 123", "caf\u00e9", "") ===
      Seq("plain ascii 123", "caf\u00e9", ""))
  }

  test("matches java.text.Normalizer on mixed multi-mark strings") {
    // non-composing pairs (q+acute has no precomposed form), stacked
    // marks, and mixed ASCII context must follow UAX #15 exactly \u2014
    // the JDK reference implementation is the spec
    val inputs = Seq("q\u0301", "e\u0301\u0308", "A\u0300 b\u0301c",
      "ascii then e\u0301 end")
    val expected = inputs.map(
      java.text.Normalizer.normalize(_, java.text.Normalizer.Form.NFC))
    assert(nfc(inputs: _*) === expected)
  }

  test("null in, null out; kernel eval agrees with the projection") {
    val df = Seq((1, Option.empty[String]), (2, Some("e\u0301"))).toDF("id", "s")
    val got = df.orderBy("id")
      .select(TextAnalysis.nfcNormalize(col("s"))).collect()
    assert(got(0).isNullAt(0) && got(1).getString(0) === "\u00e9")
    assert(NfcKernel.nfc(
      org.apache.spark.unsafe.types.UTF8String.fromString("e\u0301")).toString
      === "\u00e9")
  }

  test("cleanText strips controls, collapses runs, trims \u2014 NFC first") {
    val got = Seq((1, "  a\u0301\tb  c\r "))
      .toDF("id", "s")
      .select(TextAnalysis.cleanText(col("s"))).collect()(0).getString(0)
    assert(got === "\u00e1 b c")
  }

  test("cleanText keeps newlines (layout) while killing carriage returns") {
    val got = Seq((1, "line1 \r\nline2"))
      .toDF("id", "s")
      .select(TextAnalysis.cleanText(col("s"))).collect()(0).getString(0)
    assert(got === "line1 \nline2")
  }
}
