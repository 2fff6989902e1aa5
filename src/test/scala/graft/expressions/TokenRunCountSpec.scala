package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.functions._

class TokenRunCountSpec extends SparkSpec {
  import spark.implicits._

  private def trc(c: org.apache.spark.sql.Column) =
    GraftColumnBridge.column(TokenRunCount(GraftColumnBridge.expression(c)))

  test("bit-equal to size(tokens(c)) on ASCII, unicode, punctuation, randoms") {
    val fixed = Seq(
      "the quick brown fox", "UPPER and MiXeD case", "a1b2 c3_d4-e5",
      "", "   ", "...!!!", "émigré café naïve", "日本語テスト abc 123",
      "tabs\tand\nnewlines  here", "trailing space ", " leading",
      "x", "42", "--hyphen--run--",
      // the two code points whose lowercase re-enters ASCII:
      // U+212A KELVIN → 'k' (token char), U+0130 'İ' → 'i' + U+0307 (sep)
      "K", "aKb", "300 K warm", "KK",
      "İ", "İstanbul", "AİB", "xİİy",
      "Kİ", "İK", "midKİdle")
    val rnd = new scala.util.Random(17)
    val alphabet = "abcXYZ019 .,-_éü日Kİ\t\n"
    val randoms = Seq.fill(300)(
      (0 until rnd.nextInt(40)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    val df = (fixed ++ randoms).toDF("s")
    val rows = df.select(trc(col("s")).as("native"),
      size(graft.ops.TextAnalysis.tokens(col("s"))).as("hof")).collect()
    rows.foreach(r => assert(r.getInt(0) === r.getInt(1), r.toString))
  }

  test("null propagation and codegen on/off equality") {
    val df = Seq(Some("one two three"), None).toDF("s")
    val on = df.select(trc(col("s"))).collect()
    assert(on(0).getInt(0) === 3)
    assert(on(1).isNullAt(0))
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val off = df.select(trc(col("s"))).collect()
      assert(off(0).getInt(0) === 3 && off(1).isNullAt(0))
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("TextAnalysis.tokenCount rides the native expression unchanged for callers") {
    val df = Seq("alpha beta?? gamma 12", "").toDF("s")
    val got = df.select(graft.ops.TextAnalysis.tokenCount(col("s"))).collect()
    assert(got(0).getInt(0) === 4)
    assert(got(1).getInt(0) === 0)
  }
}
