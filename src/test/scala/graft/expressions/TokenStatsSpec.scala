package graft.expressions

import graft.SparkSpec
import graft.ops.TextAnalysis
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Parity spec for the fused [[TokenStats]] kernel: every struct field
  * and every derived score must be BIT-EQUAL to the expression chain it
  * replaced (the pre-r18 HOF forms, re-declared inline here so the spec
  * keeps pinning the original semantics even though TextAnalysis now
  * routes through the kernel). */
class TokenStatsSpec extends SparkSpec {
  import spark.implicits._

  // ---- the original (pre-kernel) HOF forms, verbatim ----
  private def hofTokens(c: Column): Column =
    filter(split(lower(c), "[^a-z0-9]+"), t => length(t) > 0)
  private def hofPunct(c: Column): Column =
    length(c) - length(regexp_replace(c, "[\\.,;:!\\?'\"()\\[\\]{}-]", ""))
  private def hofSumLen(c: Column): Column =
    aggregate(transform(hofTokens(c), t => length(t).cast("long")), lit(0L), _ + _)
  private def hofSumSub(c: Column): Column =
    aggregate(transform(hofTokens(c), t => ceil(length(t) / lit(4.0)).cast("long")),
      lit(0L), (acc, x) => acc + x)
  private def hofStop(c: Column, lang: String): Column =
    size(filter(hofTokens(c), t => t.isin(TextAnalysis.stopwords(lang).map(lit): _*)))
  private def hofMeanTokenLen(c: Column): Column = {
    val nt = size(hofTokens(c))
    when(nt === 0, 0.0).otherwise(hofSumLen(c).cast("double") / nt)
  }
  private def hofPunctRatio(c: Column): Column = {
    val n = length(c)
    when(n === 0, 0.0).otherwise(hofPunct(c).cast("double") / n)
  }
  private def hofStopRatio(c: Column): Column = {
    val nt = size(hofTokens(c))
    when(nt === 0, 0.0).otherwise(hofStop(c, "en").cast("double") / nt)
  }
  private def hofQuality(c: Column): Column = {
    val nt = size(hofTokens(c)).cast("double")
    val lenOk   = when(nt >= 10 && nt <= 10000, 1.0).otherwise(0.0)
    val mtl     = hofMeanTokenLen(c)
    val shapeOk = when(mtl >= 2.0 && mtl <= 12.0, 1.0).otherwise(0.0)
    val punctOk = when(hofPunctRatio(c) <= lit(0.2), 1.0).otherwise(0.0)
    val stopOk  = when(hofStopRatio(c) >= lit(0.01), 1.0).otherwise(0.0)
    (lenOk * 0.3 + shapeOk * 0.3 + punctOk * 0.2 + stopOk * 0.2)
  }
  private def hofLangId(c: Column): Column =
    TextAnalysis.langIdFromCounts(c, hofStop(c, "en"), hofStop(c, "de"),
      hofStop(c, "es"), hofStop(c, "fr"))

  private val fixed = Seq(
    "the quick brown fox jumped over the lazy dog and it is you that runs",
    "UPPER and MiXeD case", "a1b2 c3_d4-e5", "", "   ", "...!!!",
    "p.u,n;c:t!u?a'ti\"on( h)e[a]v{y} - text.",
    "émigré café naïve", "日本語テスト abc 123",
    "tabs\tand\nnewlines  here", "trailing space ", " leading",
    "x", "42", "--hyphen--run--",
    // lowercase-reenters-ASCII code points: K (U+212A) joins a run, İ ends one
    "K", "aKb", "300 K warm", "KK", "İ", "İstanbul", "AİB", "xİİy",
    "Kİ", "İK", "midKİdle",
    // CJK range boundaries: U+4DFF below, U+4E00 floor, U+9FFF ceiling, U+A000 above
    "䷿", "一", "鿿", "ꀀ", "abc 一 def", "za鿿ok",
    "der die und das — nicht ein mit ich auf",
    "el la de que y en un los se no",
    "le les et des une est dans pour ce il",
    "the el der le the el der le",
    "supercalifragilisticexpialidocious antidisestablishmentarianism",
    "emoji 😀 tail, and the K of it")

  private def statsCols(c: Column): Seq[(String, Column, Column)] = {
    val st = TextAnalysis.tokenStatsLangs(c)
    Seq(
      ("n_chars", st.getField("n_chars"), length(c)),
      ("n_punct", st.getField("n_punct"), hofPunct(c)),
      ("n_tokens", st.getField("n_tokens"), size(hofTokens(c))),
      ("sum_token_len", st.getField("sum_token_len"), hofSumLen(c)),
      ("sum_subwords", st.getField("sum_subwords"), hofSumSub(c)),
      ("has_cjk", st.getField("has_cjk"), c.rlike("[\\x{4e00}-\\x{9fff}]")),
      ("sw_en", st.getField("stops").getItem(0), hofStop(c, "en")),
      ("sw_de", st.getField("stops").getItem(1), hofStop(c, "de")),
      ("sw_es", st.getField("stops").getItem(2), hofStop(c, "es")),
      ("sw_fr", st.getField("stops").getItem(3), hofStop(c, "fr")),
      ("mean_len", TextAnalysis.meanTokenLenFromStats(st), hofMeanTokenLen(c)),
      ("punct_r", TextAnalysis.punctRatioFromStats(st), hofPunctRatio(c)),
      ("stop_r", TextAnalysis.stopwordRatioFromStats(st), hofStopRatio(c)),
      ("quality", TextAnalysis.qualityFromStats(st), hofQuality(c)),
      ("lang", TextAnalysis.langIdFromStats(st), hofLangId(c)))
  }

  private def assertParity(df: org.apache.spark.sql.DataFrame): Unit = {
    val cols = statsCols(col("s"))
    val out = df.select(col("s") +:
      cols.flatMap { case (n, k, h) => Seq(k.as(s"k_$n"), h.as(s"h_$n")) }: _*)
      .collect()
    out.foreach { r =>
      cols.indices.foreach { i =>
        val k = r.get(1 + 2 * i); val h = r.get(2 + 2 * i)
        assert(k == h,
          s"field ${cols(i)._1}: kernel=$k hof=$h on ${r.get(0)}")
      }
    }
  }

  test("every field and derived score bit-equal to the HOF chain on fixtures") {
    assertParity(fixed.toDF("s"))
  }

  test("randomized parity incl. multibyte, K/İ, CJK edges") {
    val rnd = new scala.util.Random(18)
    val alphabet = "abcXYZ019 .,-_?!'\"()[]{}éü日本Kİ䷿一鿿ꀀ\t\n"
    val randoms = Seq.fill(400)(
      (0 until rnd.nextInt(60)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    assertParity(randoms.toDF("s"))
  }

  test("malformed UTF-8 bytes: invalid leaders, dangling continuations, truncated tails") {
    // binary -> string cast wraps the raw bytes (no validation), exactly
    // the malformed docs that reach the kernel in production
    val e = "é".getBytes("UTF-8")
    val fixtures: Seq[Array[Byte]] = Seq(
      Array[Byte]('a', 0xC0.toByte, 'b', 'c', 'd'),
      Array[Byte]('x', 0xC1.toByte, 0xC1.toByte, 'y', '.', 'w'),
      Array[Byte]('p', 0xF5.toByte, 'q', '!', 'r', 's'),
      Array[Byte](0xFF.toByte, 'm', 'n', 'o', 0xFE.toByte, 'k'),
      Array[Byte]('a', 0x80.toByte, 0xBF.toByte, 'b', 'c'),
      Array[Byte](e(0), e(1), 0xC0.toByte, 0xF5.toByte, 'z', 'q'),
      Array[Byte](0xE4.toByte, 0xB8.toByte),               // truncated 3-byte CJK
      Array[Byte]('t', 'h', 'e', ' ', 0xE4.toByte, 0xB8.toByte, 0x80.toByte, ' ', 'i', 's'),
      Array[Byte](0xE4.toByte, 0xB7.toByte, 0xBF.toByte),  // U+4DFF: below range
      Array[Byte](0xE9.toByte, 0xBF.toByte, 0xBF.toByte),  // U+9FFF: ceiling
      Array[Byte](0xEA.toByte, 0x80.toByte, 0x80.toByte),  // U+A000: above
      Array[Byte](0xF0.toByte, 0x90.toByte),               // truncated 4-byte
      Array[Byte]('t', 'h', 'e', 0xC0.toByte, 't', 'h', 'e'))
    val rnd = new scala.util.Random(19)
    val pool: Array[Byte] = ("the and is a . ! xyz 019".getBytes("US-ASCII") ++
      Array[Byte](0xC0.toByte, 0xC1.toByte, 0xF5.toByte, 0xFF.toByte, 0x80.toByte,
        0xBF.toByte, e(0), e(1), 0xE4.toByte, 0xB8.toByte, 0x80.toByte,
        0xE9.toByte, 0xBF.toByte, 0xE2.toByte, 0x84.toByte, 0xAA.toByte,
        0xC4.toByte, 0xB0.toByte))
    val randoms = Seq.fill(400)(
      Array.fill(rnd.nextInt(48))(pool(rnd.nextInt(pool.length))))
    val df = (fixtures ++ randoms).toDF("b").select(col("b").cast("string").as("s"))
    assertParity(df)
  }

  test("null propagation, empty stop lists, codegen on/off equality") {
    val df = Seq(Some("one two three"), None).toDF("s")
    val st = TextAnalysis.tokenStats(col("s"))
    val on = df.select(st.getField("n_tokens"), st.getField("stops")).collect()
    assert(on(0).getInt(0) === 3)
    assert(on(0).getSeq[Int](1).isEmpty)
    assert(on(1).isNullAt(0) && on(1).isNullAt(1))
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val off = df.select(st.getField("n_tokens"), st.getField("stops")).collect()
      assert(off(0).getInt(0) === 3 && off(1).isNullAt(0))
      assertParity(fixed.toDF("s"))
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("TokenCurateStats triple bit-equal to the FromStats composition (and null-safe)") {
    val st = TextAnalysis.tokenStatsLangs(col("s"))
    val cs = TextAnalysis.tokenCurateStats(col("s"))
    val rnd = new scala.util.Random(20)
    val alphabet = "abcXYZ019 .,!?éü日本Kİ一\t"
    val edge = Seq(
      // exact quality-band boundaries: 10/10000 tokens, mtl 2.0/12.0,
      // punct ratio at 0.2, stopword ratio at 0.01
      Seq.fill(10)("ab").mkString(" "), Seq.fill(9)("ab").mkString(" "),
      ("the " + Seq.fill(99)("xy").mkString(" ")),
      "aaaa.", "aaaaaaaa..", // punct ratio 0.2 exactly at len 5 n_punct 1
      "el la de que y en un los se no", // es==... ties vs en=0
      "der die le les el la the a")     // cross-language tie-breaks
    val randoms = Seq.fill(400)(
      (0 until rnd.nextInt(80)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    val rows = (fixed ++ edge ++ randoms).toDF("s").select(
      cs.getField("lang"), TextAnalysis.langIdFromStats(st),
      cs.getField("quality"), TextAnalysis.qualityFromStats(st),
      cs.getField("n_tokens"), st.getField("n_tokens")).collect()
    rows.foreach { r =>
      assert(r.getString(0) === r.getString(1))
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(2)) ===
        java.lang.Double.doubleToRawLongBits(r.getDouble(3)))
      assert(r.getInt(4) === r.getInt(5))
    }
    val nulls = Seq(Option.empty[String]).toDF("s")
      .select(TextAnalysis.tokenCurateStats(col("s"))).collect()
    assert(nulls(0).isNullAt(0))
  }

  test("non-[a-z0-9] stop terms are inert in both forms (dropped at build == never-matching isin)") {
    val odd = Seq(Seq("the", "Naïve", "The", "", "a1"), Seq("café", "42"))
    val st = TextAnalysis.tokenStats(col("s"), odd)
    val hof0 = size(filter(hofTokens(col("s")),
      t => t.isin(odd(0).map(lit): _*)))
    val hof1 = size(filter(hofTokens(col("s")),
      t => t.isin(odd(1).map(lit): _*)))
    val rows = Seq("the naïve café a1 42 The THE", "a1 a1 42").toDF("s")
      .select(st.getField("stops").getItem(0), hof0,
        st.getField("stops").getItem(1), hof1).collect()
    rows.foreach { r =>
      assert(r.getInt(0) === r.getInt(1), s"list0: $r")
      assert(r.getInt(2) === r.getInt(3), s"list1: $r")
    }
  }
}
