package graft.expressions

import graft.SparkSpec
import graft.ops.TextAnalysis
import org.apache.spark.sql.functions._

class MultiTermCountSpec extends SparkSpec {
  import spark.implicits._

  /** Naive reference: count of start offsets where the term matches. */
  private def naive(text: String, term: String): Int =
    (0 to text.length - term.length)
      .count(i => text.regionMatches(i, term, 0, term.length))

  private def counts(text: String, terms: Seq[String]): Seq[Int] =
    Seq((1, text)).toDF("id", "t")
      .select(TextAnalysis.termCounts(col("t"), terms))
      .collect()(0).getSeq[Int](0)

  test("classic AC fixture: overlapping dictionary he/she/his/hers") {
    val terms = Seq("he", "she", "his", "hers")
    assert(counts("ushers", terms) === Seq(1, 1, 0, 1))
    assert(counts("shishers", terms) === Seq(1, 1, 1, 1))
  }

  test("overlapping self-matches are all counted") {
    assert(counts("aaaa", Seq("aa")) === Seq(3))
    assert(counts("abababa", Seq("aba")) === Seq(3))
  }

  test("matches the naive scan on generated inputs") {
    val terms = Seq("ab", "bc", "abc", "cab", "b")
    val texts = Seq("", "b", "abcabcab", "cabbcabc", "xxxxx",
      "ababababcabcbcb")
    texts.foreach { t =>
      assert(counts(t, terms) === terms.map(naive(t, _)), s"text '$t'")
    }
  }

  test("wrapper lowercases; hits sums; null text -> null counts") {
    val df = Seq((1, Some("The THE the")), (2, Option.empty[String]))
      .toDF("id", "t").orderBy("id")
    val got = df.select(
      TextAnalysis.blocklistHits(col("t"), Seq("the")).as("h")).collect()
    assert(got(0).getInt(0) === 3)
    assert(got(1).isNullAt(0))
    intercept[Exception] { // empty term rejected at automaton build
      counts("x", Seq(""))
    }
  }

  test("uppercase terms match: wrapper folds term case with the text") {
    assert(counts("viagra and SPAM", Seq("Viagra", "spam")) === Seq(1, 1))
  }
}
