package graft.expressions

import graft.SparkSpec
import graft.ops.TextAnalysis
import org.apache.spark.sql.functions._

class CharEntropySpec extends SparkSpec {
  import spark.implicits._

  /** Reference fold with the kernel's exact contract: ascending
    * codepoint order, left-associated, 0.0 - sum. */
  private def ref(s: String): Double = {
    val cps = s.codePoints().toArray
    val n = cps.length
    if (n == 0) 0.0
    else {
      var acc = 0.0
      cps.groupBy(identity).toSeq.sortBy(_._1).foreach { case (_, g) =>
        val p = g.length.toDouble / n
        acc += p * math.log(p)
      }
      0.0 - acc
    }
  }

  test("kernel matches the reference fold bit-for-bit") {
    val inputs = Seq("", "aaaa", "abab", "hello world", "0123456789abcdef",
      "the quick brown fox", "zzzzzzy", "a b\tc\nd")
    val got = inputs.zipWithIndex.map { case (s, i) => (i, s) }
      .toDF("id", "t").orderBy("id")
      .select(TextAnalysis.charEntropy(col("t"))).collect().map(_.getDouble(0))
    inputs.zip(got).foreach { case (s, g) =>
      assert(g === ref(s), s"input '$s'") // exact, not approximate
    }
  }

  test("multi-byte codepoints count once each; null scores 0.0") {
    // "ééa" -> p(é)=2/3, p(a)=1/3
    val got = Seq((1, Some("ééa")), (2, Option.empty[String]))
      .toDF("id", "t").orderBy("id")
      .select(TextAnalysis.charEntropy(col("t"))).collect()
    assert(got(0).getDouble(0) === ref("ééa"))
    assert(got(1).getDouble(0) === 0.0)
  }

  test("uniform distribution maximizes; single char pins +0.0") {
    val u = ref("abcd") // ln(4)
    assert(math.abs(u - math.log(4.0)) < 1e-12)
    val z = Seq((1, "xxxxxx")).toDF("id", "t")
      .select(TextAnalysis.charEntropy(col("t"))).collect()(0).getDouble(0)
    assert(z === 0.0 && (1.0 / z) > 0) // +0.0, not -0.0
  }
}
