package graft.expressions

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants for the round-9 native kernels, driven
  * by scalacheck Gen with a fixed seed (same pattern as
  * engine.PropertySpec \u2014 the scalatest bridge artifact is not in the
  * offline cache). All three kernels are compared against independent
  * reference implementations on randomized inputs, JVM-side (the
  * projection paths are covered by their own specs + oracles). */
class KernelPropertySpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default,
      Seed(seed + i)))

  private def utf8(s: String) =
    org.apache.spark.unsafe.types.UTF8String.fromString(s)

  // mixed generator: ASCII, combining marks, precomposed, controls
  private val charGen: Gen[Char] = Gen.frequency(
    8 -> Gen.choose(32.toChar, 126.toChar),
    2 -> Gen.oneOf('\u0301', '\u0300', '\u0308', '\u030a'),
    2 -> Gen.oneOf('\u00e9', '\u00f6', '\u00c5', '\u00df', '\u65e5'),
    1 -> Gen.oneOf('\t', '\n', '\u0007'))
  private val strGen: Gen[String] =
    Gen.chooseNum(0, 60).flatMap(n => Gen.stringOfN(n, charGen))

  test("NfcKernel \u2261 java.text.Normalizer NFC on randomized strings") {
    samples(strGen, 400, 11L).foreach { s =>
      val got = NfcKernel.nfc(utf8(s)).toString
      val want = java.text.Normalizer.normalize(s,
        java.text.Normalizer.Form.NFC)
      assert(got === want, s"input codepoints ${s.map(_.toInt)}")
    }
  }

  test("NfcKernel is idempotent and preserves NFC-equivalence class") {
    samples(strGen, 200, 12L).foreach { s =>
      val once = NfcKernel.nfc(utf8(s)).toString
      assert(NfcKernel.nfc(utf8(once)).toString === once)
    }
  }

  test("CharEntropyKernel \u2261 reference fold; bounded by ln(distinct)") {
    samples(strGen, 400, 13L).foreach { s =>
      val got = CharEntropyKernel.entropy(utf8(s))
      val cps = s.codePoints().toArray
      val n = cps.length
      val want = if (n == 0) 0.0 else {
        var acc = 0.0
        cps.groupBy(identity).toSeq.sortBy(_._1).foreach { case (_, g) =>
          val p = g.length.toDouble / n; acc += p * math.log(p)
        }
        0.0 - acc
      }
      assert(got === want, s"input '${s.take(30)}'") // bit-exact
      val d = cps.distinct.length
      if (d > 0) assert(got <= math.log(d.toDouble) + 1e-9)
      assert(got >= 0.0)
    }
  }

  test("AcAutomaton \u2261 naive position scan on randomized dictionaries") {
    def naive(text: String, term: String): Int =
      (0 to text.length - term.length)
        .count(i => text.regionMatches(i, term, 0, term.length))
    val alpha = Gen.oneOf('a', 'b', 'c')
    val termGen = Gen.chooseNum(1, 4).flatMap(n => Gen.stringOfN(n, alpha))
    val textGen = Gen.chooseNum(0, 80).flatMap(n => Gen.stringOfN(n, alpha))
    (0 until 150).foreach { i =>
      val terms = samples(termGen, 6, 100L + i).distinct
      val text = samples(textGen, 1, 900L + i).head
      if (terms.nonEmpty) {
        val ac = new AcAutomaton(terms.toArray)
        val got = ac.countAll(utf8(text)).toIntArray().toSeq
        val want = terms.map(naive(text, _))
        assert(got === want, s"terms $terms text '$text'")
      }
    }
  }
}
