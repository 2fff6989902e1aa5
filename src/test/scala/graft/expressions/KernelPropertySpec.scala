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

  test("HammingDistance: metric axioms + popcount model on randomized words") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.GraftColumnBridge
    def hd(x: String, y: String) =
      GraftColumnBridge.column(HammingDistance(
        GraftColumnBridge.expression(col(x)),
        GraftColumnBridge.expression(col(y))))
    val tripleGen = Gen.chooseNum(1, 4).flatMap { n =>
      val w = Gen.listOfN(n, Gen.chooseNum(Long.MinValue, Long.MaxValue))
        .map(_.toArray)
      Gen.zip(w, Gen.zip(w, w))
    }
    val ts = samples(tripleGen, 200, 21L).map { case (a, (b, c)) => (a, b, c) }
    val rows = ts.toDF("a", "b", "c")
      .select(hd("a", "b").as("ab"), hd("b", "a").as("ba"),
        hd("a", "a").as("aa"), hd("a", "c").as("ac"), hd("c", "b").as("cb"))
      .collect()
    rows.zip(ts).foreach { case (r, (a, b, c)) =>
      val model = a.zip(b).map { case (x, y) =>
        java.lang.Long.bitCount(x ^ y).toLong }.sum
      assert(r.getLong(0) === model)                       // popcount model
      assert(r.getLong(0) === r.getLong(1))                // symmetry
      assert(r.getLong(2) === 0L)                          // identity
      assert(r.getLong(0) <= r.getLong(3) + r.getLong(4),  // triangle
        s"ab=${r.getLong(0)} ac=${r.getLong(3)} cb=${r.getLong(4)}")
      assert(r.getLong(0) <= 64L * a.length)               // word bound
    }
  }

  test("binarySign is invariant under positive per-vector scaling") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val vecGen = Gen.chooseNum(1, 70).flatMap(n =>
      Gen.listOfN(n, Gen.frequency(
        6 -> Gen.chooseNum(-1.0f, 1.0f),
        1 -> Gen.const(0.0f))).map(_.toArray))
    val scaleGen = Gen.oneOf(0.25f, 1.0f, 3.5f, 1e4f)
    val vs = samples(Gen.zip(vecGen, scaleGen), 120, 33L)
    val df = vs.zipWithIndex
      .map { case ((v, s), i) => (i.toLong, v, v.map(_ * s)) }
      .toDF("id", "v", "vs")
    val a = graft.ops.Quantize.binarySign(df, "id", "v")
      .select(col("id"), col("words").as("wa"), col("n_pos").as("na"))
    val b = graft.ops.Quantize.binarySign(df, "id", "vs")
      .select(col("id"), col("words").as("wb"), col("n_pos").as("nb"))
    a.join(b, "id").collect().foreach { r =>
      assert(r.getSeq[Long](1) === r.getSeq[Long](3), s"id=${r.getLong(0)}")
      assert(r.getInt(2) === r.getInt(4))
    }
  }
}
