package graft.ops

import graft.SparkSpec

/** Unigram-LM trainer/encoder: the integer log table's contract, a
  * fully hand-computed two-iteration EM on a tiny corpus, the exact
  * Viterbi tie-break order, coverage, and determinism. */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  test("ilog: exact values, monotone, within 0.09 bits of 256*log2") {
    assert(Corpus.ilog(1L) === 0L)
    assert(Corpus.ilog(2L) === 256L)
    assert(Corpus.ilog(4L) === 512L)
    // L(3) = 256 + floor(3*256/2) - 256 = 384
    assert(Corpus.ilog(3L) === 384L)
    var prev = Long.MinValue
    (1L to 5000L).foreach { x =>
      val l = Corpus.ilog(x)
      assert(l >= prev, s"not monotone at $x")
      prev = l
      val err = math.abs(l / 256.0 - math.log(x.toDouble) / math.log(2.0))
      assert(err <= 0.09, s"ilog($x) off by $err bits")
    }
    // exactness of the dyadic form at a large count
    val x = (1L << 40) + 12345L
    val b = 63 - java.lang.Long.numberOfLeadingZeros(x)
    assert(Corpus.ilog(x) === 256L * b + ((x << 8) >> b) - 256L)
    intercept[IllegalArgumentException](Corpus.ilog(0L))
  }

  test("hand-computed 2-iteration EM: counts, scores, segmentation") {
    // tokens: "ab" x4, "c" x3 -> seed a:4 b:4 ab:4 c:3, vocab
    // {a, ab, b, c}, V = 4
    // iter1: T = 15 + 4 = 19; s(a) = L(5) - L(19) = 576 - 1072 = -496
    //   = s(b) = s(ab); s(c) = L(4) - L(19) = -560
    //   "ab" -> [ab] (-496 beats [a,b] -992); "c" -> [c]
    //   M: ab = 4, c = 3, a = b = 0
    // iter2: T = 7 + 4 = 11, L(11) = 864; "ab" -> [ab] again (counts
    //   unchanged -> fixed point)
    // final scores: s(a) = s(b) = L(1) - L(11) = -864,
    //   s(ab) = L(5) - L(11) = -288, s(c) = L(4) - L(11) = -352
    val docs = Seq("ab ab ab c", "ab c c").toDF("text")
    val out = Corpus.unigramTrainLocal(docs, "text").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out.keySet === Set("a", "ab", "b", "c"))
    assert(out("ab") === ((4L, -288L)))
    assert(out("c") === ((3L, -352L)))
    assert(out("a") === ((0L, -864L)))
    assert(out("b") === ((0L, -864L)))
    val enc = Corpus.unigramEncode(docs, "text").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getString(2), r.getLong(3))))
      .toMap
    assert(enc("ab") === ((4L, "ab", 1L)))
    assert(enc("c") === ((3L, "c", 1L)))
  }

  test("viterbi tie-break: equal score, equal k -> lexicographically smallest path") {
    // corpus "abc" repeated, maxPieceLen = 2: every piece (a, b, c,
    // ab, bc) has the same count, so [a, bc] and [ab, c] tie on score
    // and k = 2 ([a, b, c] at k = 3 is worse with negative scores);
    // the separator (0x1f) sorts below 'b', so "abc" < "abc"
    val docs = Seq("abc abc abc").toDF("text")
    val enc = Corpus.unigramEncode(docs, "text", maxPieceLen = 2).collect()
    assert(enc.length === 1)
    assert(enc(0).getString(2) === "a bc")
    assert(enc(0).getLong(3) === 2L)
  }

  test("coverage and determinism: every char is a vocab piece; repeat runs identical") {
    val docs = Seq("hello world", "hello graft pipelines",
      "unigram pieces cover all chars 0123").toDF("text")
    val v1 = Corpus.unigramTrainLocal(docs, "text").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val v2 = Corpus.unigramTrainLocal(docs, "text").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(v1 === v2)
    val pieces = v1.map(_._1).toSet
    val chars = "helloworldgraftpipelinesunigrampiecescoverallchars0123"
      .map(_.toString).toSet
    chars.foreach(c => assert(pieces.contains(c), s"char '$c' missing"))
    // encode is total: every word segments (single-char fallback)
    val enc = Corpus.unigramEncode(docs, "text").collect()
    assert(enc.forall(r => r.getString(2).replace(" ", "") === r.getString(0)))
  }
}
