package graft.text

import java.nio.{ByteBuffer, ByteOrder}
import org.scalatest.funsuite.AnyFunSuite

/** Golden spec over a hand-built `.bin` written byte-for-byte in the
  * published fastText layout — the loader must recover dim/vocab/
  * hyperparameters, reproduce `Dictionary::hash` exactly, and compose
  * word vectors with fastText's subword semantics. */
class FastTextBinSpec extends AnyFunSuite {

  private val Dim = 4
  private val Bucket = 16
  private val Minn = 3
  private val Maxn = 4
  private val Words = Seq("cat", "dog", "</s>")

  /** Deterministic matrix row content: row r, col j → r + j/10. */
  private def rowVal(r: Int, j: Int): Float = (r + j / 10.0).toFloat

  private def buildBin(): String = {
    val rows = Words.size + Bucket
    val buf = ByteBuffer.allocate(1 << 16).order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(FastTextBin.Magic).putInt(12) // magic, version
    // args: dim ws epoch minCount neg wordNgrams loss model bucket
    //       minn maxn lrUpdateRate (int32), t (float64)
    buf.putInt(Dim).putInt(5).putInt(5).putInt(1).putInt(5).putInt(1)
    buf.putInt(1).putInt(1).putInt(Bucket).putInt(Minn).putInt(Maxn)
    buf.putInt(100)
    buf.putDouble(1e-4)
    // dict header: size nwords nlabels (int32), ntokens pruneidx (int64)
    buf.putInt(Words.size).putInt(Words.size).putInt(0)
    buf.putLong(1000L).putLong(0L)
    Words.foreach { w =>
      buf.put(w.getBytes("UTF-8")).put(0.toByte)
      buf.putLong(7L) // count
      buf.put(0.toByte) // entry type: word
    }
    buf.put(0.toByte) // quant_input = false
    buf.putLong(rows.toLong).putLong(Dim.toLong)
    (0 until rows).foreach(r => (0 until Dim).foreach(j => buf.putFloat(rowVal(r, j))))
    val path = java.nio.file.Files.createTempFile("graft_ft", ".bin")
    java.nio.file.Files.write(path,
      java.util.Arrays.copyOf(buf.array(), buf.position()))
    path.toFile.deleteOnExit()
    path.toString
  }

  test("header/vocab/hyperparameters round-trip") {
    val m = FastTextBin.load(buildBin())
    assert(m.dim === Dim)
    assert(m.minn === Minn && m.maxn === Maxn && m.bucket === Bucket)
    assert(m.words.toSeq === Words)
    assert(m.rows === (Words.size + Bucket).toLong)
  }

  test("FNV-1a-32 hash matches the published test vectors (signed-char fold)") {
    // reference values computed from the exact Dictionary::hash fold
    def h(s: String): Long =
      java.lang.Integer.toUnsignedLong(FastTextBin.fnv1a32(s.getBytes("UTF-8")))
    assert(h("") === 2166136261L)
    assert(h("a") === 3826002220L)  // standard FNV-1a("a")
    assert(h("foobar") === 3214735720L) // standard FNV-1a("foobar") = 0xbf9cf968
    // sign extension: 0xC3 0xA9 ("é") folds as NEGATIVE int8 values —
    // must differ from an unsigned fold
    var unsigned = 2166136261L.toInt
    "é".getBytes("UTF-8").foreach { b =>
      unsigned = (unsigned ^ (b & 0xFF)) * 16777619
    }
    assert(FastTextBin.fnv1a32("é".getBytes("UTF-8")) !== unsigned)
  }

  test("subword ids follow computeSubwords (boundary gram exclusions, UTF-8)") {
    val m = FastTextBin.load(buildBin())
    // "<cat>" (len 5), minn=3 maxn=4 → grams: <ca, <cat, cat, cat>, at>
    val expect = Seq("<ca", "<cat", "cat", "cat>", "at>").map { g =>
      Words.size + java.lang.Integer.remainderUnsigned(
        FastTextBin.fnv1a32(g.getBytes("UTF-8")), Bucket)
    }
    assert(m.subwordIds("cat") === expect)
    // UTF-8: a continuation byte never starts a gram — "né" is <né, né>
    // (plus <né> at n=4); all grams hold whole chars
    val ids = m.subwordIds("né")
    val expectedNe = Seq("<né", "né>", "<né>").map { g =>
      Words.size + java.lang.Integer.remainderUnsigned(
        FastTextBin.fnv1a32(g.getBytes("UTF-8")), Bucket)
    }
    assert(ids.sorted === expectedNe.sorted)
  }

  test("in-vocab vector = mean of word row + gram rows; OOV = gram rows; EOS special") {
    val m = FastTextBin.load(buildBin())
    def mean(ids: Seq[Int]): Seq[Double] =
      (0 until Dim).map(j => ids.map(r => rowVal(r, j).toDouble).sum / ids.size)
    val catIds = 0 +: m.subwordIds("cat")
    assert(m.vector("cat").toSeq === mean(catIds))
    val oovIds = m.subwordIds("bird")
    assert(m.vector("bird").toSeq === mean(oovIds))
    // EOS: in vocab, no ngrams — exactly its own row
    assert(m.vector("</s>").toSeq === (0 until Dim).map(j => rowVal(2, j).toDouble))
    // embedder interface round-trip
    val e = m.toEmbedder
    assert(e.dim === Dim)
    assert(e.lookup("cat").toSeq === m.vector("cat").toSeq)
  }

  test("v11 supervised quirk: maxn forced to 0 (FastText::loadModel compat)") {
    val rows = Words.size + Bucket
    val buf = ByteBuffer.allocate(1 << 16).order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(FastTextBin.Magic).putInt(11)
    buf.putInt(Dim).putInt(5).putInt(5).putInt(1).putInt(5).putInt(1)
    buf.putInt(1).putInt(3) // loss, model = sup
    buf.putInt(Bucket).putInt(Minn).putInt(Maxn).putInt(100)
    buf.putDouble(1e-4)
    buf.putInt(Words.size).putInt(Words.size).putInt(0)
    buf.putLong(1000L).putLong(0L)
    Words.foreach { w =>
      buf.put(w.getBytes("UTF-8")).put(0.toByte).putLong(7L).put(0.toByte)
    }
    buf.put(0.toByte)
    buf.putLong(rows.toLong).putLong(Dim.toLong)
    (0 until rows).foreach(r => (0 until Dim).foreach(j => buf.putFloat(rowVal(r, j))))
    val p = java.nio.file.Files.createTempFile("graft_ft_v11", ".bin")
    java.nio.file.Files.write(p, java.util.Arrays.copyOf(buf.array(), buf.position()))
    p.toFile.deleteOnExit()
    val m = FastTextBin.load(p.toString)
    assert(m.maxn === 0)
    // no char n-grams: in-vocab vector is exactly the word row
    assert(m.vector("cat").toSeq === (0 until Dim).map(j => rowVal(0, j).toDouble))
    assert(m.subwordIds("cat") === Nil)
  }

  test("write -> load round-trip with labels and output matrix") {
    val m0 = FastTextBin.Model(dim = 3, minn = 0, maxn = 0, bucket = 8,
      wordNgrams = 2,
      words = Array("cat", "dog"), labels = Array("__label__a", "__label__b"),
      matrix = Array.tabulate(10 * 3)(i => i * 0.25f), rows = 10L,
      output = Array.tabulate(2 * 3)(i => 1.0f - i * 0.125f), outputRows = 2L)
    val p = java.nio.file.Files.createTempFile("graft_ft_rt", ".bin")
    p.toFile.deleteOnExit()
    FastTextBin.write(m0, p.toString)
    val m1 = FastTextBin.load(p.toString)
    assert(m1.dim === m0.dim && m1.bucket === m0.bucket)
    assert(m1.wordNgrams === 2)
    assert(m1.words.toSeq === m0.words.toSeq)
    assert(m1.labels.toSeq === m0.labels.toSeq)
    assert(m1.matrix.toSeq === m0.matrix.toSeq)
    assert(m1.output.toSeq === m0.output.toSeq && m1.outputRows === 2L)
  }

  test("lineFeatures: getLine + addWordNgrams semantics (sup model, maxn=0)") {
    val m = FastTextBin.Model(dim = 2, minn = 0, maxn = 0, bucket = 8,
      wordNgrams = 2,
      words = Array("cat", "dog"), labels = Array("__label__a"),
      matrix = new Array[Float](10 * 2), rows = 10L,
      output = new Array[Float](1 * 2), outputRows = 1L)
    def h(s: String) = FastTextBin.fnv1a32(s.getBytes("UTF-8"))
    def ngramId(a: String, b: String): Int =
      2 + java.lang.Long.remainderUnsigned(
        h(a).toLong * 116049371L + h(b).toLong, 8L).toInt
    // in-vocab words contribute their id; OOV (maxn=0) contributes no
    // subword feature but its HASH joins the word-ngram stream
    assert(m.lineFeatures(Seq("cat", "dog")) ===
      Seq(0, 1, ngramId("cat", "dog")))
    assert(m.lineFeatures(Seq("cat", "bird", "dog")) ===
      Seq(0, 1, ngramId("cat", "bird"), ngramId("bird", "dog")))
    // label tokens never enter features or hashes
    assert(m.lineFeatures(Seq("__label__a", "cat")) === Seq(0))
    // wordNgrams=1 → no ngram features at all
    assert(m.copy(wordNgrams = 1).lineFeatures(Seq("cat", "dog")) === Seq(0, 1))
  }

  test("predictArgmax: hidden mean + argmax logit, fp order preserved") {
    // dim=2, 2 words + 4 buckets = 6 input rows, 2 labels
    val input = Array[Float](
      1f, 0f,   // row 0: cat
      0f, 1f,   // row 1: dog
      2f, 2f, 0.5f, 0.25f, 4f, 1f, 0f, 0f) // bucket rows 2..5
    val output = Array[Float](1f, 0f, 0f, 1f) // label a = x, label b = y
    val m = FastTextBin.Model(dim = 2, minn = 0, maxn = 0, bucket = 4,
      wordNgrams = 1,
      words = Array("cat", "dog"), labels = Array("__label__a", "__label__b"),
      matrix = input, rows = 6L, output = output, outputRows = 2L)
    // tokens cat,dog -> features [0,1], hidden = (0.5, 0.5): tie on
    // logits -> first label wins (fastText heap order)
    assert(m.predictArgmax(Seq("cat", "dog")) === Some(("__label__a", 0.5)))
    // cat alone -> hidden (1,0) -> label a logit 1
    assert(m.predictArgmax(Seq("cat")) === Some(("__label__a", 1.0)))
    // no known features -> None
    assert(m.predictArgmax(Seq("bird")) === None)
    assert(m.predictArgmax(Nil) === None)
  }

  test("quantized and corrupt files are rejected") {
    val p = java.nio.file.Files.createTempFile("graft_ft_bad", ".bin")
    java.nio.file.Files.write(p, Array[Byte](1, 2, 3, 4, 5, 6, 7, 8))
    p.toFile.deleteOnExit()
    assertThrows[IllegalArgumentException](FastTextBin.load(p.toString))
  }
}
