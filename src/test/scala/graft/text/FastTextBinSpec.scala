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

  test("quantized and corrupt files are rejected") {
    val p = java.nio.file.Files.createTempFile("graft_ft_bad", ".bin")
    java.nio.file.Files.write(p, Array[Byte](1, 2, 3, 4, 5, 6, 7, 8))
    p.toFile.deleteOnExit()
    assertThrows[IllegalArgumentException](FastTextBin.load(p.toString))
  }
}
