package graft.text

import java.nio.{ByteBuffer, ByteOrder}

/** Reader for the public fastText BINARY model format (`.bin`) — the
  * artifact `Latanova_v1.py:19-21` actually loads (gensim wraps the
  * same file). Layout per the published fastText sources
  * (facebookresearch/fasttext: `fasttext.cc loadModel`,
  * `args.cc Args::load`, `dictionary.cc Dictionary::load`,
  * `densematrix.cc DenseMatrix::load`), little-endian:
  *
  * {{{
  *   int32 magic = 793712314, int32 version (<= 12)
  *   args: dim ws epoch minCount neg wordNgrams loss model bucket
  *         minn maxn lrUpdateRate (int32 each), t (float64)
  *   dict: size nwords nlabels (int32), ntokens pruneidxSize (int64)
  *         then per entry: word bytes until NUL, count (int64),
  *         type (int8); then pruneidxSize (int32,int32) pairs
  *   quantInput (int8; quantized models rejected here)
  *   input matrix: rows cols (int64), rows*cols float32
  * }}}
  *
  * Word vectors follow fastText's own semantics: an IN-VOCAB word is
  * the mean of its input-matrix row plus its char-n-gram bucket rows;
  * an OOV word is the mean of its n-gram bucket rows alone — real
  * subword composition from the trained bucket matrix, not a stand-in.
  * N-gram ids are FNV-1a-32 hashes (signed-char fold, exactly
  * `Dictionary::hash`) mod `bucket`, offset by nwords; n-gram
  * extraction is UTF-8 aware (continuation bytes never start a gram),
  * matching `Dictionary::computeSubwords`.
  *
  * The model is a DRIVER-side artifact (like a centroid set or merge
  * table): load once, broadcast; executors look vectors up through the
  * [[Embedder]] interface. A 300-dim 2M-bucket model is ~2.4 GB —
  * within broadcast range on a real cluster; the loader never touches
  * Spark, so it cannot shuffle. */
object FastTextBin {

  final val Magic = 793712314
  final val Eos = "</s>"
  final val Bow = "<"
  final val Eow = ">"

  final case class Model(dim: Int, minn: Int, maxn: Int, bucket: Int,
                         words: Array[String],
                         matrix: Array[Float], rows: Long) {
    private[text] val wordIndex: Map[String, Int] =
      words.iterator.zipWithIndex.toMap
    def nwords: Int = words.length

    private def addRow(acc: Array[Double], id: Int): Unit = {
      val off = id.toLong * dim
      var j = 0
      while (j < dim) { acc(j) += matrix((off + j).toInt); j += 1 }
    }

    /** fastText `getWordVector`: mean of the word's subword rows. */
    def vector(word: String): Array[Double] = {
      val acc = new Array[Double](dim)
      var n = 0
      wordIndex.get(word) match {
        case Some(id) =>
          addRow(acc, id); n += 1
          if (maxn > 0 && word != Eos) {
            subwordIds(word).foreach { g => addRow(acc, g); n += 1 }
          }
        case None =>
          // Dictionary::getSubwords(string): EOS never decomposes
          if (word != Eos)
            subwordIds(word).foreach { g => addRow(acc, g); n += 1 }
      }
      if (n > 0) { var j = 0; while (j < dim) { acc(j) /= n; j += 1 } }
      acc
    }

    /** Bucket-row ids of `<word>`'s char n-grams (offset by nwords). */
    def subwordIds(word: String): Seq[Int] = {
      if (maxn <= 0 || bucket <= 0) return Nil
      val bytes = (Bow + word + Eow).getBytes("UTF-8")
      val out = Seq.newBuilder[Int]
      var i = 0
      while (i < bytes.length) {
        // continuation bytes (10xxxxxx) never start an n-gram
        if ((bytes(i) & 0xC0) != 0x80) {
          var j = i
          var n = 1
          val gram = new java.io.ByteArrayOutputStream()
          while (j < bytes.length && n <= maxn) {
            gram.write(bytes(j)); j += 1
            // absorb continuation bytes of this char
            while (j < bytes.length && (bytes(j) & 0xC0) == 0x80) {
              gram.write(bytes(j)); j += 1
            }
            // fastText pushes when n >= minn, except the full-word
            // 1-char corner (`computeSubwords`' exclusion)
            if (n >= minn && !(n == 1 && (i == 0 || j == bytes.length))) {
              val h = fnv1a32(gram.toByteArray)
              out += nwords + (java.lang.Integer.remainderUnsigned(h, bucket))
            }
            n += 1
          }
        }
        i += 1
      }
      out.result()
    }

    /** The model as an [[Embedder]] (doubles, broadcast-friendly). */
    def toEmbedder: Embedder = new Embedder {
      def dim: Int = Model.this.dim
      def lookup(token: String): Array[Double] = vector(token)
    }
  }

  /** `Dictionary::hash`: FNV-1a 32-bit with SIGNED-char fold. */
  def fnv1a32(bytes: Array[Byte]): Int = {
    var h = 2166136261L.toInt
    var i = 0
    while (i < bytes.length) {
      h = h ^ bytes(i).toInt // int8_t sign-extension, as fastText does
      h = h * 16777619
      i += 1
    }
    h
  }

  /** Load a `.bin` from a local/NFS path on the driver. Quantized
    * (`.ftz`) models are rejected — the product-quantized codebook
    * decode is out of scope; export unquantized or use [[VecFormat]]. */
  def load(path: String): Model = {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val magic = b.getInt()
    require(magic == Magic, s"not a fastText .bin (magic $magic)")
    val version = b.getInt()
    require(version <= 12, s"unsupported fastText version $version")
    val dim = b.getInt()
    b.getInt(); b.getInt(); b.getInt(); b.getInt(); b.getInt() // ws epoch minCount neg wordNgrams
    b.getInt() // loss
    val model = b.getInt() // model_name: cbow=1, sg=2, sup=3
    val bucket = b.getInt()
    val minn = b.getInt()
    // fastText's v11 backward-compat quirk (`FastText::loadModel`):
    // old supervised models never used char n-grams — maxn is forced
    // to 0 regardless of the stored value
    val maxn = if (version == 11 && model == 3) { b.getInt(); 0 } else b.getInt()
    b.getInt() // lrUpdateRate
    b.getDouble() // t
    val size = b.getInt(); val nwords = b.getInt(); b.getInt() // nlabels
    b.getLong() // ntokens
    val pruneidxSize = b.getLong()
    val words = new Array[String](size)
    var i = 0
    while (i < size) {
      val sb = new java.io.ByteArrayOutputStream()
      var c = b.get()
      while (c != 0) { sb.write(c); c = b.get() }
      words(i) = new String(sb.toByteArray, "UTF-8")
      b.getLong() // count
      b.get()     // entry type (word/label)
      i += 1
    }
    var p = 0L
    while (p < math.max(pruneidxSize, 0L)) { b.getInt(); b.getInt(); p += 1 }
    val quant = b.get()
    require(quant == 0, "quantized (.ftz) fastText models are not supported")
    val rows = b.getLong(); val cols = b.getLong()
    require(cols == dim, s"matrix cols $cols != dim $dim")
    require(rows * cols <= Int.MaxValue.toLong,
      s"input matrix too large for one array (${rows}x$cols)")
    val m = new Array[Float]((rows * cols).toInt)
    b.asFloatBuffer().get(m)
    // only the first nwords entries are words (labels excluded)
    Model(dim, minn, maxn, bucket, words.take(nwords), m, rows)
  }
}
